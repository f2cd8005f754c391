"""Full-registry mechanical plan audit -> PLAN_AUDIT_r14.json.

For every registered query: static .explain("formatted") node counts
(parquet scans, Exchanges, SortMergeJoin, CartesianProduct,
BatchEvalPython, plan lines) — the same shape as PLAN_AUDIT_r13.json
so rounds compare. Queries that localCheckpoint during construction
show their post-checkpoint plan (see dump_plans_r14.py's caveat).
"""

import json
import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from document_parsing_etl_pipeline_spark.plans.queries import QUERIES
from document_parsing_etl_pipeline_spark.session import get_spark


def main():
    spark = get_spark("plan-audit-r14")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    out = {}
    for name, fn in QUERIES.items():
        try:
            plan = fn(spark, sf)._jdf.queryExecution().explainString(mode)
        except Exception as e:
            out[name] = {"error": str(e)[:200]}
            continue
        tree = plan.split("\n\n")[0]
        out[name] = {
            "scans": len(re.findall(r"Scan parquet", tree)),
            "exchanges": len(re.findall(r"\bExchange\b", tree)),
            "lines": len(tree.splitlines()),
            "smj": len(re.findall(r"SortMergeJoin", tree)),
            "cartesian": len(re.findall(r"CartesianProduct", tree)),
            "batcheval": len(re.findall(r"BatchEvalPython", tree)),
        }
        print(name, out[name], flush=True)
    with open(os.path.join(_ROOT, "PLAN_AUDIT_r14.json"), "w") as f:
        json.dump(out, f, indent=1)
    tot = {k: sum(v.get(k, 0) for v in out.values() if "error" not in v)
           for k in ("scans", "exchanges", "smj", "cartesian", "batcheval")}
    print("TOTALS", json.dumps(tot))


if __name__ == "__main__":
    main()
