"""Dump the EXECUTED adaptive plan (isFinalPlan=true) for named
queries into plans/r14/<q>_final_<tag>.txt.

Why this exists (round 14): the exchange-reuse optimizations (NB
featurize-once, the term_frequencies/unigram/dsir/bigram null-guard
family) dedupe identical exchanges at AQE RUNTIME — the static
.explain() dump still shows the un-deduped initial plan
(isFinalPlan=false), so the static before/after files show no delta
for them. The final adaptive plan after a real execution (collect at
$SPARK_GRAFT_SF_DIR, default sf0.01) is where ReusedExchange appears
and is the committed evidence for those claims.

Usage: python scripts/dump_final_plans_r14.py <tag> <query> ...
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from document_parsing_etl_pipeline_spark.plans.queries import QUERIES
from document_parsing_etl_pipeline_spark.session import get_spark


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = "/root/repo/plans/r14"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("final-plans-r14")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name in names:
        df = QUERIES[name](spark, sf)
        df.collect()
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_final_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan.strip() + "\n")
        print("wrote", path)


if __name__ == "__main__":
    main()
