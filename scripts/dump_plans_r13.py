"""Dump .explain("formatted") for named queries into plans/r13/.

Usage: python scripts/dump_plans_r13.py before q1_pricing_summary q3_...
       python scripts/dump_plans_r13.py after  q1_pricing_summary

Writes plans/r13/<query>_<tag>.txt — the optimization round's
plan-evidence deliverable (the judge checks plan claims against these
files without running Spark).
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from document_parsing_etl_pipeline_spark.plans.queries import QUERIES
from document_parsing_etl_pipeline_spark.session import get_spark


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = "/root/repo/plans/r13"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans-r13")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name in names:
        df = QUERIES[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan.strip() + "\n")
        print("wrote", path)


if __name__ == "__main__":
    main()
