"""Isolated best-of-N noop-sink timing probe for named queries.

Usage: python scripts/probe_queries.py [-nN] q1_pricing_summary q_basket_lift ...
Prints one line per query: best + all runs. Same session factory and
measurement methodology as bench.py (noop sink, warm-first), minus the
harness. For optimization-round before/after isolation.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from document_parsing_etl_pipeline_spark.plans.queries import QUERIES
from document_parsing_etl_pipeline_spark.session import get_spark


def main():
    args = sys.argv[1:]
    runs = 3
    if args and args[0].startswith("-n"):
        runs = int(args[0][2:])
        args = args[1:]
    spark = get_spark("probe")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm = "/root/testdata/sf0.001"
    out = {}
    for name in args:
        fn = QUERIES[name]
        if os.path.isdir(warm):
            fn(spark, warm).write.mode("overwrite").format("noop").save()
        durs = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf).write.mode("overwrite").format("noop").save()
            durs.append(round(time.time() - t0, 3))
        out[name] = durs
        print(f"{name:36s} best={min(durs):7.3f}  runs={durs}", flush=True)
    print(json.dumps({n: min(d) for n, d in out.items()}))


if __name__ == "__main__":
    main()
