"""Magnitude-stress sweep: run every registered query against a TINY
corpus whose numeric magnitudes are inflated to 100 TB-scale totals,
so integer-overflow sites trigger WITHOUT data volume (ANSI mode
turns silent wraparound into errors).

The sf1-equivalent bench (BENCH_SF1_r08.json) catches overflows that
10x data reaches; this catches the rest of the headroom envelope in
~minutes: money columns x SCALE puts cents-sums past 9.2e12 (where
x*1e6 ppm shares overflow BIGINT), event values likewise, and doc
lengths stress count-scaled arithmetic. Only ERRORS are checked —
value parity at these magnitudes is separately guaranteed by the
engine-identical integer formulas (SURVEY §4 scale guard).

Usage: python scripts/magnitude_stress.py [scale]
Writes MAGNITUDE_STRESS.json {query: error | "ok"}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_stress_corpus(spark, base_sf: str, out_dir: str,
                        scale: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)

    def _w(df, name):
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet"))

    rd = lambda t: spark.read.parquet(os.path.join(base_sf, f"{t}.parquet"))
    # money columns scaled: totals land at ~totals(sf0.001) * scale
    _w(rd("orders").withColumn(
        "o_totalprice", F.col("o_totalprice") * scale), "orders")
    _w(rd("lineitem")
       .withColumn("l_extendedprice", F.col("l_extendedprice") * scale),
       "lineitem")
    _w(rd("events").withColumn("value", F.col("value") * scale), "events")
    _w(rd("customer").withColumn(
        "c_acctbal", F.col("c_acctbal") * scale), "customer")
    _w(rd("supplier").withColumn(
        "s_acctbal", F.col("s_acctbal") * scale), "supplier")
    _w(rd("part").withColumn(
        "p_retailprice", F.col("p_retailprice") * scale), "part")
    for t in ("region", "nation", "documents", "embeddings"):
        _w(rd(t), t)


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from document_parsing_etl_pipeline_spark.plans import queries as Q
    from document_parsing_etl_pipeline_spark.session import get_spark

    spark = get_spark("magstress")
    corpus = os.path.join(tempfile.gettempdir(), "mag_stress")
    build_stress_corpus(spark, "/root/testdata/sf0.001", corpus, scale)
    results: dict[str, str] = {}
    failed = 0
    for name, fn in Q.QUERIES.items():
        try:
            fn(spark, corpus).write.mode("overwrite").format("noop").save()
            results[name] = "ok"
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            results[name] = msg
            failed += 1
            print(f"FAIL {name}: {msg}")
    out = {
        "scale": scale,
        "n_queries": len(results),
        "n_fail": failed,
        "failures": {k: v for k, v in results.items() if v != "ok"},
    }
    with open(os.path.join(REPO, "MAGNITUDE_STRESS.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"n_fail": failed, "n_queries": len(results)}))


if __name__ == "__main__":
    main()
