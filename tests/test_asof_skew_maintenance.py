import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from document_parsing_etl_pipeline_spark.operators.asof import asof_join
from document_parsing_etl_pipeline_spark.operators.skew import (
    key_skew_profile, salted_join,
)
from document_parsing_etl_pipeline_spark.sources.maintenance import (
    compact, file_stats,
)


def test_asof_join_picks_latest_preceding(spark):
    trades = spark.createDataFrame(
        [Row(sym="A", t=10, px=0.0), Row(sym="A", t=25, px=0.0),
         Row(sym="B", t=15, px=0.0)]
    )
    quotes = spark.createDataFrame(
        [Row(sym="A", qt=5, bid=1.0), Row(sym="A", qt=20, bid=2.0),
         Row(sym="A", qt=30, bid=3.0), Row(sym="B", qt=40, bid=9.0)]
    )
    out = asof_join(trades, quotes, key="sym", left_ts="t",
                    right_ts="qt", right_vals=["bid"])
    got = {(r.sym, r.t): r.asof_bid for r in out.collect()}
    assert got[("A", 10)] == 1.0   # quote@5 is latest ≤ 10
    assert got[("A", 25)] == 2.0   # quote@20, not 30
    assert got[("B", 15)] is None  # no preceding quote


def test_asof_join_equal_timestamp(spark):
    left = spark.createDataFrame([Row(k="x", t=10)])
    right = spark.createDataFrame([Row(k="x", rt=10, v=7)])
    eq = asof_join(left, right, "k", "t", "rt", ["v"], allow_equal=True)
    assert eq.collect()[0].asof_v == 7
    ne = asof_join(left, right, "k", "t", "rt", ["v"], allow_equal=False)
    assert ne.collect()[0].asof_v is None


def test_salted_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [Row(k=i % 3, payload=i) for i in range(100)]
    )
    small = spark.createDataFrame([Row(k=0, name="zero"), Row(k=1, name="one")])
    plain = big.join(small, "k").select("k", "payload", "name")
    salted = salted_join(big, small, "k", salt=4).select("k", "payload", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_key_skew_profile(spark):
    df = spark.createDataFrame(
        [Row(k="hot")] * 90 + [Row(k="cold")] * 10
    )
    prof = key_skew_profile(df, "k").collect()
    assert prof[0].k == "hot" and prof[0].share == 0.9


def test_compaction_reduces_files(tmp_path, spark):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.range(10000).repartition(40).write.parquet(src)
    assert file_stats(spark, src).count() == 40
    compact(spark, src, dst, target_file_mb=128)
    assert file_stats(spark, dst).count() == 1
    assert spark.read.parquet(dst).count() == 10000


def test_stateful_stream_dedup(tmp_path, spark):
    from document_parsing_etl_pipeline_spark.streaming.stateful import (
        dedup_stream,
    )
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )
    drop = tmp_path / "in"
    drop.mkdir()
    rows = [
        {"doc_id": 1, "text": "a", "n_chars": 1},
        {"doc_id": 1, "text": "a", "n_chars": 1},   # dup in same batch
        {"doc_id": 2, "text": "b", "n_chars": 1},
    ]
    (drop / "f.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("n_chars", LongType()),
    ])
    out = str(tmp_path / "out")

    def run_batch():
        stream = spark.readStream.schema(schema).json(str(drop))
        q = (dedup_stream(stream).writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", str(tmp_path / "ck"))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_batch()
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert got == [1, 2]

    # second batch: doc 1 again + new doc 3 → only 3 is emitted
    # (state recovered from the checkpoint)
    (drop / "g.json").write_text(json.dumps(
        {"doc_id": 1, "text": "a", "n_chars": 1}) + "\n" + json.dumps(
        {"doc_id": 3, "text": "c", "n_chars": 1}))
    run_batch()
    got2 = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert got2 == [1, 2, 3]
