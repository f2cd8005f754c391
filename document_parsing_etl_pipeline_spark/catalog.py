"""Table catalog over the driver-generated parquet test data.

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file/dir per table under an sf dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet has shipped with two physical types for `ts`
        # across driver generations: TIMESTAMP(NANOS) (readable only as
        # long via the legacy conf) and TIMESTAMP(MICROS) (read as
        # TIMESTAMP_NTZ). All queries derive epoch micros with
        # `ts div 1000`, so normalize both to nanos-as-long here.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type == "timestamp_ntz":
            # NTZ wall-clock == UTC epoch for this data; DuckDB's
            # epoch_us(ts) reads the same wall clock, so oracles agree.
            # timestampdiff over two NTZ values is pure wall-clock
            # arithmetic — independent of spark.sql.session.timeZone
            # (a cast to LTZ here would silently shift every timestamp
            # in a session not pinned to UTC).
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampdiff(MICROSECOND,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                ) * F.lit(1000),
            )
        elif ts_type != "long":
            # LTZ (isAdjustedToUTC micros): unix_micros reads the
            # absolute instant — also timezone-independent
            df = df.withColumn(
                "ts", F.unix_micros(F.col("ts")) * F.lit(1000)
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
