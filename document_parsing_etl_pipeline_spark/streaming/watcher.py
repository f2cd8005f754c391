"""Streaming ingest: the reference's directory watcher re-expressed
as Structured Streaming over a file source.

Reference parity: watchdog Observer + FileSystemEventHandler picking
up new files and running parse → chunk → store (reference
services/parser/main.py:12-171) and the Airflow FileSensor DAG
(dags/file_sensor.py:70-97). Spark's file streaming source IS the
watcher: it discovers new files per micro-batch, exactly-once, and
scales to a 1000-executor cluster where a watchdog thread cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from ..operators.chunking import chunk_documents

DOC_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
    StructField("source", StringType(), True),
    StructField("n_chars", LongType(), True),
])


def watch_documents(spark: SparkSession, watch_dir: str,
                    fmt: str = "json") -> DataFrame:
    """readStream over a drop directory (one JSON doc per line)."""
    return (
        spark.readStream.format(fmt)
        .schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .load(watch_dir)
    )


def parse_stream(stream: DataFrame) -> DataFrame:
    """Streaming parse→chunk stage (same operators as batch: the
    chunker is a narrow projection, so it lifts to streaming as-is)."""
    return chunk_documents(stream).withColumn(
        "ingest_time", F.current_timestamp()
    )


def start_pipeline(spark: SparkSession, watch_dir: str, out_dir: str,
                   checkpoint_dir: str, available_now: bool = True):
    """Wire watcher → parse → chunk → parquet sink with checkpointing
    (the exactly-once replacement for the reference's Postgres
    transaction per document)."""
    chunks = parse_stream(watch_documents(spark, watch_dir))
    writer = (
        chunks.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
