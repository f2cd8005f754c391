"""Dataset maintenance: small-file compaction and layout stats.

A 100 TB store accumulating streaming micro-batch output degrades
into millions of small parquet files; compaction rewrites a dataset
into target-sized files (scan cost returns to O(bytes), not O(files)).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            if not n.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, n))
    return total


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 128,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite ``src`` parquet into ``dst`` with ~target-sized files.

    Returns the number of output files requested. (Local heuristic
    sizes from the filesystem; on a cluster the same arithmetic runs
    off the catalog's size stats.)
    """
    df = spark.read.parquet(src)
    n_files = max(1, math.ceil(_dir_bytes(src) / (target_file_mb << 20)))
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dst)
    return n_files


def file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-file row/size profile of a parquet dataset (the 'do I need
    compaction?' diagnostic)."""
    df = spark.read.parquet(path)
    return (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(F.count("*").alias("n_rows"))
        .orderBy("n_rows")
    )
