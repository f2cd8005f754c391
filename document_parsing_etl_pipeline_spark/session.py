"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the conf below is chosen so the same
logical plans survive a 1000-executor cluster: AQE on (runtime skew-join
+ coalesce), broadcast threshold sized for dimension tables, Arrow
enabled for the few Pandas-UDF boundaries.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    # AQE: runtime re-plan (coalesce post-shuffle partitions, skew joins).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dimension tables (region/nation/supplier/customer at test SF) are
    # broadcast; on a real cluster raise with data size, not hardcoded.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow for the mapInPandas/pandas_udf boundaries (multimodal, ANN).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic session timezone: testdata timestamps are naive UTC.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.shuffle.partitions": "32",
    # Parquet scans: keep splits big enough to amortize footer reads.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # Long-session hygiene (round 13): localCheckpoint blocks from
    # FINISHED queries are reclaimed by the ContextCleaner only after
    # a driver GC notices the dead RDD references — with an 8g heap
    # and small per-query data, no GC fires for the length of a
    # 322-query sweep and dead blocks pile up in the block manager
    # (measured: the same 16-query probe list ran 46.2s late in a
    # session vs 38.4s with this set; tail queries inflated up to 3x).
    # The default interval (30min) never fires inside a bench run.
    # 5min, not seconds: System.gc() in local mode is a stop-the-world
    # pause shared with executor tasks, so fire rarely — a 45s/300s/
    # off 3-way measurement of the heavy-query list was a wash
    # (35.2/35.5/37.0s), and 300s still bounds block buildup across a
    # 322-query sweep.
    "spark.cleaner.periodicGC.interval": "300s",
}


def get_spark(app_name: str = "document-parsing-etl-spark",
              master: str | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
