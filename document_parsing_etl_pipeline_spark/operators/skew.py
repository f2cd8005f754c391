"""Skew handling: salted joins and skew diagnostics.

AQE's skew-join split handles sort-merge skew at runtime; salting is
the plan-level tool for the cases AQE can't fix (skewed broadcast-side
misses, skewed aggregations). The salt fan-out trades small-side
duplication (× salt) for even task sizes on the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the big side salted into ``salt`` sub-keys.

    The big side's salt is derived deterministically from the whole
    row hash (uniform spread of a hot key across `salt` tasks); the
    small side is exploded once per salt value. Result is identical to
    the unsalted join.
    """
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt)).cast("int")
    )
    small_s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1))),
    )
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")


def key_skew_profile(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Per-key row counts + share of total — the diagnostic to run
    before choosing a partitioning/salting strategy.

    Total is a 1-row agg crossJoined into the plan (no separate
    count() job); top-k is deterministic (count desc, key asc)."""
    total = df.agg(F.count("*").alias("_total"))
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n_rows") / F.col("_total"), 6))
        .drop("_total")
        .orderBy(F.col("n_rows").desc(), F.col(key))
        .limit(top)
    )
