"""As-of join: for each left row, the most recent right row at or
before its timestamp, per key.

Spark has no native ASOF JOIN; the naive formulation (range-condition
join + argmax) explodes quadratically per key. This implements the
merge-scan pattern instead: union both sides tagged, sort within the
key partition once, and carry the latest right value forward with
``last(ignorenulls)`` — one shuffle on the key, linear work, the same
plan shape at 100 TB (state = one row per partition scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    allow_equal: bool = True,
) -> DataFrame:
    """left ⟕-asof right: adds ``asof_<col>`` for each right value
    column (null when no preceding right row exists)."""
    rv = F.struct(*[F.col(c) for c in right_vals])
    r2 = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        rv.alias("_rv"),
        F.lit(0).alias("_side"),
    )
    rv_type = r2.schema["_rv"].dataType
    l2 = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(rv_type).alias("_rv"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    u = l2.unionByName(r2.withColumn("_lrow", F.lit(None).cast(l2.schema["_lrow"].dataType)))
    # right rows sort before left rows at equal ts iff matches at the
    # same instant are allowed
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side" if allow_equal else F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
    out = matched.where(F.col("_side") == 1).select(
        "_lrow.*",
        *[F.col(f"_m.{c}").alias(f"asof_{c}") for c in right_vals],
    )
    return out
