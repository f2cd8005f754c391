"""Frequency / membership sketches with measurable contracts.

Two classic streaming-sketch structures expressed relationally, so
BOTH engines can compute them bit-for-bit (engine-identical md5
hashing — the DSIR bucket-model recipe) and the driver's hash gate
enforces their probabilistic guarantees as pinned booleans:

- Count-min: d×w counter table. Guarantee: estimate ≥ true count
  (always), estimate ≤ true + ε·N with ε = 2/w (whp). The estimate
  table is d·w rows at ANY corpus scale — the broadcastable state the
  exact per-key count table can't be when keys explode.
- Bloom filter: a DISTINCT set-bits table (≤ num_bits rows).
  Guarantee: no false negatives (always); false-positive rate bounded
  by (1 - e^(-k·n/m))^k. The materialized bit table is the
  join-pruning structure a 100 TB semi-join wants broadcast to every
  scan task instead of shuffling the probe side.

Scale shape (both): one map-side-combinable per-key pre-aggregation
(Zipf: distinct keys ≪ rows), then the sketch builds over the KEY
table, never the event stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seeded_bucket(seed: Column, value: Column, mod: int) -> Column:
    """Engine-identical hash: first 8 md5 hex digits of "seed:value"
    as an integer, mod ``mod``. 32 bits → fits a long exactly; DuckDB
    mirrors with ('0x' || substr(md5(seed || ':' || v), 1, 8))::BIGINT
    % mod."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws(":", seed, value)), 1, 8),
            16, 10,
        ).cast("long"),
        F.lit(mod),
    )


def _seeds(n: int) -> Column:
    return F.explode(F.array([F.lit(i) for i in range(n)])).alias("seed")


def countmin_table(
    keyed: DataFrame, key: str, count_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """The d×w count-min counter table over a (key, count) relation:
    row i holds sum(count) per hash_i(key) bucket. d·w rows total —
    fixed-size broadcast state at any key cardinality."""
    feat = keyed.select(
        F.col(key).cast("string").alias("k"),
        F.col(count_col).alias("n"),
        _seeds(d),
    ).withColumn("bucket", _seeded_bucket(F.col("seed"), F.col("k"), w))
    return feat.groupBy("seed", "bucket").agg(
        F.sum("n").cast("long").alias("c")
    )


def countmin_heavy_hitters(
    df: DataFrame, key: str, d: int = 4, w: int = 256, top: int = 20
) -> DataFrame:
    """Heavy hitters with the count-min contract made measurable: the
    exact top-k keys (one pre-aggregated pass) next to their count-min
    estimates, plus the two guarantee booleans — estimate never under
    the true count, and over it by at most ε·N with ε = 2/w. A sketch
    regression (wrong hashing, dropped counters) flips a boolean and
    fails the oracle hash gate."""
    keyed = df.groupBy(key).agg(F.count("*").alias("n"))
    cms = countmin_table(keyed, key, "n", d=d, w=w)
    total = keyed.agg(F.sum("n").cast("long").alias("total"))
    tops = keyed.orderBy(F.col("n").desc(), F.col(key)).limit(top)
    probes = tops.select(F.col(key), F.col("n"), _seeds(d)).withColumn(
        "bucket",
        _seeded_bucket(F.col("seed"), F.col(key).cast("string"), w),
    )
    est = (
        probes.join(F.broadcast(cms), ["seed", "bucket"])
        .groupBy(key, "n")
        .agg(F.min("c").alias("cms_est"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            key,
            F.col("n").cast("long").alias("exact_n"),
            F.col("cms_est"),
            (F.col("cms_est") >= F.col("n")).alias("overestimate_ok"),
            (
                (F.col("cms_est") - F.col("n"))
                <= F.expr(f"2 * total div {w}")
            ).alias("within_eps_ok"),
        )
    )


def bloom_bits(
    keys: DataFrame, key: str, num_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Build the Bloom filter as a DISTINCT set-bits relation (bit
    positions from k md5 hash rows). ≤ num_bits rows regardless of key
    count — the broadcastable membership structure for semi-join
    pruning at scale."""
    return (
        keys.select(F.col(key).cast("string").alias("kv"), _seeds(k))
        .select(
            _seeded_bucket(F.col("seed"), F.col("kv"), num_bits)
            .alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    probes: DataFrame,
    bits: DataFrame,
    key: str,
    num_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Probe membership: a key is a MAYBE iff all k of its bit
    positions are set. Adds a boolean ``bloom_maybe`` column. The bit
    table joins in by broadcast; the probe side never shuffles until
    the per-key hit count (k rows per DISTINCT key — duplicate probe
    rows are deduplicated before the hit count and restored by the
    final key join, so each duplicate gets the correct flag)."""
    hit = (
        probes.select(key).distinct().select(F.col(key), _seeds(k))
        .withColumn(
            "bit",
            _seeded_bucket(
                F.col("seed"), F.col(key).cast("string"), num_bits
            ),
        )
        .join(F.broadcast(bits), "bit", "left_semi")
        .groupBy(key)
        .agg(F.count("*").alias("_hits"))
        .where(F.col("_hits") == k)
        .select(F.col(key), F.lit(True).alias("bloom_maybe"))
    )
    return probes.join(hit, key, "left").withColumn(
        "bloom_maybe", F.coalesce(F.col("bloom_maybe"), F.lit(False))
    )
