"""Materialized dedup artifacts through the table format.

The near-dup pair relations, component maps, and the similarity-join
index are computed once per CORPUS SNAPSHOT and consumed by many
queries (dedup_components, q_dedup_cluster_sizes,
q_incremental_components, ...). Locally that sharing is a
localCheckpoint memo keyed by (session, sf_dir) in plans/queries.py —
correct, but session-scoped: a new session rebuilds everything. The
deployment story (SURVEY §4 "incremental dedup maintenance") is a
snapshot TABLE per artifact: written once by the dedup pass through
sources/tableformat (atomic manifests, time travel, expire/OPTIMIZE),
read by every later session until the corpus snapshot changes.

Set ``SPARK_GRAFT_ARTIFACTS=<dir>`` to turn the memos into table-
format tables under ``<dir>/<corpus-slug>/<artifact>``:

- first request computes the artifact and commits it as a table;
- later requests — INCLUDING after a session restart — read the
  committed snapshot instead of recomputing (tested in
  tests/test_dedup_similarity.py);
- ``expire_snapshots`` / ``optimize_table`` apply like any table.

Unset (the default, and what the driver's correctness/bench runs
use), load_or_build falls back to the in-session localCheckpoint
memo: zero behavior change, no hidden disk state.

The streaming near-dup ingest (streaming/neardup.py) already keeps
its standing LSH index in a table-format table; this module brings
the BATCH artifacts to the same story.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import tableformat as tf


def artifacts_root() -> str | None:
    """The artifact store root, or None for session-memo mode."""
    return os.environ.get("SPARK_GRAFT_ARTIFACTS") or None


def _slug(sf_dir: str) -> str:
    return re.sub(r"[^A-Za-z0-9._-]+", "_", sf_dir.strip("/"))


def table_root(base: str, sf_dir: str, name: str) -> str:
    return os.path.join(base, _slug(sf_dir), name)


def exists(root: str) -> bool:
    return bool(tf._versions(root))


def load_or_build(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    builder: Callable[[], DataFrame],
    memo: dict,
    memo_key: tuple,
) -> DataFrame:
    """The artifact access path shared by the plans-layer memo
    helpers: table-format table when SPARK_GRAFT_ARTIFACTS is set
    (compute-once-per-snapshot, survives session restart), else the
    in-session localCheckpoint memo. The in-memory memo fronts both
    modes so one session never re-reads the table per consumer."""
    if memo_key in memo:
        return memo[memo_key]
    base = artifacts_root()
    if base is None:
        memo[memo_key] = builder().localCheckpoint()
        return memo[memo_key]
    root = table_root(base, sf_dir, name)
    if not exists(root):
        df = builder()
        # stats on the leading column give later point reads file
        # pruning for free; every artifact leads with a doc id
        tf.create_table(spark, df, root, stats_cols=[df.columns[0]])
    memo[memo_key] = tf.read(spark, root)
    return memo[memo_key]
