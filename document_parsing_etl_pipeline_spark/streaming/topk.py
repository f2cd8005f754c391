"""Streaming sketches over keyed state: sharded Space-Saving top-k
heavy hitters and a per-key EWMA control chart — both with bounded
state over unbounded streams.

The scale contract: state is O(shards x m) counters no matter how
large the item domain grows — the property that separates a heavy-
hitter operator from streaming word-count (whose state is O(|domain|)
and eventually OOMs on open vocabularies like URLs or query strings).

Design (Metwally et al.'s Space-Saving, sharded by item hash):
- each item is hash-routed to exactly ONE shard (Spark's keyed-state
  partitioning), so shard summaries never double-count and the union
  of shard outputs is the global summary;
- within a shard, Space-Saving keeps m counters: a tracked item
  increments; an untracked item REPLACES the minimum counter,
  inheriting its count as the overestimation bound ``err``;
- guarantees per shard (n = rows routed to the shard): every item
  with true count > n/m is tracked, and for every tracked item
  true <= count <= true + err — both asserted in tests;
- emitted per micro-batch as an append changelog (shard, item, count,
  err, n_processed, seq); readers keep the last seq per shard, the
  same consumption rule as latest_state_stream's changelog.

The batch analog of this readout is q_countmin_heavy_hitters
(plans/queries.py) — count-min sketches frequencies, Space-Saving
tracks identities; production pipelines run exactly this pair.
Reference parity: the reference has no streaming surface (its watcher
is a one-doc-at-a-time loop, main.py); this operator is part of the
LLM-pipeline brief's streaming family.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TOPK_OUT_SCHEMA = (
    "shard int, item string, count bigint, err bigint, "
    "n_processed bigint, seq bigint"
)
# state is the JSON-encoded summary: bounded at m entries by
# construction, so the blob is O(m) regardless of stream length
TOPK_STATE_SCHEMA = "summary string, n bigint, seq bigint"


def topk_stream(
    stream: DataFrame,
    m: int = 8,
    shards: int = 4,
    item_col: str = "item",
    order_cols: tuple[str, str] = ("ts_us", "event_id"),
) -> DataFrame:
    """Sharded Space-Saving heavy hitters over ``stream[item_col]``.

    Rows are folded in (ts_us, event_id) order within each batch so
    replays are deterministic; across batches the shard summary and
    its processed-count carry in keyed state.
    """
    o1, o2 = order_cols

    def fold_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            blob, n, seq = state.get
            counters: dict[str, list[int]] = json.loads(blob)
        else:
            counters, n, seq = {}, 0, 0
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            # timeout-less operator: no data, nothing to emit
            state.update((json.dumps(counters), n, seq))
            return
        batch = pd.concat(chunks).sort_values(list(order_cols))
        for it in batch[item_col].astype(str):
            n += 1
            if it in counters:
                counters[it][0] += 1
            elif len(counters) < m:
                counters[it] = [1, 0]
            else:
                # evict the min counter (deterministic tiebreak on
                # item so replays agree), inherit its count as err
                victim = min(
                    counters, key=lambda k: (counters[k][0], k)
                )
                base = counters[victim][0]
                del counters[victim]
                counters[it] = [base + 1, base]
        seq += 1
        state.update((json.dumps(counters), n, seq))
        out = pd.DataFrame(
            {
                "shard": int(key[0]),
                "item": list(counters.keys()),
                "count": [c[0] for c in counters.values()],
                "err": [c[1] for c in counters.values()],
                "n_processed": n,
                "seq": seq,
            }
        )
        yield out

    routed = stream.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(item_col)), F.lit(shards))
        .cast("int"),
    )
    return routed.groupBy("shard").applyInPandasWithState(
        fold_fn,
        outputStructType=TOPK_OUT_SCHEMA,
        stateStructType=TOPK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -------------------------------------------------------------------
# streaming EWMA control chart (the stream twin of the batch
# q_bollinger_bands / q_events_anomaly family): per-key exponentially
# weighted mean/variance carried in state, per-event z-flag
# -------------------------------------------------------------------

EWMA_OUT_SCHEMA = (
    "key string, event_id bigint, ts_us bigint, value double, "
    "ewma_milli bigint, ewvar_milli bigint, is_anomaly boolean, "
    "n_seen bigint"
)
EWMA_STATE_SCHEMA = "mean double, var double, n bigint"


def ewma_anomaly_stream(
    stream,
    alpha: float = 0.2,
    k_sigma: float = 3.0,
    key_col: str = "key",
    min_n: int = 5,
):
    """Streaming EWMA control chart: per key, an exponentially
    weighted mean and variance (West 1979 incremental update) carried
    across micro-batches in keyed state; each event is flagged if it
    sits more than ``k_sigma`` EW standard deviations from the mean
    ONCE the key has warmed up (``min_n`` events — before that,
    nothing is trustworthy and nothing is flagged).

    Scale contract: state is three scalars per key (O(|keys|), the
    same bound as every keyed operator here); arrival-order folding
    within a batch is pinned to (ts_us, event_id) so replays are
    deterministic. The batch analogs (q_bollinger_bands' trailing
    window, q_events_anomaly's global z) are the oracle family; the
    EWMA form is what the STREAM needs because it never re-reads
    history."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    def fold_fn(key, pdfs, state: GroupState):
        if state.exists:
            mean, var, n = state.get
        else:
            mean, var, n = 0.0, 0.0, 0
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            state.update((mean, var, n))
            return
        batch = pd.concat(chunks).sort_values(["ts_us", "event_id"])
        out_rows = []
        for _, row in batch.iterrows():
            x = float(row["value"])
            if n == 0:
                flagged = False
                mean, var, n = x, 0.0, 1
            else:
                sigma = var ** 0.5
                flagged = bool(
                    n >= min_n and abs(x - mean) > k_sigma * sigma
                )
                diff = x - mean
                incr = alpha * diff
                mean = mean + incr
                var = (1.0 - alpha) * (var + diff * incr)
                n += 1
            out_rows.append(
                (
                    str(key[0]), int(row["event_id"]),
                    int(row["ts_us"]), x,
                    int(round(mean * 1000)),
                    int(round(var * 1000)),
                    flagged, n,
                )
            )
        state.update((mean, var, n))
        yield pd.DataFrame(
            out_rows,
            columns=[
                "key", "event_id", "ts_us", "value", "ewma_milli",
                "ewvar_milli", "is_anomaly", "n_seen",
            ],
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fold_fn,
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
