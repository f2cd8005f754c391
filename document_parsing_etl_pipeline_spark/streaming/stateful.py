"""Custom stateful streaming: cross-batch exactly-once document
dedup via applyInPandasWithState.

The watcher pipeline (watcher.py) is exactly-once per *file*; this
operator extends that to exactly-once per *document id* across
micro-batches — the reference's primary-key INSERT semantics
(reference src/database/repository.py:19-43) re-expressed as keyed
stream state. State per key is one boolean (seen), so state size is
O(distinct keys) and partitions by doc_id across executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "doc_id bigint, text string, n_chars bigint"
STATE_SCHEMA = "seen boolean"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = state.exists and state.get[0]
    if seen:
        return
    first = None
    for pdf in pdfs:
        if len(pdf) and first is None:
            first = pdf.iloc[[0]][["doc_id", "text", "n_chars"]]
    if first is not None:
        state.update((True,))
        yield first


def dedup_stream(stream: DataFrame) -> DataFrame:
    """Emit each doc_id exactly once across the stream's lifetime."""
    return stream.groupBy("doc_id").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
