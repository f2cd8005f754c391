"""Token-bucket rate-limit auditing over an event log.

Admission control replayed over history: each user owns a bucket of
``cap`` tokens refilling continuously at a fixed rate; every event
consumes one token if available (allowed) and is rejected otherwise.
The audit answers "which requests WOULD have been throttled under
policy X" — the abuse-analysis / quota-sizing pass run before turning
a limiter on, and the batch twin of the limiter's streaming state.

Like sequence packing (chunking.sequence_pack), the bucket state is a
true sequential recurrence — the clamp (min with cap) makes it
non-associative, so no prefix-sum window can express it. It therefore
runs as ONE Arrow call per partition over user-partitioned,
time-sorted data with state reset at user boundaries, carried across
Arrow batch boundaries (task memory = one batch). All arithmetic is
integer micro-tokens (refill = Δt_us div refill_div), so the
recursive-CTE oracle replays the identical recurrence exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000        # micro-tokens per token
DEFAULT_CAP = 3          # bucket capacity, tokens
DEFAULT_REFILL_DIV = 3_600   # µs per micro-token == 1 token/hour


def rate_limit_audit(
    events: DataFrame,
    cap: int = DEFAULT_CAP,
    refill_div: int = DEFAULT_REFILL_DIV,
) -> DataFrame:
    """Replay the token-bucket policy over (user_id, ts_us, event_id)
    ordered events. Buckets start FULL. Per event:
    s = min(cap·1e6, s_prev + Δt_us div refill_div);
    allowed = s ≥ 1e6; s_after = s - 1e6 if allowed else s.

    Output: (event_id, user_id, ts_us, allowed, tokens_after_micro),
    one row per event."""
    import pandas as pd  # noqa: F401 — mapInPandas contract

    cap_micro = cap * MICRO
    out_schema = (
        "event_id long, user_id long, ts_us long, "
        "allowed boolean, tokens_after_micro long"
    )

    def audit_partition(batches):
        prev_user, prev_ts, s = None, 0, 0
        for pdf in batches:
            if not len(pdf):
                continue
            allowed_col, after_col = [], []
            for user, ts in zip(pdf["user_id"], pdf["ts_us"]):
                ts = int(ts)
                if user != prev_user:
                    s = cap_micro
                else:
                    s = min(cap_micro, s + (ts - prev_ts) // refill_div)
                ok = s >= MICRO
                if ok:
                    s -= MICRO
                allowed_col.append(ok)
                after_col.append(s)
                prev_user, prev_ts = user, ts
            out = pdf[["event_id", "user_id", "ts_us"]].copy()
            out["allowed"] = allowed_col
            out["tokens_after_micro"] = after_col
            yield out

    return (
        events.select("event_id", "user_id", "ts_us")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts_us", "event_id")
        .mapInPandas(audit_partition, out_schema)
    )
