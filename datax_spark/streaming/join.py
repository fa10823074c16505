"""Watermarked stream-stream joins — correlating two live change feeds.

DataX itself is batch-only, so there is no direct reference analog; this
is the Structured-Streaming capability a CDC deployment reaches for when
two tailed logs must be correlated BEFORE the apply (orders with their
payments, commits with their CI events, a changelog with a slowly
changing enrichment feed). Spark's stream-stream join keeps both sides'
unmatched rows in the state store until the watermark proves no match
can still arrive; the interval condition is what makes that state
BOUNDED — without a time constraint the state grows forever, which is
why this helper refuses to build an unconstrained join.

Physical shape (the 100-TB story): both sides shuffle ONCE on the join
keys into co-partitioned state stores (one Exchange each, the same
hash partitioning the state reuses across micro-batches); per-batch
work is O(batch + matched state), and state size is bounded by
``watermark + tolerance`` of stream volume per key. Skewed keys behave
exactly like any keyed shuffle — salt upstream if one key dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: str = "10 minutes",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two streams on ``on`` with the right row's event time
    within ``tolerance`` of the left's (both directions — the symmetric
    interval join; pass the events through ``F.expr`` filters afterward
    for one-sided semantics).

    ``watermark`` (default: ``tolerance``) is how much event-time
    disorder each side admits; rows older than it are dropped by the
    state store (visible in ``numRowsDroppedByWatermark``), and with
    ``how='left_outer'`` an unmatched left row emits with NULL right
    columns only after the watermark proves no match can arrive — the
    same emit-on-eviction contract as append-mode windowed aggregation.

    Column layout: left columns keep their names; right payload columns
    are prefixed ``r_`` (join keys are not duplicated); the right event
    time emits as ``r_<right_ts>``. Both inputs may be streaming, or one
    side static (Spark handles stream-static joins without state).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(
            f"stream_interval_join: unsupported how={how!r} "
            "(inner or left_outer)"
        )
    if not on:
        raise ValueError("stream_interval_join: need at least one key")
    missing = [k for k in on if k not in left.columns or k not in right.columns]
    if missing:
        raise ValueError(f"stream_interval_join: keys {missing} absent")
    wm = watermark or tolerance
    lw = left.withWatermark(left_ts, wm) if left.isStreaming else left
    # prefix right payload so the joined frame has no ambiguous names
    rpay = [c for c in right.columns if c not in on]
    rw = right.select(
        *on, *[F.col(c).alias(f"r_{c}") for c in rpay]
    )
    rw = rw.withWatermark(f"r_{right_ts}", wm) if right.isStreaming else rw
    lts, rts = F.col(left_ts), F.col(f"r_{right_ts}")
    cond = [lw[k] == rw[k] for k in on] + [
        rts >= lts - F.expr(f"INTERVAL {tolerance}"),
        rts <= lts + F.expr(f"INTERVAL {tolerance}"),
    ]
    joined = lw.join(rw, cond, how)
    # drop the duplicated right-side key columns
    keep = [lw[k].alias(k) for k in on] + [
        c for c in joined.columns if c not in on
    ]
    dedup_keys = joined.select(*keep)
    return dedup_keys
