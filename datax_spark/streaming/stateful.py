"""Custom stateful streaming operator: per-key running CDC stats.

The applyInPandasWithState escape hatch for operators Structured
Streaming's built-ins can't express (SURVEY.md §2.7 "custom stateful"):
here, a per-repo running aggregate maintained ACROSS micro-batches —
events seen, last op, max seq, live-key estimate — the DataX
Communication counters (CommunicationTool.java:16-50) kept per shard
instead of per task, surviving restarts through the state store.

Design notes for scale: state is keyed by repo (same key the engine
buckets by), so the state store shards align with the CDC partitioning;
the per-group pandas function is Arrow-batched (never row-at-a-time
Python); state size is O(1) per key (four scalars), so 10^8 repos cost
~GBs across executors, not per-executor.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("events", LongType()),
        StructField("deletes", LongType()),
        StructField("max_seq", LongType()),
        StructField("last_op", StringType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("events", LongType()),
        StructField("deletes", LongType()),
        StructField("max_seq", LongType()),
        StructField("last_op", StringType()),
    ]
)


def _update_repo_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (repo,) = key
    if state.exists:
        events, deletes, max_seq, last_op = state.get
    else:
        events, deletes, max_seq, last_op = 0, 0, -1, None
    for pdf in pdfs:
        events += len(pdf)
        deletes += int((pdf["op"] == "delete").sum())
        batch_max = int(pdf["seq"].max())
        if batch_max > max_seq:
            max_seq = batch_max
            last_op = str(pdf.loc[pdf["seq"].idxmax(), "op"])
    state.update((events, deletes, max_seq, last_op))
    yield pd.DataFrame(
        {
            "repo": [repo],
            "events": [events],
            "deletes": [deletes],
            "max_seq": [max_seq],
            "last_op": [last_op],
        }
    )


def repo_stats_stream(events_stream) -> Any:
    """Running per-repo stats DataFrame for a change-event stream.

    Each micro-batch emits the UPDATED cumulative row for every repo it
    touched (update output mode); state lives in the checkpointed state
    store, so a restart resumes the counters exactly.
    """
    return (
        events_stream.select("repo", "op", "seq")
        .groupBy("repo")
        .applyInPandasWithState(
            _update_repo_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
