"""The CDC apply pipeline: quarantine -> dedup -> MERGE, batch + streaming.

This is the engine's equivalent of DataX's whole JobContainer/TaskGroup
data plane (SURVEY.md §3): the reader->channel->writer record flow
collapses into one declarative micro-batch function ``apply_batch``,
which Structured Streaming (``tail_and_apply``) or a deterministic
segment loop (``apply_segments``) drives.

Exactly-once composition:
- Structured Streaming's checkpoint gives at-least-once batch replay with
  stable batch ids (the ShardCheckpoint analog, SURVEY.md §2.7);
- merge_apply's batch-id fence turns that into exactly-once (a replayed
  batch id is a committed no-op);
- data files are immutable and the manifest commit is CAS, so a crashed
  attempt leaves only unreferenced orphan files.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datax_spark.lake.table import (
    BUCKET_COL,
    LakeTable,
    bucket_expr,
    snap_bucket_dtype,
)
from datax_spark.operators.dedup import dedup_latest
from datax_spark.operators.merge import (
    DELETE_OP,
    MergeResult,
    OP_COL,
    merge_apply,
)
from datax_spark.util import RateLimiter
from datax_spark.quality.quarantine import (
    REASON_COL,
    ErrorLimit,
    append_quarantine,
    dirty_reason,
)


def dirty_reason_col(
    constraints: dict[str, str] | None = None,
    key_cols: list[str] | None = None,
    content_col: str | None = "content",
):
    return dirty_reason(
        key_cols or KEY_COLS, content_col=content_col, constraints=constraints
    )

KEY_COLS = ["repo", "path", "commit"]


@dataclass
class BatchMetrics:
    """DataX Communication counter vocabulary per micro-batch
    (core/.../communication/CommunicationTool.java:16-50)."""

    batch_id: int
    total_records: int = 0
    clean_records: int = 0
    dirty_records: int = 0
    deduped_keys: int = 0  # distinct keys in the clean batch (post-dedup)
    upserts: int = 0  # clean non-delete EVENTS (pre-dedup, stats-job count)
    deletes: int = 0  # clean delete EVENTS (pre-dedup, stats-job count)
    affected_buckets: int = 0
    applied: bool = False
    version: int | None = None
    records_per_sec: float = 0.0
    dirty_reasons: dict = field(default_factory=dict)
    bytes_estimate: int = 0
    seconds: float = 0.0
    # per-bucket {bucket: max_seq} this batch advanced — the per-shard
    # checkpoint positions (ShardCheckpoint.java:8-51 analog), exposed in
    # the metrics JSONL so consumers can track lineage without reading
    # manifests.
    lineage: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)


@dataclass
class PipelineConfig:
    quarantine_dir: str | None = None
    error_limit: ErrorLimit = field(default_factory=ErrorLimit)
    stream_id: str = "default"
    metrics_path: str | None = None
    # Batch-mode rate limits, the DataX job.setting.speed record/byte
    # throttle (Channel.java:176-239 tps AND bps halves). Streaming paths
    # rate-limit natively via maxFilesPerTrigger / maxBytesPerTrigger.
    max_events_per_sec: float | None = None
    max_bytes_per_sec: float | None = None
    # Post-commit hooks (HookInvoker.java:24-87 analog): each callable
    # receives the BatchMetrics of a batch that actually COMMITTED —
    # fenced replays and dry no-ops never fire hooks (exactly-once
    # includes side effects).
    on_commit: list = field(default_factory=list)
    # DataX writeMode analog: 'replace' = whole-row last-write-wins (ots
    # PutRow); 'update' = partial-column patch, null incoming columns
    # keep the old value (ots UpdateRow). COW patches at merge time;
    # MOR appends patch-tagged deltas and coalesces at read/compact.
    write_mode: str = "replace"
    # Run the compaction POLICY after every committed batch: MOR tables
    # use maybe_compact (delta-ratio + file-count bound — a no-op
    # decision is one driver-side file listing, no Spark job), COW
    # tables bin-pack fragmented buckets. This is what keeps the
    # steady-state resolved-read cost flat over a 10^10-event stream
    # (BASELINE.md round-2 sustained run); compact_options feed through
    # (max_delta_ratio / max_files_per_bucket).
    auto_compact: bool = False
    compact_options: dict = field(default_factory=dict)
    # MOR delete encoding: 'inline' tombstone rows in the delta files, or
    # 'eq' equality-delete files (narrow key+seq files, the Iceberg v2
    # delete-file analog — see MorTable.apply_deduped). COW tables reject
    # 'eq' (deletes resolve at merge time there).
    delete_encoding: str = "inline"


DIRTY_BUCKET = -1
_REASONS = ("invalid_op", "null_key", "null_content")


def batch_stats_agg(
    tagged: DataFrame,
    bucket_key: str,
    num_buckets: int,
    key_cols: list[str],
    want_bytes: bool = False,
    reasons: tuple = _REASONS,
    dtype=None,
    bytes_col: str = "content",
) -> list:
    """ONE per-bucket stats pass over the tagged (reason-annotated) batch.

    Dirty rows are routed to sentinel bucket ``DIRTY_BUCKET``; every real
    bucket therefore aggregates clean rows only, so its
    (max_seq, deletes, events, distinct_keys) feed the merge directly,
    while the quality counters (total/dirty/per-reason[/bytes]) fall out
    of the same job by summing across ALL buckets — the DataX
    Communication counters (TransformerExchanger.java:117-127) as side
    outputs of the one narrow stats scan, with no Observation machinery
    (Observation retrieval is unsupported inside foreachBatch on Spark 4,
    which used to force a second scan per streaming micro-batch).
    The scan is column-pruned to keys/op/seq + the reason expression's
    inputs; a batch is O(rows-scanned) with exactly 2 Spark jobs total
    (this + the write), batch and streaming alike.
    """
    is_dirty = F.col(REASON_COL).isNotNull()
    bucket = (
        F.when(is_dirty, F.lit(DIRTY_BUCKET))
        .otherwise(bucket_expr(bucket_key, num_buckets, dtype))
        .alias(BUCKET_COL)
    )
    aggs = [
        F.max("seq").alias("max_seq"),
        F.sum(F.when(F.col(OP_COL) == DELETE_OP, 1).otherwise(0)).alias("deletes"),
        F.count(F.lit(1)).alias("events"),
        F.count_distinct(*[F.col(k) for k in key_cols]).alias("distinct_keys"),
        *[
            F.sum((F.col(REASON_COL) == r).cast("long")).alias(r)
            for r in reasons
        ],
    ]
    want_bytes = want_bytes and bytes_col in tagged.columns
    if want_bytes:
        aggs.append(
            F.sum(
                F.octet_length(F.coalesce(F.col(bytes_col), F.lit(""))).cast(
                    "decimal(38,0)"
                )
            ).alias("bytes")
        )
    sel = [bucket, F.col(REASON_COL), F.col("seq"), F.col(OP_COL)]
    sel += [F.col(k) for k in key_cols]
    if want_bytes:
        sel.append(F.col(bytes_col))
    return tagged.select(*sel).groupBy(BUCKET_COL).agg(*aggs).collect()


def apply_batch(
    table: LakeTable,
    events: DataFrame,
    batch_id: int,
    config: PipelineConfig | None = None,
    stream_extras: dict | None = None,
) -> BatchMetrics:
    """Apply one micro-batch of change events to the lake table.

    ``stream_extras``: extra keys committed inside this stream's fence
    entry (e.g. ``source_offsets`` — the consumed Kafka offset map), so
    source position rides the SAME atomic commit as the data it
    produced (Delta's ``txn`` idempotent-writer pattern). A lost
    streaming checkpoint can then resume from the table itself."""
    cfg = config or PipelineConfig()
    t0 = time.monotonic()
    m = BatchMetrics(batch_id=batch_id)

    # Fence FIRST: a replayed batch id must be a complete no-op — no
    # re-quarantine, no error-limit re-check (exactly-once includes the
    # side channels, not just the merge).
    last = table.last_batch_id(cfg.stream_id)
    if last is not None and batch_id <= last:
        m.applied = False
        return m

    # Table-level CHECK constraints (Delta analog) ride the same tagged
    # pass: one extra WHEN branch per constraint, zero extra jobs.
    snap = table.snapshot()
    props = snap.properties
    key_cols = props.get("key_cols") or KEY_COLS
    constraints = props.get("constraints") or {}
    # Payload schemas without a 'content' column (generic envelope
    # tables) skip the null_content rule — ADVICE r3, same contract as
    # quarantine.split_dirty(content_col=None).
    content_col = "content" if "content" in events.columns else None
    reasons = tuple(r for r in _REASONS if content_col or r != "null_content")
    reasons = reasons + tuple(f"constraint:{n}" for n in constraints)
    tagged = events.withColumn(
        REASON_COL, dirty_reason_col(constraints, key_cols, content_col)
    )
    is_dirty = F.col(REASON_COL).isNotNull()
    # Byte accounting (bps throttle / metrics) forces the otherwise
    # column-pruned stats scan to read `content` — only pay that when a
    # consumer asked for it (and the payload has the column).
    want_bytes = (
        cfg.max_bytes_per_sec is not None or cfg.metrics_path is not None
    ) and content_col is not None
    clean = tagged.filter(~is_dirty).drop(REASON_COL)

    # Stats job first (narrow scan; quality counters AND per-bucket merge
    # stats in one pass — see batch_stats_agg), then one wide write job
    # that references the dedup subtree for both the anti-join key side
    # and the upsert images.
    all_stats = batch_stats_agg(
        tagged, props["bucket_key"], props["num_buckets"], key_cols,
        want_bytes=want_bytes, reasons=reasons,
        dtype=snap_bucket_dtype(snap),
    )
    stats = [
        r for r in all_stats
        if r[BUCKET_COL] is not None and r[BUCKET_COL] != DIRTY_BUCKET
    ]
    deduped = dedup_latest(clean, key_cols)
    if cfg.write_mode not in ("replace", "update"):
        raise ValueError(f"unknown write_mode {cfg.write_mode!r}")
    if props.get("table_mode") == "mor":
        # Merge-on-read: append the deduped delta, O(batch) — one pass,
        # no persist (the delta is consumed exactly once by the write).
        # write_mode='update' appends PATCH-tagged rows; the coalesce
        # against older state is deferred to read/compact (_resolve_patch).
        from datax_spark.lake.mor import MorTable

        mor = table if isinstance(table, MorTable) else MorTable(
            table.spark, table.path, branch=table.branch
        )
        # eq encoding stages TWO writes (upsert delta + narrow delete
        # keys) off the same deduped subtree — persist so the dedup
        # shuffle runs once, exactly like the COW multi-consumer case
        two_writes = cfg.delete_encoding == "eq"
        if two_writes:
            deduped = deduped.persist()
        try:
            result: MergeResult = mor.apply_deduped(
                deduped, batch_id, cfg.stream_id, bucket_stats=stats,
                patch=cfg.write_mode == "update",
                delete_encoding=cfg.delete_encoding,
                stream_extras=stream_extras,
            )
        finally:
            if two_writes:
                deduped.unpersist()
    else:
        if cfg.delete_encoding != "inline":
            raise ValueError(
                "delete_encoding='eq' requires a merge-on-read table "
                "(COW merges resolve deletes at apply time)"
            )
        deduped = deduped.persist()
        try:
            result = merge_apply(
                table,
                deduped,
                batch_id=batch_id,
                stream_id=cfg.stream_id,
                bucket_stats=stats,
                patch=cfg.write_mode == "update",
                stream_extras=stream_extras,
            )
        finally:
            deduped.unpersist()
    # Quality counters: driver-side sums over the O(num_buckets) stats
    # rows — dirty rows all landed in the sentinel bucket, so totals are
    # exact and no second scan of the batch ever runs.
    m.total_records = sum(int(r["events"]) for r in all_stats)
    m.bytes_estimate = (
        sum(int(r["bytes"] or 0) for r in all_stats) if want_bytes else 0
    )
    m.dirty_records = sum(
        int(r["events"]) for r in all_stats
        if r[BUCKET_COL] is None or r[BUCKET_COL] == DIRTY_BUCKET
    )
    m.clean_records = m.total_records - m.dirty_records
    m.dirty_reasons = {
        k: v
        for k in reasons
        if (v := sum(int(r[k] or 0) for r in all_stats))
    }
    if cfg.quarantine_dir and m.dirty_records:
        append_quarantine(
            tagged.filter(is_dirty), cfg.quarantine_dir, batch_id, count=False
        )
    m.applied = result.applied
    m.version = result.version
    # upserts/deletes come from the pre-dedup stats (raw clean events);
    # deduped_keys is the true post-dedup cardinality, summed from the
    # per-bucket distinct-key counts of the same stats job (keys never
    # span buckets, so the per-bucket distincts sum exactly).
    m.upserts = result.upserts
    m.deletes = result.deletes
    m.deduped_keys = sum(
        int(r["distinct_keys"]) for r in stats if "distinct_keys" in r
    )
    if result.applied:
        m.lineage = {str(int(r["_bucket"])): int(r["max_seq"]) for r in stats}
    m.affected_buckets = len(result.affected_buckets)
    m.seconds = time.monotonic() - t0
    if m.seconds > 0:
        m.records_per_sec = m.total_records / m.seconds

    # Error limits are enforced AFTER quarantine capture (the reference
    # checks post-schedule too, JobContainer.java:962-966) so the dirty
    # sample is inspectable even when the job aborts.
    cfg.error_limit.check(m.dirty_records, max(m.total_records, 1))

    if cfg.metrics_path:
        with open(cfg.metrics_path, "a") as f:
            f.write(m.to_json() + "\n")
    if m.applied:
        for hook in cfg.on_commit:
            hook(m)
        if cfg.auto_compact:
            if props.get("table_mode") == "mor":
                from datax_spark.lake.mor import MorTable

                mor = table if isinstance(table, MorTable) else MorTable(
                    table.spark, table.path, branch=table.branch
                )
                mor.maybe_compact(**cfg.compact_options)
            else:
                table.compact(
                    max_files_per_bucket=cfg.compact_options.get(
                        "max_files_per_bucket", 8
                    )
                )
    return m


def parse_envelope(
    raw: DataFrame, envelope: str, payload_schema, table_col: str | None = None
) -> DataFrame:
    """Dispatch a raw ``value``-column frame through one of the CDC
    envelope parsers (sources/envelope.py) -> canonical changelog.
    ``table_col`` keeps the envelope's source-table name (fat-topic
    deployments routing several tables through one stream)."""
    from datax_spark.sources import envelope as env_mod

    parsers = {
        "debezium": env_mod.from_debezium,
        "canal": env_mod.from_canal,
        "maxwell": env_mod.from_maxwell,
    }
    if envelope not in parsers:
        raise ValueError(f"unknown envelope {envelope!r}; one of {sorted(parsers)}")
    return parsers[envelope](raw, payload_schema, table_col=table_col)


def default_payload_schema(table: LakeTable):
    """The table's payload columns (snapshot schema minus '_'-prefixed
    meta like _seq/_op/_patch/_valid_*) — what an envelope parser should
    produce. Shared by the envelope modes of apply_segments and
    operators/scd2.apply_segments_scd2."""
    from pyspark.sql.types import StructType

    return StructType(
        [f for f in table.snapshot().schema.fields if not f.name.startswith("_")]
    )


def iter_pending_segments(
    table: LakeTable,
    log_dir: str,
    stream_id: str = "default",
    start_after_batch: int | None = None,
):
    """Yield ``(seg_id, seg_path)`` for log segments past the stream
    fence, in seq order — the shared resume logic of the batch drivers
    (apply_segments here, apply_segments_scd2 in operators/scd2.py)."""
    segs = sorted(
        (int(d.split("=", 1)[1]), os.path.join(log_dir, d))
        for d in os.listdir(log_dir)
        if d.startswith("seg=")
    )
    resume_from = (
        table.last_batch_id(stream_id)
        if start_after_batch is None
        else start_after_batch
    )
    for seg_id, seg_path in segs:
        if resume_from is not None and seg_id <= resume_from:
            continue
        yield seg_id, seg_path


def apply_segments(
    spark: SparkSession,
    table: LakeTable,
    log_dir: str,
    config: PipelineConfig | None = None,
    start_after_batch: int | None = None,
    envelope: str | None = None,
    payload_schema=None,
) -> list[BatchMetrics]:
    """Deterministic batch driver: one micro-batch per log segment dir.

    The batch-mode twin of ``tail_and_apply`` (DataX's time-range bounded
    tail, RecordProcessor.java:206-229). ``start_after_batch`` resumes
    mid-log; combined with the merge fence, re-running from 0 is also
    safe, just slower.

    ``envelope``: treat segments as JSON-LINES binlog tails instead of
    parquet — 'debezium' | 'canal' | 'maxwell', parsed per segment via
    sources/envelope.py against ``payload_schema`` (defaults to the
    table's payload columns). The production front door for "binlog
    dump dir -> lake" with no pre-conversion step.
    """
    cfg = config or PipelineConfig()
    limiter = (
        RateLimiter(cfg.max_events_per_sec) if cfg.max_events_per_sec else None
    )
    byte_limiter = (
        RateLimiter(cfg.max_bytes_per_sec) if cfg.max_bytes_per_sec else None
    )
    if envelope is not None and payload_schema is None:
        payload_schema = default_payload_schema(table)
    out = []
    for seg_id, seg_path in iter_pending_segments(
        table, log_dir, cfg.stream_id, start_after_batch
    ):
        if envelope is not None:
            events = parse_envelope(
                spark.read.text(seg_path), envelope, payload_schema
            )
        else:
            events = spark.read.parquet(seg_path)
        m = apply_batch(table, events, batch_id=seg_id, config=cfg)
        out.append(m)
        if limiter is not None:
            limiter.admit(m.total_records)
        if byte_limiter is not None:
            byte_limiter.admit(m.bytes_estimate)
    return out


def tail_and_apply(
    spark: SparkSession,
    table_path: str,
    log_dir: str,
    checkpoint_dir: str,
    schema,
    config: PipelineConfig | None = None,
    max_files_per_trigger: int = 1,
    timeout_sec: float = 120.0,
    max_bytes_per_trigger: int | None = None,
    dedup_within: str | None = None,
    dedup_id_cols: list[str] | None = None,
    sink=None,
    envelope: str | None = None,
    envelope_table_col: str | None = None,
    start_from: str = "log",
    record_position: bool = True,
):
    """Structured Streaming tail of the change log -> fenced MERGE apply.

    File source with ``maxFilesPerTrigger`` (tps half) and optional
    ``maxBytesPerTrigger`` (bps half) gives bounded, ordered micro-batches
    — the Channel throttle analog
    (core/.../transport/channel/Channel.java:176-239); the checkpoint dir
    persists batch offsets for resume. Spark treats maxBytesPerTrigger as
    a soft cap (at least one file per batch).

    ``envelope``: tail JSON-LINES binlog dumps ('debezium' | 'canal' |
    'maxwell') instead of parquet — the stream reads raw text and the
    envelope parser runs inside each micro-batch's scan stage;
    ``schema`` is then the PAYLOAD schema, not the file schema. The
    parsed changelog carries no event-time column, so ``dedup_within``
    (which watermarks on ``ts``) is rejected in envelope mode.

    ``dedup_within`` (e.g. ``"10 minutes"``): suppress AT-LEAST-ONCE
    source redeliveries with ``dropDuplicatesWithinWatermark`` over
    ``dedup_id_cols`` (default: key cols + seq — the event's identity)
    before the apply. This matters because the merge is unconditional
    under the seq replay-order contract: a redelivered STALE image in a
    later micro-batch would overwrite newer state (the hazard is pinned
    both ways in tests/test_source_dedup.py). State is bounded by the
    watermark horizon on ``ts`` and lives in the checkpoint, so resume
    keeps the dedup exact across restarts; an event older than the
    watermark is dropped as late — also the safe outcome, its key has
    already advanced past it.

    ``record_position`` (default on): each applied batch's log position
    claim (``{"max_seg", "seen"}``, see ``streaming/resume.py``) rides
    the stream's fence entry in the same atomic commit — zero extra
    Spark actions (the file list comes from the checkpoint's own source
    log). ``start_from='table'`` then survives a LOST checkpoint: it
    resolves the table's strongest claim against a live segment listing
    and tails only the segments beyond the last fully-applied one, under
    a version-derived stream id (a fresh checkpoint restarts batch ids
    at 0; the old fence would swallow them). Returns None when the table
    is already caught up with the log. Only the default sink records —
    a custom ``sink`` owns its own commits.
    """
    cfg = config or PipelineConfig()
    path_glob = log_dir + "/seg=*"
    if start_from == "table":
        from dataclasses import replace as _dc_replace

        from datax_spark.streaming.resume import (
            best_claim,
            completed_segment,
            remaining_segments_glob,
        )

        t = LakeTable(spark, table_path)
        done = completed_segment(log_dir, best_claim(t))
        path_glob = remaining_segments_glob(log_dir, done)
        if path_glob is None:
            return None
        cfg = _dc_replace(
            cfg, stream_id=f"{cfg.stream_id}@v{t.current_version()}"
        )
    elif start_from != "log":
        raise ValueError(
            f"start_from {start_from!r}: 'log' (whole glob, checkpoint "
            "decides) or 'table' (resume from the table's recorded "
            "position)"
        )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        table = LakeTable(batch_df.sparkSession, table_path)
        extras = None
        if record_position:
            from datax_spark.streaming.resume import (
                advance_claim,
                changelog_batch_files,
                stream_claim,
            )

            files = changelog_batch_files(checkpoint_dir, batch_id)
            if files:
                pos = advance_claim(
                    stream_claim(table, cfg.stream_id), files
                )
                if pos is not None:
                    extras = {"changelog_pos": pos}
        apply_batch(table, batch_df, batch_id, cfg, stream_extras=extras)

    if sink is None:
        sink = _sink

    if envelope is not None and dedup_within is not None:
        raise ValueError(
            "dedup_within watermarks on the log's ts column, which the "
            "parsed envelope changelog does not carry"
        )
    reader = spark.readStream if envelope is not None else spark.readStream.schema(schema)
    if max_bytes_per_trigger is not None:
        reader = reader.option("maxBytesPerTrigger", int(max_bytes_per_trigger))
    else:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    reader = reader.option("latestFirst", "false")
    if envelope is not None:
        stream = parse_envelope(
            reader.text(path_glob), envelope, schema,
            table_col=envelope_table_col,
        )
    else:
        stream = reader.parquet(path_glob)
    if dedup_within is not None:
        ids = list(dedup_id_cols or (*KEY_COLS, "seq"))
        stream = stream.withWatermark("ts", dedup_within).dropDuplicatesWithinWatermark(ids)
    query = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_sec)
    if query.isActive:
        query.stop()
    return query
