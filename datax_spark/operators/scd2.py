"""SCD type-2 history apply: change events -> interval-versioned table.

DataX moves each change event once; downstream warehouses commonly land
those events as a slowly-changing-dimension type-2 history (the writeMode
"update" family's audit-table cousin — every image is kept, versioned by
an inclusive-start / exclusive-end validity interval instead of being
overwritten). This operator maintains that history INCREMENTALLY on a
LakeTable:

    row = (natural key, payload, _valid_from, _valid_to)
    _valid_to IS NULL  <=>  the key's current image
    delete events close the open interval and open nothing

Physical plan, sized for 100 TB:

1. within-batch intervals come from one lead() window partitioned by the
   natural key — a batch-bounded shuffle, never table-bounded;
2. the only table-side mutation is closing open intervals for keys seen
   in the batch: per-key first-event seq is a small aggregate joined onto
   the affected buckets via broadcast, so the history table never
   shuffles;
3. affected buckets rewrite copy-on-write exactly like operators/merge.py
   (bucket granularity, manifest CAS, batch-id fence).

Correctness contract (same as the COW merge): batches arrive in seq
order — every seq in batch N exceeds every seq in batch N-1 (the segment
replay-order contract, NOTES.md). Under it, incremental application of
any batch split equals the single from-scratch window over the whole log,
which is exactly what the driver oracle checks.

Reference analog: the event stream DataX tails (otsstreamreader keeps
every version between from/to time,
otsstreamreader/doc/otsstreamreader.md:1-40) persisted losslessly instead
of latest-wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from datax_spark.lake.table import BUCKET_COL, LakeTable, snap_bucket_dtype
from datax_spark.operators.merge import (
    DELETE_OP,
    OP_COL,
    MergeResult,
    _conform,
    _evolve_schema,
    bucket_stats_agg,
    merge_apply,
)

VALID_FROM = "_valid_from"
VALID_TO = "_valid_to"


CHASH = "_chash"
PAYLOAD_DIR = "_payload"


def create_scd2_table(
    spark: SparkSession,
    path: str,
    row_schema: StructType,
    natural_key: list[str],
    bucket_key: str,
    num_buckets: int = 16,
    dedup_payload_cols: list[str] | None = None,
    **kwargs,
) -> LakeTable:
    """Create a lake table laid out for SCD2 history.

    ``row_schema``: the natural key + payload columns (no meta — the
    validity interval columns are appended here). Row identity is
    (natural key, _valid_from) — a key holds one row per image it ever
    had. Bucketing stays on the natural key so every version of a key
    co-locates in one bucket (closing intervals touches only the batch's
    buckets).

    ``dedup_payload_cols``: store these columns CONTENT-ADDRESSED — the
    history row keeps only a sha256 ``_chash`` and each distinct payload
    is stored ONCE in a side lake table under ``<path>/_payload`` keyed
    by the hash (git's object-store move; vendored/boilerplate files
    dedupe corpus-wide, across keys and buckets).
    ``scd2_read_resolved`` re-materializes rows;
    ``scd2_current``/``scd2_as_of`` resolve transparently.

    WHEN IT PAYS (measured, /tmp drive recorded in NOTES.md): parquet's
    own dictionary encoding already dedupes repeated values WITHIN a
    column chunk, and the CoW rewrite re-collects a key's whole history
    into one bucket file — so for small payloads whose distinct volume
    per file fits the ~1 MB dictionary page, plain storage is already
    near-deduped and this feature is a wash (measured 0.9x on 2 KB
    blobs). The win is the beyond-dictionary regime — real source files:
    multi-KB..MB payloads whose per-file distinct volume dwarfs the
    dictionary page, where parquet falls back to plain encoding and
    stores every repeat (measured 3.4x smaller on 64 KB blobs shared
    ~3x across keys; the gap widens with payload size × reuse).
    """
    missing = [k for k in natural_key if k not in {f.name for f in row_schema.fields}]
    if missing:
        raise ValueError(f"row_schema must include natural key cols {missing}")
    if bucket_key not in natural_key:
        # Correctness, not layout preference: scd2_apply derives affected
        # buckets from the BATCH's bucket_key values; if the key's open
        # interval could live in a different bucket (payload-derived
        # bucketing), it would never be closed.
        raise ValueError(
            f"bucket_key {bucket_key!r} must be one of the natural key "
            f"columns {natural_key} — every version of a key must hash "
            "to one bucket"
        )
    dedup_payload_cols = list(dedup_payload_cols or [])
    by_name = {f.name: f for f in row_schema.fields}
    bad = [c for c in dedup_payload_cols if c not in by_name or c in natural_key]
    if bad:
        raise ValueError(
            f"dedup_payload_cols must be non-key payload columns, got {bad}"
        )
    from pyspark.sql.types import StringType

    fields = [f for f in row_schema.fields if f.name not in dedup_payload_cols]
    if dedup_payload_cols:
        fields.append(StructField(CHASH, StringType(), True))
    fields += [
        StructField(VALID_FROM, LongType(), False),
        StructField(VALID_TO, LongType(), True),
    ]
    table = LakeTable.create(
        spark,
        path,
        StructType(fields),
        key_cols=[*natural_key, VALID_FROM],
        bucket_key=bucket_key,
        num_buckets=num_buckets,
        extra_properties={
            "scd2": True,
            "natural_key": list(natural_key),
            "scd2_payload_cols": dedup_payload_cols,
        },
        **kwargs,
    )
    if dedup_payload_cols:
        import os

        LakeTable.create(
            spark,
            os.path.join(path, PAYLOAD_DIR),
            StructType(
                [StructField(CHASH, StringType(), False)]
                + [by_name[c] for c in dedup_payload_cols]
            ),
            key_cols=[CHASH],
            bucket_key=CHASH,
            num_buckets=num_buckets,
        )
    return table


def _payload_store(table: LakeTable) -> LakeTable:
    import os

    return LakeTable(table.spark, os.path.join(table.path, PAYLOAD_DIR))


def _chash_expr(payload_cols: list[str]):
    """Deterministic content hash over the payload columns: sha256 of
    the to_json struct encoding (null fields are dropped by to_json, so
    NULL vs empty-string images hash differently — lossless)."""
    return F.sha2(F.to_json(F.struct(*[F.col(c) for c in payload_cols])), 256)


def scd2_apply(
    table: LakeTable,
    clean_changes: DataFrame,
    batch_id: int,
    stream_id: str = "default",
    broadcast_keys: bool | None = None,
    persist: bool = True,
) -> MergeResult:
    """Apply one clean change batch to an SCD2 history table exactly once.

    ``clean_changes``: quarantine-filtered events with the natural key
    columns, payload columns, ``op`` and ``seq``. Unlike the latest-wins
    merge, the batch is NOT deduplicated first — every event becomes (or
    closes) a history interval, so intermediate images inside one batch
    are preserved.

    ``persist=False`` skips caching the batch between the stats pass and
    the write: the stats job then runs COLUMN-PRUNED straight off the
    source scan (keys/seq/op only — it never reads the payload), and the
    write job recomputes the batch from source. Measured 1.5x on the
    sf0.1 bench (461k vs 314k ev/s): materializing the WIDE batch to
    cache costs more than the second narrow scan saves. Safe ONLY for
    deterministic re-reads (parquet/file segments — what the segment and
    streaming drivers feed); a non-deterministic source could disagree
    between the two passes and write rows into buckets the commit does
    not replace. Default stays the safe persist.
    """
    base_version = table.current_version()
    snap = table.snapshot(base_version)
    props = snap.properties
    if not props.get("scd2"):
        raise ValueError("scd2_apply requires a table from create_scd2_table")
    natural_key: list[str] = props["natural_key"]
    bucket_key: str = props["bucket_key"]
    num_buckets: int = props["num_buckets"]

    last = (props.get("streams", {}).get(stream_id) or {}).get("last_batch_id")
    if last is not None and batch_id <= last:
        return MergeResult(version=None, applied=False, affected_buckets=[])

    persisted = clean_changes.persist() if persist else None
    changes = persisted if persist else clean_changes
    try:
        stats_rows = bucket_stats_agg(
            changes, bucket_key, num_buckets, dtype=snap_bucket_dtype(snap)
        )
        if not stats_rows:
            new_snap = table.commit_replace_buckets(
                base_version,
                commit_rel="",
                replaced_buckets=[],
                stream_updates={stream_id: {"last_batch_id": batch_id}},
            )
            return MergeResult(
                version=new_snap.version, applied=True, affected_buckets=[]
            )

        affected = sorted(int(r[BUCKET_COL]) for r in stats_rows)
        deletes = sum(r["deletes"] for r in stats_rows)
        events = sum(r["events"] for r in stats_rows)

        # Content-addressed payload: upsert distinct payloads into the
        # side store FIRST (an unreferenced payload is harmless, a
        # dangling hash is not — and both commits are batch-id fenced, so
        # a crash between them replays as store-no-op + history-apply).
        payload_cols: list[str] = props.get("scd2_payload_cols") or []
        if payload_cols:
            changes = changes.withColumn(CHASH, _chash_expr(payload_cols))
            store_rows = (
                changes.filter(F.col(OP_COL) != DELETE_OP)
                .select(CHASH, *payload_cols)
                .distinct()
                .withColumn(OP_COL, F.lit("insert"))
                .withColumn("seq", F.lit(batch_id).cast("long"))
            )
            merge_apply(
                _payload_store(table), store_rows, batch_id,
                stream_id=f"scd2_payload:{stream_id}",
            )
            changes = changes.drop(*payload_cols)

        # Within-batch intervals: each event's validity ends where the
        # key's next event (of ANY op) begins. Batch-bounded shuffle.
        w = Window.partitionBy(*natural_key).orderBy("seq")
        new_rows = (
            changes.withColumn(VALID_TO, F.lead("seq").over(w))
            .filter(F.col(OP_COL) != DELETE_OP)
            .withColumnRenamed("seq", VALID_FROM)
            .drop(OP_COL)
        )

        # Close the table's open interval for every key the batch touches
        # at the key's FIRST event seq in the batch.
        first_seq = changes.groupBy(*natural_key).agg(
            F.min("seq").alias("_first_seq")
        )
        if broadcast_keys is None:
            broadcast_keys = events <= 100_000
        if broadcast_keys:
            first_seq = F.broadcast(first_seq)

        existing = table.read(buckets=affected, version=base_version)
        closed = existing.join(first_seq, on=natural_key, how="left").withColumn(
            VALID_TO,
            F.when(
                F.col(VALID_TO).isNull() & F.col("_first_seq").isNotNull(),
                F.col("_first_seq"),
            ).otherwise(F.col(VALID_TO)),
        ).drop("_first_seq")

        merged_schema = _evolve_schema(snap.schema, new_rows.schema, props)
        merged = _conform(closed, merged_schema).unionByName(
            _conform(new_rows, merged_schema)
        )

        commit_rel = table.write_bucket_data(merged, num_buckets, bucket_key)
        lineage = {
            str(int(r[BUCKET_COL])): {
                "max_seq": int(r["max_seq"]),
                "batch_id": batch_id,
            }
            for r in stats_rows
        }
        new_snap = table.commit_replace_buckets(
            base_version,
            commit_rel,
            replaced_buckets=affected,
            schema=merged_schema,
            stream_updates={stream_id: {"last_batch_id": batch_id}},
            lineage_updates=lineage,
        )
        return MergeResult(
            version=new_snap.version,
            applied=True,
            affected_buckets=affected,
            upserts=events - deletes,
            deletes=deletes,
        )
    finally:
        if persisted is not None:
            persisted.unpersist()


def apply_segments_scd2(
    spark: SparkSession,
    table: LakeTable,
    log_dir: str,
    quarantine_dir: str | None = None,
    start_after_batch: int | None = None,
    envelope: str | None = None,
    payload_schema=None,
    ddl: bool = False,
) -> list[MergeResult]:
    """Segment-loop driver for SCD2 tables — the history-mode twin of
    streaming.pipeline.apply_segments (incl. ``envelope``: JSON-lines
    binlog dump segments parsed via sources/envelope.py, giving a full
    audit history straight off a Debezium/Canal/Maxwell dump): per
    segment, quarantine-split the
    raw events (same dirty taxonomy incl. the table's CHECK constraints),
    then ``scd2_apply`` the clean slice. Resume rides the same per-stream
    fence.

    ``ddl=True`` (maxwell only, like streaming/ddl.py): consume
    table-alter/create messages into additive history-table evolution
    before each segment's apply — closed intervals from before the alter
    read NULL in the new column, exactly the audit-faithful answer
    ("this column did not exist when that version was current"), and the
    parse schema tracks the table so ``payload_schema`` must be left
    None."""
    import os

    from datax_spark.streaming.pipeline import (
        default_payload_schema,
        iter_pending_segments,
        parse_envelope,
    )

    if ddl:
        from datax_spark.sources.envelope import MAXWELL_CONTROL_TYPES
        from datax_spark.streaming.ddl import ddl_new_fields

        if envelope != "maxwell":
            raise ValueError("ddl=True requires envelope='maxwell'")
        if payload_schema is not None:
            raise ValueError(
                "ddl=True derives the parse schema from the evolving "
                "table; drop payload_schema"
            )
    elif envelope is not None and payload_schema is None:
        payload_schema = default_payload_schema(table)
    out = []
    for seg_id, seg_path in iter_pending_segments(
        table, log_dir, "default", start_after_batch
    ):
        if ddl:
            raw = spark.read.text(seg_path)
            fields = ddl_new_fields(table, raw, envelope)
            if fields:
                table.add_columns(fields)
            events = parse_envelope(
                raw, envelope, default_payload_schema(table)
            ).filter(~F.col("op").isin(*MAXWELL_CONTROL_TYPES))
        elif envelope is not None:
            events = parse_envelope(
                spark.read.text(seg_path), envelope, payload_schema
            )
        else:
            events = spark.read.parquet(seg_path)
        out.append(
            _scd2_apply_quarantined(table, events, seg_id, quarantine_dir)
        )
    return out


def _scd2_apply_quarantined(
    table: LakeTable,
    events: DataFrame,
    batch_id: int,
    quarantine_dir: str | None,
) -> MergeResult:
    """Fence FIRST, then quarantine-split + interval apply.

    The fence check precedes the quarantine side-output so a replayed
    batch (checkpoint recovery, forced re-run from 0) is a COMPLETE
    no-op — exactly-once includes the side channels, the same contract
    as streaming.pipeline.apply_batch."""
    from datax_spark.quality.quarantine import append_quarantine, split_dirty

    last = table.last_batch_id("default")
    if last is not None and batch_id <= last:
        return MergeResult(version=None, applied=False, affected_buckets=[])
    props = table.snapshot().properties
    clean, dirty = split_dirty(
        events,
        key_cols=props["natural_key"],
        # Generic payload schemas (Debezium/Canal/Maxwell envelopes over
        # arbitrary tables) have no 'content' column — skip the
        # null_content rule rather than fail on an unresolved column
        # (ADVICE r3); named CHECK constraints still apply.
        content_col="content" if "content" in events.columns else None,
        constraints=props.get("constraints") or {},
    )
    if quarantine_dir:
        append_quarantine(dirty, quarantine_dir, batch_id)
    # file-backed segments re-read deterministically: skip the wide
    # batch cache, let the stats pass run column-pruned (1.5x, see
    # scd2_apply persist=False)
    return scd2_apply(
        table, clean.drop("ts", "batch_file"), batch_id, persist=False
    )


def tail_and_apply_scd2(
    spark: SparkSession,
    table_path: str,
    log_dir: str,
    checkpoint_dir: str,
    schema,
    quarantine_dir: str | None = None,
    max_files_per_trigger: int = 1,
    timeout_sec: float = 120.0,
    dedup_within: str | None = None,
    envelope: str | None = None,
):
    """Structured Streaming tail -> SCD2 history apply (the streaming
    twin of apply_segments_scd2): same file-source micro-batching,
    checkpoint resume, and optional redelivery dedup as
    streaming.pipeline.tail_and_apply — the per-batch sink
    quarantine-splits (incl. table constraints) and interval-applies.
    Exactly-once rides the same batch-id fence, so checkpoint replays of
    a committed batch are no-ops."""
    from datax_spark.streaming.pipeline import tail_and_apply

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        table = LakeTable(batch_df.sparkSession, table_path)
        _scd2_apply_quarantined(table, batch_df, batch_id, quarantine_dir)

    return tail_and_apply(
        spark,
        table_path,
        log_dir,
        checkpoint_dir,
        schema,
        max_files_per_trigger=max_files_per_trigger,
        timeout_sec=timeout_sec,
        dedup_within=dedup_within,
        sink=_sink,
        envelope=envelope,
    )


def scd2_read_resolved(table: LakeTable, version: int | None = None) -> DataFrame:
    """The history with content-addressed payload columns re-materialized
    (a LEFT join to the side store on ``_chash``; plain ``table.read()``
    for tables without payload dedup). The store side carries one row
    per DISTINCT payload, so the join's build side is bounded by unique
    contents, not by history length."""
    df = table.read(version=version)
    payload_cols = table.snapshot(version).properties.get("scd2_payload_cols") or []
    if not payload_cols:
        return df
    store = _payload_store(table).read().select(CHASH, *payload_cols)
    hist_cols = [c for c in df.columns if c != CHASH]
    # order: natural key + payload (restored) + meta, like the plain form
    meta = [VALID_FROM, VALID_TO]
    front = [c for c in hist_cols if c not in meta]
    return df.join(store, on=CHASH, how="left").select(*front, *payload_cols, *meta)


def scd2_current(table: LakeTable, version: int | None = None) -> DataFrame:
    """The current image per key (open intervals only) — equals the
    latest-wins merge state of the same log."""
    return (
        scd2_read_resolved(table, version)
        .filter(F.col(VALID_TO).isNull())
        .drop(VALID_FROM, VALID_TO)
    )


def scd2_as_of(table: LakeTable, seq: int, version: int | None = None) -> DataFrame:
    """The image each key had just after ``seq`` (interval containment:
    _valid_from <= seq < _valid_to). Time travel by EVENT order, not by
    commit — finer-grained than snapshot versions."""
    df = scd2_read_resolved(table, version)
    return df.filter(
        (F.col(VALID_FROM) <= F.lit(seq))
        & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > F.lit(seq)))
    ).drop(VALID_FROM, VALID_TO)


def scd2_validate(table: LakeTable, version: int | None = None) -> dict:
    """History-invariant audit (the fsck of SCD2 tables):

    - ``multi_open_keys``: keys with MORE than one open interval;
    - ``bad_intervals``: rows with valid_to <= valid_from;
    - ``overlaps``: per key, an interval starting before the previous
      one ended (ordered by valid_from).

    Two narrow aggregations (intervals carry only keys + two longs);
    ``ok`` iff all three are zero. A healthy table maintained solely
    through scd2_apply can't violate these — the audit exists for
    external writers, partial restores, and bug forensics.
    """
    from pyspark.sql import Window

    nk = table.snapshot(version).properties["natural_key"]
    df = table.read(version=version).select(
        *nk, F.col(VALID_FROM).alias("_vf"), F.col(VALID_TO).alias("_vt")
    )
    w = Window.partitionBy(*nk).orderBy("_vf")
    flagged = df.withColumn("_next_vf", F.lead("_vf").over(w)).select(
        (F.col("_vt") <= F.col("_vf")).cast("long").alias("bad"),
        (
            F.col("_next_vf").isNotNull()
            & (F.col("_vt").isNull() | (F.col("_next_vf") < F.col("_vt")))
        ).cast("long").alias("overlap"),
        *nk,
        F.col("_vt"),
    )
    agg1 = flagged.agg(
        F.sum("bad").alias("bad"), F.sum("overlap").alias("overlap")
    ).first()
    multi_open = (
        df.filter(F.col("_vt").isNull())
        .groupBy(*nk)
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    out = {
        "bad_intervals": int(agg1["bad"] or 0),
        "overlaps": int(agg1["overlap"] or 0),
        "multi_open_keys": int(multi_open),
    }
    out["ok"] = not any(out.values())
    return out
