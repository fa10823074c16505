"""Copy-on-write MERGE of deduplicated change events into a LakeTable.

Semantics (the Iceberg ``MERGE INTO`` we would write if the jar shipped,
and the analog of DataX writeMode replace/update,
plugin-rdbms-util/.../writer/WriterUtil.java:114-199):

    WHEN MATCHED AND final_op = 'delete' THEN DELETE
    WHEN MATCHED                         THEN UPDATE *   (latest image wins)
    WHEN NOT MATCHED AND op != 'delete'  THEN INSERT *   (update == upsert)
    delete of a non-existent key                          (no-op)

Physical plan, sized for 100 TB:

1. changes are already one-row-per-key (operators/dedup.py);
2. affected buckets = distinct bucket ids in the batch — O(num_buckets)
   driver-side, never O(rows);
3. ONLY those buckets' files are read back; every other bucket carries
   forward by manifest reference (copy-on-write at bucket granularity);
4. survivors = existing LEFT ANTI JOIN change-keys  ∪  non-delete change
   images. The change-key side of a CDC batch is small relative to the
   table, so it is broadcast (DataX has no joins; this one exists only to
   subtract matched keys) — no shuffle of the 100 TB side;
5. one partitionBy(bucket) write + one manifest CAS publish.

Exactly-once: the commit records ``last_batch_id`` per stream in snapshot
properties; a replayed batch id returns without writing (fencing — the
odpswriter failover-state analog, odpswriter/.../OdpsWriter.java:327-354).
Retries are safe because data files are immutable and manifest publish is
a compare-and-set.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.lake.table import (
    BUCKET_COL,
    WIDENS_TO as _WIDENS_TO,
    LakeTable,
    SchemaEvolutionError,
    bucket_expr,
    snap_bucket_dtype,
)

OP_COL = "op"
DELETE_OP = "delete"
# Change-log bookkeeping columns that never enter the target table.
# change-marker names, built from the table-side reserved set so the
# rename_column guard and this conform/evolve skip-list cannot drift
CDC_META_COLS = set(LakeTable.CDC_RESERVED_NAMES) | {OP_COL, BUCKET_COL}


@dataclass
class MergeResult:
    version: int | None  # None => fenced no-op
    applied: bool
    affected_buckets: list[int]
    upserts: int = 0
    deletes: int = 0


def bucket_stats_agg(
    df: DataFrame,
    bucket_key: str,
    num_buckets: int,
    key_cols: list[str] | None = None,
    dtype=None,
) -> list:
    """Per-bucket (max_seq, deletes, events[, distinct_keys]) stats job.

    Scans only (keys, seq, op): parquet column pruning makes this a
    narrow pass even when content columns are KB-sized, so the stats job
    costs a small fraction of the write job at any scale. With
    ``key_cols`` given, also counts distinct keys per bucket — since the
    bucket is derived from a key column, per-bucket distincts sum to the
    global distinct-key count (the post-dedup cardinality) without a
    second job.
    """
    extra = (
        [F.count_distinct(*[F.col(k) for k in key_cols]).alias("distinct_keys")]
        if key_cols
        else []
    )
    sel_keys = [F.col(k) for k in (key_cols or [])]
    return (
        df.select(
            bucket_expr(bucket_key, num_buckets, dtype).alias(BUCKET_COL),
            F.col("seq"),
            F.col(OP_COL),
            *sel_keys,
        )
        .groupBy(BUCKET_COL)
        .agg(
            F.max("seq").alias("max_seq"),
            F.sum(F.when(F.col(OP_COL) == DELETE_OP, 1).otherwise(0)).alias(
                "deletes"
            ),
            F.count(F.lit(1)).alias("events"),
            *extra,
        )
        .collect()
    )


def merge_apply(
    table: LakeTable,
    deduped_changes: DataFrame,
    batch_id: int,
    stream_id: str = "default",
    broadcast_keys: bool | None = None,
    bucket_stats: list | None = None,
    patch: bool = False,
    stream_extras: dict | None = None,
) -> MergeResult:
    """Apply one deduplicated change batch to ``table`` exactly once.

    ``bucket_stats``: precomputed ``bucket_stats_agg`` rows (normally over
    the *pre-dedup* clean events — one cheap column-pruned job). When
    omitted, the stats run over ``deduped_changes`` behind a persist so
    the dedup shuffle isn't paid twice across jobs. With stats supplied
    there is no persist at all: the write job references the dedup
    subtree twice (anti-join keys + upsert images) and Spark's
    ReuseExchange evaluates the shuffle once.

    ``patch=False`` (default) is whole-row replace — DataX
    writeMode=replace / ots PutRow. ``patch=True`` is partial-column
    upsert — writeMode=update / ots UpdateRow
    (otswriter/.../model/OTSConst.java:17-18): a matched row keeps its
    old value wherever the incoming image is NULL
    (``coalesce(new, old)`` per payload column); unmatched inserts take
    the image as-is.

    ``stream_extras``: extra keys recorded INSIDE this stream's fence
    entry (``streams.<sid>``) in the same atomic commit — e.g. the
    source's consumed-offsets map, the Delta ``txn`` idempotent-writer
    pattern. Each apply replaces the whole entry, so a tail that records
    extras must record them every batch.

    Physical cost of ``patch``: one extra join whose shuffle moves
    only MATCHED existing rows (bounded by batch size, never bucket
    size — the big side arrives via broadcast-semi-join, no exchange).
    Patch granularity is the micro-batch: the batch's LATEST image per
    key is what patches the table (dedup runs first, like every mode).
    """
    base_version = table.current_version()
    snap = table.snapshot(base_version)
    props = snap.properties
    key_cols: list[str] = props["key_cols"]
    bucket_key: str = props["bucket_key"]
    num_buckets: int = props["num_buckets"]

    last = (props.get("streams", {}).get(stream_id) or {}).get("last_batch_id")
    if last is not None and batch_id <= last:
        return MergeResult(version=None, applied=False, affected_buckets=[])

    hash_dtype = snap_bucket_dtype(snap)
    changes = deduped_changes.withColumn(
        BUCKET_COL, bucket_expr(bucket_key, num_buckets, hash_dtype)
    )
    own_persist = bucket_stats is None
    if own_persist:
        changes = changes.persist()
    try:
        stats_rows = (
            bucket_stats
            if bucket_stats is not None
            else bucket_stats_agg(
                deduped_changes, bucket_key, num_buckets, dtype=hash_dtype
            )
        )
        if not stats_rows:
            # Empty batch still advances the fence so replays stay no-ops.
            new_snap = table.commit_replace_buckets(
                base_version,
                commit_rel="",
                replaced_buckets=[],
                stream_updates={
                    stream_id: {
                        "last_batch_id": batch_id, **(stream_extras or {})
                    }
                },
            )
            return MergeResult(version=new_snap.version, applied=True, affected_buckets=[])

        affected = sorted(int(r[BUCKET_COL]) for r in stats_rows)
        deletes = sum(r["deletes"] for r in stats_rows)
        events = sum(r["events"] for r in stats_rows)

        existing = table.read(buckets=affected, version=base_version)

        change_keys = changes.select(*key_cols)
        if broadcast_keys is None:
            # Auto: broadcast only genuinely small key sets. Driver-side
            # broadcast build of a huge batch serializes and *loses* time
            # at high parallelism; past the threshold AQE picks the join.
            broadcast_keys = events <= 100_000
        if broadcast_keys:
            change_keys = F.broadcast(change_keys)

        survivors = existing.join(change_keys, on=key_cols, how="left_anti")
        # Additive schema evolution: payload columns in the batch that the
        # table lacks widen the schema; old rows read as null on the next
        # read-with-schema. CDC bookkeeping columns never evolve in.
        merged_schema = _evolve_schema(snap.schema, changes.schema, props)
        upsert_images = changes.filter(F.col(OP_COL) != DELETE_OP)
        if patch:
            # UpdateRow semantics: matched rows keep old values where the
            # incoming image is null. The old-image side is a broadcast
            # SEMI join (no exchange of the table); the patch join then
            # shuffles only those matched rows + the batch.
            payload = [
                f.name for f in merged_schema.fields if f.name not in key_cols
            ]
            have_old = set(existing.columns)
            old = existing.join(change_keys, on=key_cols, how="left_semi").select(
                *key_cols,
                *[
                    F.col(c).alias("_old_" + c)
                    for c in payload
                    if c in have_old
                ],
            )
            joined = upsert_images.join(old, on=key_cols, how="left")
            have_new = set(upsert_images.columns)
            have_olds = set(old.columns)
            cols = [F.col(k) for k in key_cols]
            for c in payload:
                new_c = F.col(c) if c in have_new else F.lit(None)
                old_c = (
                    F.col("_old_" + c) if ("_old_" + c) in have_olds else F.lit(None)
                )
                cols.append(F.coalesce(new_c, old_c).alias(c))
            upsert_images = joined.select(*cols)
        survivors = _conform(survivors, merged_schema)
        upsert_images = _conform(upsert_images, merged_schema)
        merged = survivors.unionByName(upsert_images)

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
            stream_updates={
                stream_id: {"last_batch_id": batch_id, **(stream_extras or {})}
            },
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
        if own_persist:
            changes.unpersist()


def _evolve_schema(table_schema, batch_schema, props=None):
    """Table schema + new batch columns (additive) + numeric widening.

    A batch column whose type is WIDER than the table's (int->long,
    float->double) evolves the table column to the wide type — old files
    read up-cast, nothing rewrites. A NARROWER batch column keeps the
    table type (the batch casts up on write). Any other type change
    raises: silently casting e.g. string->long would corrupt data, the
    caller must transform first (dx_* / pandas cast with quarantine).

    ``props`` (the table's snapshot properties, when the caller has
    them): on v1 bucket-hash layouts, widening the BUCKET KEY is refused
    — xxhash64(int x) != xxhash64(long x), so the widened batch would
    hash keys into different buckets than their existing rows live in
    (duplicate keys survive, pruning looks in the wrong bucket —
    ADVICE r3). v2 layouts canonicalize the hash input
    (lake.table.bucket_expr) and widen freely.
    """
    from pyspark.sql.types import StructField, StructType

    batch_by_name = {f.name: f for f in batch_schema.fields}
    existing = {f.name for f in table_schema.fields}
    fields = []
    for f in table_schema.fields:
        b = batch_by_name.get(f.name)
        if b is None or b.dataType == f.dataType:
            fields.append(f)
            continue
        t_name, b_name = f.dataType.typeName(), b.dataType.typeName()
        if b_name in _WIDENS_TO.get(t_name, ()):
            if (
                props is not None
                and f.name == props.get("bucket_key")
                and int(props.get("bucket_hash_version", 1)) < 2
            ):
                raise SchemaEvolutionError(
                    f"column {f.name!r} is the bucket key of a v1-hash "
                    f"layout: widening {t_name}->{b_name} would re-bucket "
                    "existing rows (xxhash64 hashes int and long "
                    "differently). Cast the batch to the table type, or "
                    "recreate the table (bucket_hash_version 2 "
                    "canonicalizes the hash input and widens safely)"
                )
            fields.append(StructField(f.name, b.dataType, True))
        elif t_name in _WIDENS_TO.get(b_name, ()):
            fields.append(f)  # batch is narrower: casts up at write
        else:
            raise SchemaEvolutionError(
                f"column {f.name!r}: table {t_name} vs batch {b_name} — "
                "not a widening; transform the batch first"
            )
    retired = set((props or {}).get("retired_cols", []))
    for f in batch_schema.fields:
        if f.name not in existing and f.name not in CDC_META_COLS:
            if f.name in retired:
                raise SchemaEvolutionError(
                    f"column {f.name!r} is a RETIRED physical name on this "
                    "table (renamed or dropped): old data files still "
                    "carry values under it, so re-adding it would "
                    "resurrect them on read. Pick a fresh name"
                )
            fields.append(f)
    return StructType(fields)


def _conform(df: DataFrame, schema) -> DataFrame:
    """Project ``df`` to ``schema`` order, nulling absent columns."""
    cols = []
    have = set(df.columns)
    for f in schema.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
