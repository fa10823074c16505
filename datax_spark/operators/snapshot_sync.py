"""Snapshot-diff change capture — captureless CDC for dump-only sources.

DataX's dominant deployment is the periodic FULL dump: the reader scans
the whole source table and the writer truncates or replaces
(``writeMode`` semantics in CommonRdbmsWriter.java:176-609; the
full-then-incremental job pair every connector doc describes). Most of
its sources have no binlog/WAL to tail, so "incremental" in practice
means diffing dumps. This operator makes that exact workflow
first-class: given a fresh full snapshot of the source, compute the
MINIMAL change-event set (insert / update / delete) against the live
lake table, then feed it through the SAME quarantine -> dedup -> fenced
MERGE path a real binlog uses — any dump-only source becomes an
incremental one, and downstream consumers (change feed, rollups,
posting sync, SCD2) see ordinary change events.

Physical shape (the 100 TB story): ONE full outer join of the resolved
table against the snapshot, hash-partitioned on the key — both sides
shuffle once, nothing else moves. No windows, no per-row Python, and
row equality is a null-safe struct comparison evaluated inside the
join's projection (whole-stage codegen). The apply that follows is the
normal O(changed keys) path — on MOR the unchanged 99% of a typical
daily dump costs nothing beyond this one diff join.

Reference anchors: mysqlreader/doc/mysqlreader.md (WHERE-over-gmt_modified
incremental recipe — which silently misses DELETEs; the diff does not),
otswriter's PutRow overwrite semantics (what a truncate-and-reload
would do; the diff replaces it with minimal ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.lake.table import LakeTable


def _payload_cols(table: LakeTable, key_cols: list[str]) -> list[str]:
    return [
        f.name
        for f in table.snapshot().schema.fields
        if f.name not in key_cols and not f.name.startswith("_")
    ]


def snapshot_diff(
    table: LakeTable,
    snapshot: DataFrame,
    new_seq: int,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Diff a full source snapshot against the table's current state.

    Returns a change-event DataFrame (key cols + payload cols + ``op`` +
    ``seq``) ready for ``apply_batch`` / ``apply_deduped``:

    - key only in ``snapshot``            -> ``insert`` (snapshot payload)
    - key only in the table              -> ``delete`` (null payload)
    - key in both, payload differs       -> ``update`` (snapshot payload)
    - key in both, payload equal         -> no event (the common case)

    Payload equality is NULL-SAFE (a null column equals null — struct
    eqNullSafe), so a dump that legitimately carries nulls never
    generates phantom updates. ``new_seq`` stamps every emitted event:
    per the segment replay-order contract (NOTES.md) it must exceed any
    seq already applied to the table; diff events have distinct keys so
    one shared seq is a valid total order. The snapshot must be
    key-unique — a duplicated key in a "full dump" is corrupt input and
    surfaces as a nondeterministic diff, so callers wanting a guard
    should pre-dedup (dedup_latest_maxby) rather than let it through.
    """
    snap = table.snapshot()
    key_cols = snap.properties.get("key_cols") or ["repo", "path", "commit"]
    pcols = payload_cols or _payload_cols(table, key_cols)

    cur = table.read().select(
        *[F.col(k).alias(k) for k in key_cols],
        *[F.col(c).alias(f"_cur_{c}") for c in pcols],
        F.lit(True).alias("_in_cur"),
    )
    new = snapshot.select(
        *[F.col(k).alias(k) for k in key_cols],
        *[F.col(c).alias(f"_new_{c}") for c in pcols],
        F.lit(True).alias("_in_new"),
    )
    j = cur.join(new, on=key_cols, how="full_outer")
    cur_img = F.struct(*[F.col(f"_cur_{c}").alias(c) for c in pcols])
    new_img = F.struct(*[F.col(f"_new_{c}").alias(c) for c in pcols])
    op = (
        F.when(F.col("_in_cur").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(~cur_img.eqNullSafe(new_img), F.lit("update"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *key_cols,
            *[F.col(f"_new_{c}").alias(c) for c in pcols],
            "op",
            F.lit(new_seq).cast("long").alias("seq"),
        )
    )


def apply_snapshot(
    table: LakeTable,
    snapshot: DataFrame,
    batch_id: int,
    config=None,
    new_seq: int | None = None,
):
    """Sync the table TO a full snapshot through the normal CDC path.

    Diff -> apply_batch under ``batch_id`` (fenced: a replayed dump is a
    committed no-op). After it returns, ``table.read()`` state equals
    the snapshot exactly; a second apply of the same dump computes an
    empty diff. ``new_seq`` defaults to ``batch_id + 1`` scaled above
    the caller's event domain ONLY if provided — there is no safe
    automatic default across arbitrary seq domains, so passing it
    explicitly is recommended for tables fed by a real log.
    """
    from datax_spark.streaming.pipeline import apply_batch

    seq = new_seq if new_seq is not None else batch_id + 1
    events = snapshot_diff(table, snapshot, new_seq=seq)
    return apply_batch(table, events, batch_id, config)
