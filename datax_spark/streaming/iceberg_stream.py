"""Structured Streaming source over the Iceberg mirror's APPEND
snapshots — ``spark.readStream.format("iceberg_appends")``.

The batch half of this loop is ``lake/iceberg.py::read_iceberg_appends``
(rows added between two snapshots); this wraps it as a real streaming
source so a downstream pipeline TAILS the mirror with exactly-once
offsets: the checkpointed offset is simply the last fully-consumed
snapshot id, micro-batches advance snapshot-by-snapshot, and restart
resumes from the checkpoint with no rescan.

Uses the PARTITIONED ``DataSourceStreamReader`` tier (unlike
sources/ots_stream.py's driver-prefetch ``Simple`` tier): the driver
only plans — walk the new snapshots' manifests, one InputPartition per
added data file — and EXECUTORS read the parquet, so a large append
lands as parallel file reads, never a driver materialization. This is
DataX's reader split model (one file = one task,
``UnstructuredStorageReaderUtil`` splitting) applied to a table format.

Append-only by design, like real engines' Iceberg streaming reads: an
``overwrite`` snapshot in range fails the stream (rewritten files are
not deltas); row-level general CDC belongs to the lake change feed /
Delta CDF mirror. Schema comes from the mirror's current metadata plus
a ``_snapshot_id`` lineage column.
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from datax_spark.lake.iceberg import (
    _from_iceberg_type,
    _load_metadata,
)
from datax_spark.sources.avro_codec import read_container


class _FilePartition(InputPartition):
    def __init__(self, path: str, snapshot_id: int):
        self.path = path
        self.snapshot_id = snapshot_id


class IcebergAppendsStreamReader(DataSourceStreamReader):
    def __init__(self, payload_schema, options: dict):
        self.location = options["location"]
        self.struct = payload_schema  # StructType, no _snapshot_id
        self.fields = payload_schema.fieldNames()
        # option keys may arrive case-normalized depending on the
        # engine path — accept both
        self.start_after = int(
            options.get("fromsnapshotid")
            or options.get("fromSnapshotId")
            or 0
        )

    # -- offsets: the last fully-consumed snapshot id
    def initialOffset(self) -> dict:
        return {"snapshot_id": self.start_after}

    def latestOffset(self) -> dict:
        try:
            meta = _load_metadata(self.location)
        except FileNotFoundError:
            return {"snapshot_id": self.start_after}
        head = meta.get("current-snapshot-id")
        if head is None:
            return {"snapshot_id": self.start_after}
        return {"snapshot_id": max(int(head), self.start_after)}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        lo, hi = int(start["snapshot_id"]), int(end["snapshot_id"])
        if hi <= lo:
            return []
        meta = _load_metadata(self.location)
        parts: list[InputPartition] = []
        for s in sorted(
            meta.get("snapshots", []),
            key=lambda x: x["sequence-number"],
        ):
            sid = int(s["snapshot-id"])
            if not (lo < sid <= hi):
                continue
            op = s.get("summary", {}).get("operation")
            if op != "append":
                raise ValueError(
                    f"iceberg_appends: snapshot {sid} is {op!r}, not "
                    "append — this source streams pure appends; use the "
                    "lake change feed / Delta CDF mirror for row-level "
                    "updates and deletes"
                )
            _, manifests = read_container(s["manifest-list"])
            for m in manifests:
                if m["added_snapshot_id"] != sid:
                    continue
                _, entries = read_container(m["manifest_path"])
                parts.extend(
                    _FilePartition(e["data_file"]["file_path"], sid)
                    for e in entries
                    if e["status"] == 1 and e["data_file"]["content"] == 0
                )
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        # executor-side: one parquet file -> Arrow batches + the
        # lineage column (never a driver materialization)
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type

        # Additive schema evolution: older append snapshots' files lack
        # columns added later, and requesting them from pyarrow raises.
        # Read the intersection and NULL-fill the missing fields typed
        # per the declared schema — the same name-mapping behavior as
        # the batch reader (read_iceberg). ADVICE r4.
        pf = pq.ParquetFile(partition.path)
        present = set(pf.schema_arrow.names)
        table = pf.read(columns=[c for c in self.fields if c in present])
        for f in self.struct.fields:
            if f.name not in present:
                table = table.append_column(
                    f.name,
                    pa.nulls(table.num_rows, to_arrow_type(f.dataType)),
                )
        table = table.select(self.fields)
        sid = pa.array(
            [partition.snapshot_id] * table.num_rows, pa.int64()
        )
        table = table.append_column("_snapshot_id", sid)
        for batch in table.to_batches():
            yield batch

    def commit(self, end: dict) -> None:
        pass  # offsets live in the engine checkpoint


class IcebergAppendsDataSource(DataSource):
    """``format("iceberg_appends").option("location", path)``; optional
    ``fromSnapshotId`` (exclusive start, default 0 = from the first
    snapshot)."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_appends"

    def schema(self) -> str:
        meta = _load_metadata(self.options["location"])
        schema = _from_iceberg_type(
            next(
                s
                for s in meta["schemas"]
                if s["schema-id"] == meta["current-schema-id"]
            )
        )
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
        )
        return f"{cols}, _snapshot_id bigint"

    def streamReader(self, schema) -> IcebergAppendsStreamReader:
        from pyspark.sql.types import StructType

        payload = StructType(
            [f for f in schema.fields if f.name != "_snapshot_id"]
        )
        return IcebergAppendsStreamReader(payload, dict(self.options))


def stream_iceberg_appends(
    spark: SparkSession,
    location: str,
    from_snapshot_id: int = 0,
) -> DataFrame:
    """Register the source (idempotent) and open the append stream."""
    spark.dataSource.register(IcebergAppendsDataSource)
    return (
        spark.readStream.format("iceberg_appends")
        .option("location", os.path.abspath(location))
        .option("fromSnapshotId", str(from_snapshot_id))
        .load()
    )


def tail_iceberg_appends(
    spark: SparkSession,
    src_location: str,
    dst_table,
    checkpoint_dir: str,
    from_snapshot_id: int = 0,
    available_now: bool = True,
) -> list[int]:
    """Mirror-to-table replication for append-only pipelines: tail the
    Iceberg appends stream and land each micro-batch in ``dst_table``
    via the O(batch) insert-only fast path, fenced PER SOURCE SNAPSHOT.

    An availableNow micro-batch can coalesce several source snapshots —
    including, after checkpoint loss, snapshots that already landed plus
    genuinely new ones. Fencing on the batch's max ``_snapshot_id``
    alone would see head > stored fence and re-apply the whole batch,
    duplicating the previously landed rows (ADVICE r4). The sink
    therefore splits the batch by distinct ``_snapshot_id`` and applies
    each slice as its own fenced commit in ascending order: replayed
    snapshots no-op individually, new ones land exactly once.
    Returns the snapshot ids actually applied (fence-advanced) this run.
    """
    from pyspark.sql import functions as F

    applied: list[int] = []

    def _sink(batch_df: DataFrame, _bid: int) -> None:
        rows = batch_df.persist()
        try:
            snaps = sorted(
                r[0]
                for r in rows.select("_snapshot_id").distinct().collect()
            )
            prev_version = dst_table.snapshot().version
            for sid in snaps:
                out = dst_table.append_insert_only(
                    rows.filter(F.col("_snapshot_id") == sid).drop(
                        "_snapshot_id"
                    ),
                    batch_id=int(sid),
                )
                if out.version != prev_version:
                    applied.append(int(sid))
                    prev_version = out.version
        finally:
            rows.unpersist()

    q = (
        stream_iceberg_appends(spark, src_location, from_snapshot_id)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        sq = q.trigger(availableNow=True).start()
        sq.awaitTermination()
    else:  # pragma: no cover - continuous mode is interactive
        sq = q.start()
    return applied
