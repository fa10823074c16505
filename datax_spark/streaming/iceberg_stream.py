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
    def __init__(self, schema_fields: list[str], options: dict):
        self.location = options["location"]
        self.fields = schema_fields  # payload columns, no _snapshot_id
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

        table = pq.read_table(partition.path, columns=self.fields)
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
        return IcebergAppendsStreamReader(
            [n for n in schema.fieldNames() if n != "_snapshot_id"],
            dict(self.options),
        )


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
    via the O(batch) insert-only fast path, fenced per source snapshot
    (batch id = the max ``_snapshot_id`` in the batch, so a replayed
    micro-batch after checkpoint loss no-ops instead of duplicating).
    Returns the snapshot ids applied this run."""
    from pyspark.sql import functions as F

    applied: list[int] = []

    def _sink(batch_df: DataFrame, _bid: int) -> None:
        rows = batch_df.persist()
        try:
            head = rows.agg(F.max("_snapshot_id")).first()[0]
            if head is None:
                return
            dst_table.append_insert_only(
                rows.drop("_snapshot_id"), batch_id=int(head)
            )
            applied.append(int(head))
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
