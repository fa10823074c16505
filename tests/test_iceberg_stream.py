"""Streaming tail of the Iceberg mirror's append snapshots
(streaming/iceberg_stream.py).

Claims: the custom partitioned streaming source advances
snapshot-by-snapshot with engine-checkpointed offsets (restart resumes,
no rescan), executors read the added files (one InputPartition per
file), rows carry _snapshot_id lineage, the relay into a lake table is
fenced per source snapshot, and an overwrite snapshot fails the stream
instead of silently emitting rewritten rows.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from datax_spark.lake.iceberg import export_iceberg
from datax_spark.lake.table import LakeTable
from datax_spark.streaming.iceberg_stream import (
    stream_iceberg_appends,
    tail_iceberg_appends,
)

SCHEMA = StructType([
    StructField("repo", StringType()),
    StructField("seq", LongType()),
    StructField("content", StringType()),
])


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.col("id").alias("seq"),
        F.concat(F.lit("c"), F.col("id")).alias("content"),
    )


def _src(spark, tmp_path, batches=2):
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "src"), SCHEMA, ["repo"],
        "repo", num_buckets=4,
    )
    vs = []
    for i in range(batches):
        t.append_insert_only(_rows(spark, i * 100, (i + 1) * 100), batch_id=i)
        export_iceberg(t)
        vs.append(t.current_version())
    return t, vs


def _seqs(df):
    return sorted(r["seq"] for r in df.select("seq").collect())


def test_stream_schema_has_lineage_column(spark, tmp_path):
    _src(spark, tmp_path)
    df = stream_iceberg_appends(spark, os.path.join(str(tmp_path), "src"))
    assert df.isStreaming
    assert df.schema.fieldNames() == ["repo", "seq", "content",
                                      "_snapshot_id"]


def test_tail_relays_appends_and_resumes_from_checkpoint(spark, tmp_path):
    src, vs = _src(spark, tmp_path, batches=2)
    loc = os.path.abspath(src.path)
    dst = LakeTable.create(
        spark, os.path.join(str(tmp_path), "dst"), SCHEMA, ["repo"],
        "repo", num_buckets=4,
    )
    ckpt = os.path.join(str(tmp_path), "ckpt")
    applied = tail_iceberg_appends(spark, loc, dst, ckpt)
    assert applied and max(applied) == vs[-1]
    assert _seqs(dst.read()) == _seqs(src.read()) == list(range(200))

    # nothing new -> second run applies nothing (checkpoint resume)
    assert tail_iceberg_appends(spark, loc, dst, ckpt) == []
    assert _seqs(dst.read()) == list(range(200))

    # a third append streams incrementally from the checkpoint
    src.append_insert_only(_rows(spark, 200, 300), batch_id=2)
    export_iceberg(src)
    applied = tail_iceberg_appends(spark, loc, dst, ckpt)
    assert applied == [src.current_version()]
    assert _seqs(dst.read()) == list(range(300))
    # lineage: the batch landed under the SOURCE snapshot id fence
    assert dst.snapshot().properties["streams"]["default"][
        "last_batch_id"
    ] == src.current_version()


def test_replayed_batch_is_fenced(spark, tmp_path):
    """Checkpoint loss replays the stream from scratch; the per-source-
    snapshot fence makes the replay a no-op instead of duplicating."""
    src, vs = _src(spark, tmp_path, batches=2)
    loc = os.path.abspath(src.path)
    dst = LakeTable.create(
        spark, os.path.join(str(tmp_path), "dst"), SCHEMA, ["repo"],
        "repo", num_buckets=4,
    )
    tail_iceberg_appends(spark, loc, dst, os.path.join(str(tmp_path), "c1"))
    v = dst.current_version()
    # fresh checkpoint = full replay; every batch id <= fence -> no-op
    tail_iceberg_appends(spark, loc, dst, os.path.join(str(tmp_path), "c2"))
    assert dst.current_version() == v
    assert _seqs(dst.read()) == list(range(200))


def test_stream_survives_additive_schema_evolution(spark, tmp_path):
    """ADVICE r4: after ADD COLUMN, older append snapshots' parquet
    files lack the new column; requesting it from pyarrow raises and
    failed the stream. The reader must NULL-fill missing fields by name
    like the batch reader does."""
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "src"), SCHEMA, ["repo"],
        "repo", num_buckets=4,
    )
    t.append_insert_only(_rows(spark, 0, 100), batch_id=0)
    export_iceberg(t)
    t.add_columns([StructField("stars", LongType())])
    t.append_insert_only(
        _rows(spark, 100, 200).withColumn("stars", F.col("seq") * 2),
        batch_id=1,
    )
    export_iceberg(t)

    rows = (
        stream_iceberg_appends(spark, os.path.abspath(t.path))
        .writeStream.format("memory")
        .queryName("ice_evo")
        .option(
            "checkpointLocation", os.path.join(str(tmp_path), "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    assert rows.awaitTermination(600)
    got = spark.sql("SELECT * FROM ice_evo").collect()
    assert len(got) == 200
    by_seq = {r["seq"]: r for r in got}
    assert by_seq[0]["stars"] is None  # pre-evolution file NULL-fills
    assert by_seq[150]["stars"] == 300


def test_checkpoint_loss_with_new_appends_does_not_duplicate(spark, tmp_path):
    """ADVICE r4: after checkpoint loss WITH new appends since, one
    availableNow micro-batch spans already-applied AND new snapshots —
    head exceeds the stored fence, so a batch-level max-id fence would
    re-apply the whole batch. The per-snapshot split must no-op the
    replayed snapshots individually and land only the new one."""
    src, vs = _src(spark, tmp_path, batches=2)
    loc = os.path.abspath(src.path)
    dst = LakeTable.create(
        spark, os.path.join(str(tmp_path), "dst"), SCHEMA, ["repo"],
        "repo", num_buckets=4,
    )
    tail_iceberg_appends(spark, loc, dst, os.path.join(str(tmp_path), "c1"))
    assert _seqs(dst.read()) == list(range(200))
    # a new append lands in the mirror after the checkpoint is lost
    src.append_insert_only(_rows(spark, 200, 300), batch_id=2)
    export_iceberg(src)
    applied = tail_iceberg_appends(
        spark, loc, dst, os.path.join(str(tmp_path), "c2")
    )
    assert applied == [src.current_version()]
    assert _seqs(dst.read()) == list(range(300))


def test_overwrite_snapshot_fails_the_stream(spark, tmp_path):
    from pyspark.errors import StreamingQueryException

    src, vs = _src(spark, tmp_path, batches=2)
    src.compact(max_files_per_bucket=1)
    export_iceberg(src)  # overwrite snapshot
    loc = os.path.abspath(src.path)
    dst = LakeTable.create(
        spark, os.path.join(str(tmp_path), "dst"), SCHEMA, ["repo"],
        "repo", num_buckets=4,
    )
    with pytest.raises(StreamingQueryException, match="not.*append"):
        tail_iceberg_appends(
            spark, loc, dst, os.path.join(str(tmp_path), "ckpt")
        )
