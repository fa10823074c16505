"""Tests for bulk load (full-sync path) and bucket compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.table import LakeTable
from datax_spark.streaming.pipeline import apply_batch

SCHEMA = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)


def _snapshot_df(spark, n=500):
    return spark.range(n).select(
        F.concat(F.lit("r"), F.col("id") % 50).alias("repo"),
        F.concat(F.lit("p"), F.col("id")).alias("path"),
        F.lit("c0").alias("commit"),
        F.lit("py").alias("lang"),
        F.concat(F.lit("body"), F.col("id")).alias("content"),
    )


def test_bulk_load_truncate_and_nonconflict(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path", "commit"], "repo", 8
    )
    t.bulk_load(_snapshot_df(spark, 500), mode="nonConflict")
    assert t.count() == 500
    with pytest.raises(FileExistsError):
        t.bulk_load(_snapshot_df(spark, 10), mode="nonConflict")
    t.bulk_load(_snapshot_df(spark, 100), mode="truncate")
    assert t.count() == 100


def test_bulk_load_then_cdc_apply(spark, tmp_path):
    """The full-sync -> incremental-tail lifecycle (DataX full + inc)."""
    t = LakeTable.create(
        spark, str(tmp_path / "t2"), SCHEMA, ["repo", "path", "commit"], "repo", 8
    )
    t.bulk_load(_snapshot_df(spark, 200))
    ev = spark.createDataFrame(
        [("r1", "p1", "c0", "py", "UPDATED", "update", 1),
         ("r2", "p2", "c0", "py", None, "delete", 2),
         ("rX", "pX", "cX", "go", "new", "insert", 3)],
        "repo string, path string, commit string, lang string, "
        "content string, op string, seq long",
    )
    m = apply_batch(t, ev, batch_id=0)
    assert m.applied
    rows = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert rows[("r1", "p1")] == "UPDATED"
    assert ("r2", "p2") not in rows
    assert rows[("rX", "pX")] == "new"
    assert len(rows) == 200 + 1 - 1


def test_append_insert_only_is_fenced_and_additive(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "ta"), SCHEMA, ["repo", "path", "commit"], "repo", 4
    )
    base_files = 0
    for i in range(3):
        df = spark.createDataFrame(
            [(f"r{j}", f"p{i}", "c", "py", f"v{i}.{j}") for j in range(10)],
            SCHEMA,
        )
        t.append_insert_only(df, batch_id=i)
    assert t.count() == 30
    snap = t.snapshot()
    base_files = sum(len(fs) for fs in snap.buckets.values())
    # replayed batch id -> committed no-op
    t.append_insert_only(
        spark.createDataFrame([("x", "x", "x", "py", "x")], SCHEMA), batch_id=2
    )
    assert t.count() == 30
    assert sum(len(fs) for fs in t.snapshot().buckets.values()) == base_files


def test_compact_reduces_files_preserves_state(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t3"), SCHEMA, ["repo", "path", "commit"], "repo", 4
    )
    # append-mode batches fragment buckets (one file per bucket per batch)
    for i in range(5):
        df = spark.createDataFrame(
            [(f"r{j}", f"p{i}", "c", "py", f"v{i}.{j}") for j in range(20)],
            SCHEMA,
        )
        t.append_insert_only(df, batch_id=i)
    snap = t.snapshot()
    assert any(len(fs) > 1 for fs in snap.buckets.values())
    before = sorted(
        (r["repo"], r["path"], r["content"]) for r in t.read().collect()
    )
    stats = t.compact(max_files_per_bucket=1)
    assert stats["compacted_buckets"] > 0
    assert stats["files_after"] < stats["files_before"]
    after_snap = t.snapshot()
    assert all(len(fs) == 1 for fs in after_snap.buckets.values())
    after = sorted(
        (r["repo"], r["path"], r["content"]) for r in t.read().collect()
    )
    assert before == after
    # reclaim: vacuum drops the pre-compaction files
    assert t.vacuum(keep_last=1)["removed_files"] > 0
    assert sorted(
        (r["repo"], r["path"], r["content"]) for r in t.read().collect()
    ) == before
