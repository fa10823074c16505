"""Writable branches + write-audit-publish (Iceberg WAP analog)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.mor import MorTable
from datax_spark.lake.table import CommitConflict, LakeTable
from datax_spark.streaming.pipeline import apply_batch

KEYS = ["repo", "path", "commit"]
SCHEMA = StructType(
    [StructField(c, StringType()) for c in KEYS + ["lang", "content"]]
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string, op string, seq long"
    )


def _state(table):
    return sorted((r["repo"], r["content"]) for r in table.read().collect())


def test_write_audit_publish_flow(spark, tmp_path):
    """Ingest into a branch, audit it, publish: main readers never see
    unaudited commits; after publish the stream fence carries over so
    replays stay exactly-once."""
    table = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=KEYS,
        bucket_key="repo", num_buckets=4,
    )
    apply_batch(table, _events(spark, [
        ("r1", "p", "c", "py", "v1", "insert", 1),
    ]), 0)
    main_before = _state(table)

    br = table.create_branch("audit")
    assert isinstance(br, LakeTable) and br.branch == "audit"
    apply_batch(br, _events(spark, [
        ("r2", "p", "c", "py", "v2", "insert", 10),
    ]), 1)
    apply_batch(br, _events(spark, [
        ("r1", "p", "c", "py", "v1b", "update", 20),
    ]), 2)
    # audit: branch sees both commits, main sees neither
    assert _state(br) == [("r1", "v1b"), ("r2", "v2")]
    assert _state(table) == main_before
    assert table.branches() == {"audit": br.current_version()}

    head = table.publish_branch("audit")
    assert table.current_version() == head
    assert _state(table) == [("r1", "v1b"), ("r2", "v2")]
    assert table.branches() == {}  # dropped after publish
    # fence survived publication: replaying branch batches is a no-op
    m = apply_batch(table, _events(spark, [
        ("r9", "p", "c", "py", "x", "insert", 30),
    ]), 2)
    assert not m.applied
    assert table.last_batch_id("default") == 2


def test_publish_conflicts_with_main_commit(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t2"), SCHEMA, key_cols=KEYS,
        bucket_key="repo", num_buckets=4,
    )
    apply_batch(table, _events(spark, [
        ("r1", "p", "c", "py", "v1", "insert", 1),
    ]), 0)
    br = table.create_branch("audit")
    apply_batch(br, _events(spark, [
        ("r2", "p", "c", "py", "v2", "insert", 10),
    ]), 1)
    # main moves on independently -> fast-forward impossible
    apply_batch(table, _events(spark, [
        ("r3", "p", "c", "py", "v3", "insert", 11),
    ]), 1)
    with pytest.raises(CommitConflict, match="re-branch"):
        table.publish_branch("audit")
    table.drop_branch("audit")


def test_mor_branch_keeps_mor_semantics(spark, tmp_path):
    mor = MorTable.create(
        spark, str(tmp_path / "m"), SCHEMA, key_cols=KEYS,
        bucket_key="repo", num_buckets=4,
    )
    apply_batch(mor, _events(spark, [
        ("r1", "p", "c", "py", "a", "insert", 1),
    ]), 0)
    br = mor.create_branch("wip")
    assert isinstance(br, MorTable)
    apply_batch(br, _events(spark, [
        ("r1", "p", "c", "py", "a2", "update", 2),
        ("r2", "p", "c", "py", "b", "insert", 3),
    ]), 1)
    assert any(br.snapshot().deltas.values())  # MOR append, not COW
    assert _state(br) == [("r1", "a2"), ("r2", "b")]
    assert _state(mor) == [("r1", "a")]
    mor.publish_branch("wip")
    assert _state(mor) == [("r1", "a2"), ("r2", "b")]


def test_vacuum_retains_branch_files(spark, tmp_path):
    """A live branch pins its referenced files and manifests even after
    main advances past the fork and vacuums."""
    table = LakeTable.create(
        spark, str(tmp_path / "t3"), SCHEMA, key_cols=KEYS,
        bucket_key="repo", num_buckets=4,
    )
    apply_batch(table, _events(spark, [
        ("r1", "p", "c", "py", "old", "insert", 1),
    ]), 0)
    br = table.create_branch("keepme")
    want = _state(br)
    # main rewrites everything repeatedly, then vacuums hard
    for i in range(1, 4):
        apply_batch(table, _events(spark, [
            ("r1", "p", "c", "py", f"new{i}", "update", 10 * i),
        ]), i)
    table.vacuum(keep_last=1)
    assert _state(br) == want  # branch unaffected
    # dropping the branch releases its pins on the next vacuum
    table.drop_branch("keepme")
    table.vacuum(keep_last=1)
    with pytest.raises(Exception):
        _state(br)
