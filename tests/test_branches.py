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


def fingerprint(table) -> str:
    from datax_spark.oracle import state_fingerprint

    return state_fingerprint(
        table.read().select(*KEYS, "lang", "content").orderBy(*KEYS).toPandas()
    )


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


def test_publish_rebase_merges_onto_moved_main(spark, tmp_path):
    """rebase publish: main kept ingesting (stream-a) while the branch
    audited its own batches (stream-b); the replayed merge must contain
    BOTH and keep both stream fences."""
    from pyspark.sql import functions as F

    from datax_spark.sources.changelog import generate_changelog

    mor = MorTable.create(
        spark, str(tmp_path / "rb"), SCHEMA, key_cols=KEYS,
        bucket_key="repo", num_buckets=4,
    )
    log_a = generate_changelog(spark, n_events=1500, n_keys=200, seed=31,
                               dirty_pct=0.0)
    log_b = generate_changelog(spark, n_events=1500, n_keys=200, seed=32,
                               dirty_pct=0.0)
    log_b = log_b.withColumn("seq", F.col("seq") + F.lit(1_000_000))
    from datax_spark.streaming.pipeline import PipelineConfig

    apply_batch(mor, log_a.filter("seq < 700"), 0,
                PipelineConfig(stream_id="stream-a"))
    br = mor.create_branch("audit")
    apply_batch(br, log_b, 0, PipelineConfig(stream_id="stream-b"))
    # main moves on AFTER the fork
    apply_batch(mor, log_a.filter("seq >= 700"), 1,
                PipelineConfig(stream_id="stream-a"))

    with pytest.raises(CommitConflict):
        mor.publish_branch("audit")  # fast-forward impossible
    mor.publish_branch("audit", rebase=True)

    serial = MorTable.create(
        spark, str(tmp_path / "rb_serial"), SCHEMA, key_cols=KEYS,
        bucket_key="repo", num_buckets=4,
    )
    apply_batch(serial, log_a.filter("seq < 700"), 0,
                PipelineConfig(stream_id="stream-a"))
    apply_batch(serial, log_a.filter("seq >= 700"), 1,
                PipelineConfig(stream_id="stream-a"))
    apply_batch(serial, log_b, 0, PipelineConfig(stream_id="stream-b"))
    assert fingerprint(mor) == fingerprint(serial)
    assert mor.last_batch_id("stream-a") == 1
    assert mor.last_batch_id("stream-b") == 0
    # replaying the branch batch on main is now fenced
    m = apply_batch(mor, log_b, 0, PipelineConfig(stream_id="stream-b"))
    assert not m.applied


def test_publish_rebase_conflicts_on_rewritten_bucket(spark, tmp_path):
    """A branch COW rewrite of a bucket main also rewrote cannot rebase."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField(c, StringType()) for c in KEYS + ["lang", "content"]]
    )
    cow = LakeTable.create(
        spark, str(tmp_path / "rc"), schema, key_cols=KEYS,
        bucket_key="repo", num_buckets=2,
    )

    def ev(content, seq):
        return spark.createDataFrame(
            [("r1", "p", "c", "py", content, "insert", seq)],
            "repo string, path string, commit string, lang string, "
            "content string, op string, seq long",
        )

    from datax_spark.streaming.pipeline import PipelineConfig

    apply_batch(cow, ev("base", 1), 0)
    br = cow.create_branch("risky")
    # distinct streams so the fence passes and the BUCKET divergence is
    # what must block the rebase (same stream+batch would hit the fence
    # first, also correctly)
    apply_batch(br, ev("branch-v", 2), 0, PipelineConfig(stream_id="side"))
    apply_batch(cow, ev("main-v", 3), 1)
    with pytest.raises(CommitConflict, match="diverged"):
        cow.publish_branch("risky", rebase=True)
    cow.drop_branch("risky")
    assert _state(cow) == [("r1", "main-v")]


def test_publish_resumes_after_crash(spark, tmp_path):
    """A publish that crashed after linking part of the branch resumes:
    the re-run fast-forwards the remainder instead of conflicting."""
    import os

    table = LakeTable.create(
        spark, str(tmp_path / "t5"), SCHEMA, key_cols=KEYS,
        bucket_key="repo", num_buckets=4,
    )
    apply_batch(table, _events(spark, [
        ("r1", "p", "c", "py", "v1", "insert", 1),
    ]), 0)
    br = table.create_branch("crashy")
    apply_batch(br, _events(spark, [
        ("r2", "p", "c", "py", "v2", "insert", 10),
    ]), 1)
    apply_batch(br, _events(spark, [
        ("r3", "p", "c", "py", "v3", "insert", 11),
    ]), 2)
    # simulate the crash: only the FIRST post-fork manifest got linked
    bdir = os.path.join(table._branches_root(), "crashy")
    fork = table.current_version()
    os.link(os.path.join(bdir, f"v{fork + 1:08d}.json"),
            table._manifest_path(fork + 1))
    assert table.current_version() == fork + 1
    head = table.publish_branch("crashy")  # resumes, no conflict
    assert table.current_version() == head == fork + 2
    assert _state(table) == [("r1", "v1"), ("r2", "v2"), ("r3", "v3")]
