"""Tests for lake vacuum and the streaming progress listener."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.table import LakeTable
from datax_spark.streaming.pipeline import PipelineConfig, apply_batch

SCHEMA = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string, op string, seq long"
    )


def test_vacuum_removes_unreferenced_files(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path", "commit"], "repo", 4
    )
    for i in range(4):
        apply_batch(
            table,
            _events(spark, [(f"r{j}", "p", "c", "py", f"v{i}", "insert", i * 10 + j)
                            for j in range(5)]),
            batch_id=i,
        )
    assert table.current_version() == 5  # create + 4 commits
    before = table.read().orderBy("repo", "content").collect()

    stats = table.vacuum(keep_last=2)
    assert stats["removed_snapshots"] == 3
    assert stats["removed_files"] > 0

    after = table.read().orderBy("repo", "content").collect()
    assert before == after  # current snapshot untouched
    # the retained previous version still reads fine
    assert table.read(version=table.current_version() - 1).count() > 0
    # vacuumed versions are gone
    with pytest.raises(FileNotFoundError):
        table.snapshot(1)


def test_vacuum_drops_orphans_from_crashed_commits(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t2"), SCHEMA, ["repo", "path", "commit"], "repo", 4
    )
    apply_batch(table, _events(spark, [("r", "p", "c", "py", "v", "insert", 1)]), 0)
    # simulate a crashed commit: staged files never published
    orphan_rel = table.write_bucket_data(
        table.read().limit(1), num_buckets=4, bucket_key="repo"
    )
    orphan_abs = os.path.join(table.path, orphan_rel)
    assert any(f.endswith(".parquet") for _, _, fs in os.walk(orphan_abs) for f in fs)
    table.vacuum(keep_last=1)
    assert not os.path.exists(orphan_abs)
    assert table.count() == 1


def test_progress_listener_writes_jsonl(spark, tmp_path):
    from datax_spark.streaming.listener import ProgressJsonListener

    path = str(tmp_path / "progress.jsonl")
    listener = ProgressJsonListener(path)
    spark.streams.addListener(listener)
    try:
        q = (
            spark.readStream.format("rate").option("rowsPerSecond", 100).load()
            .writeStream.format("noop").trigger(once=True).start()
        )
        assert q.awaitTermination(600), "stream did not finish"
        # listener callbacks are delivered asynchronously; poll briefly
        import time

        events: set[str] = set()
        for _ in range(40):
            if os.path.exists(path):
                events = {json.loads(line)["event"] for line in open(path)}
                if "terminated" in events:
                    break
            time.sleep(0.25)
    finally:
        spark.streams.removeListener(listener)
    assert "started" in events and "terminated" in events


def test_tags_time_travel_and_vacuum_retention(spark, tmp_path):
    """Named snapshot tags (Iceberg refs analog): read-by-tag is stable
    across later commits AND compaction, vacuum retains tagged versions
    + their files, and deleting the tag releases them."""
    table = LakeTable.create(
        spark, str(tmp_path / "tt"), SCHEMA, ["repo", "path", "commit"], "repo", 4
    )
    apply_batch(table, _events(spark, [
        ("r1", "p", "c", "py", "v1", "insert", 1),
        ("r2", "p", "c", "py", "v1", "insert", 2),
    ]), 0)
    v_tagged = table.create_tag("release-1")
    want = sorted((r["repo"], r["content"])
                  for r in table.read(tag="release-1").collect())
    for i in range(1, 4):
        apply_batch(table, _events(spark, [
            ("r1", "p", "c", "py", f"v{i+1}", "update", 10 * i),
            (f"n{i}", "p", "c", "py", "x", "insert", 10 * i + 1),
        ]), i)
    table.compact()
    assert table.tags() == {"release-1": v_tagged}
    got = sorted((r["repo"], r["content"])
                 for r in table.read(tag="release-1").collect())
    assert got == want  # stable across commits + compaction

    stats = table.vacuum(keep_last=1)
    assert stats["removed_snapshots"] > 0
    # tagged version AND its files survived
    got = sorted((r["repo"], r["content"])
                 for r in table.read(tag="release-1").collect())
    assert got == want
    # duplicate tag creation is exclusive; replace moves it atomically
    with pytest.raises(FileExistsError):
        table.create_tag("release-1")
    table.create_tag("release-1", replace=True)
    assert table.resolve_tag("release-1") == table.current_version()

    table.create_tag("old", version=v_tagged)
    table.delete_tag("old")
    table.vacuum(keep_last=1)
    with pytest.raises(FileNotFoundError):
        table.snapshot(v_tagged)  # released once untagged


def test_tags_on_mor_across_compaction(spark, tmp_path):
    """A tag pinned on a MOR snapshot with LIVE DELTAS must read the
    same resolved state after a compaction rewrites the current base —
    the tagged manifest still references the old base+delta files and
    vacuum keeps them."""
    from datax_spark.lake.mor import MorTable

    mor = MorTable.create(
        spark, str(tmp_path / "mt"), SCHEMA, ["repo", "path", "commit"], "repo", 4
    )
    apply_batch(mor, _events(spark, [
        ("r1", "p", "c", "py", "a", "insert", 1),
        ("r2", "p", "c", "py", "b", "insert", 2),
    ]), 0)
    apply_batch(mor, _events(spark, [
        ("r1", "p", "c", "py", "a2", "update", 3),
    ]), 1)
    assert any(mor.snapshot().deltas.values())  # tag covers live deltas
    mor.create_tag("with-deltas")
    want = sorted((r["repo"], r["content"])
                  for r in mor.read(tag="with-deltas").collect())
    apply_batch(mor, _events(spark, [
        ("r2", "p", "c", "py", "b2", "update", 4),
    ]), 2)
    mor.compact(max_files_per_bucket=0)
    assert not any(mor.snapshot().deltas.values())
    mor.vacuum(keep_last=1)
    got = sorted((r["repo"], r["content"])
                 for r in mor.read(tag="with-deltas").collect())
    assert got == want == [("r1", "a2"), ("r2", "b")]


def test_describe_summary(spark, tmp_path):
    """describe() is a driver-side manifest summary: sides, mode,
    streams — no Spark job."""
    from pyspark.sql.types import StringType, StructField, StructType

    from datax_spark.lake.mor import MorTable
    from datax_spark.streaming.pipeline import PipelineConfig, apply_batch

    schema = StructType(
        [StructField(c, StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )
    t = MorTable.create(
        spark, str(tmp_path / "tdesc"), schema,
        ["repo", "path", "commit"], "repo", 4,
    )
    ev = spark.createDataFrame(
        [("k1", "p", "c", "na", "x", "insert", 1),
         ("k2", "p", "c", "na", "y", "delete", 2)],
        "repo string, path string, commit string, lang string, "
        "content string, op string, seq long",
    )
    apply_batch(t, ev, 0, PipelineConfig(delete_encoding="eq"))
    d = t.describe()
    assert d["table_mode"] == "mor" and d["num_buckets"] == 4
    assert d["delta"]["files"] >= 1 and d["delta"]["bytes"] > 0
    assert d["eq_deletes"]["files"] >= 1
    assert d["streams"]["default"]["last_batch_id"] == 0
    assert d["base"] == {"files": 0, "bytes": 0, "buckets": 0}
    assert "content" in d["schema_fields"]


def test_history_and_timestamp_travel(spark, tmp_path):
    """history() lists per-commit changed buckets + stream advances;
    version_as_of(ts) resolves timestamp time travel over manifest
    mtimes."""
    import time as _time

    from pyspark.sql.types import StringType, StructField, StructType

    from datax_spark.lake.table import LakeTable
    from datax_spark.streaming.pipeline import apply_batch

    schema = StructType(
        [StructField(c, StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "th"), schema,
        ["repo", "path", "commit"], "repo", 4,
    )

    def ev(rows):
        return spark.createDataFrame(
            [(r[0], "p", "c", "na", r[1], r[2], r[3]) for r in rows],
            "repo string, path string, commit string, lang string, "
            "content string, op string, seq long",
        )

    apply_batch(t, ev([("k1", "a", "insert", 1)]), 0)
    t_mid = _time.time()
    _time.sleep(0.05)
    apply_batch(t, ev([("k1", "a2", "update", 2)]), 1)

    h = t.history()
    assert [e["version"] for e in h] == [1, 2, 3]
    assert h[1]["changed_buckets"] and h[2]["changed_buckets"]
    assert h[1]["streams"]["default"]["last_batch_id"] == 0
    assert h[2]["streams"]["default"]["last_batch_id"] == 1

    v = t.version_as_of(t_mid)
    assert v == 2
    rows = t.read(version=v).select("content").collect()
    assert [r["content"] for r in rows] == ["a"]
    import pytest

    with pytest.raises(FileNotFoundError):
        t.version_as_of(0.0)

    # Publish time is recorded INSIDE the manifest (committed_at), so a
    # copy/restore/rsync that refreshes every file mtime must NOT shift
    # TIMESTAMP-AS-OF resolution (ADVICE r3: mtime-based travel silently
    # resolved to the wrong version after a touch).
    mdir = tmp_path / "th" / "_manifests"
    future = _time.time() + 10_000
    for n in os.listdir(mdir):
        p = os.path.join(mdir, n)
        if os.path.isfile(p):
            os.utime(p, (future, future))
    assert t.version_as_of(t_mid) == 2
    assert [e["version"] for e in t.history()] == [1, 2, 3]
    assert t.history()[1]["committed_at"] < future - 5_000
