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
        q.awaitTermination(60)
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
