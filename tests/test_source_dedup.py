"""At-least-once source redelivery suppression (tail_and_apply dedup_within).

The COW merge applies batches unconditionally (segment replay-order
contract), so a redelivered STALE event in a later micro-batch silently
overwrites newer state. dropDuplicatesWithinWatermark over the event
identity (key cols + seq) closes the hazard. Both directions are pinned:
without the option the corruption happens; with it the state matches the
exactly-once replay.
"""

import os

import pytest
from pyspark.sql import functions as F

from datax_spark.lake.table import LakeTable
from datax_spark.streaming.pipeline import PipelineConfig, tail_and_apply

SCHEMA = (
    "repo string, path string, commit string, lang string, content string, "
    "op string, seq long, ts timestamp"
)


def _seg(spark, log_dir, seg_id, rows):
    df = spark.createDataFrame(
        [
            (r[0], "p", "c", "txt", r[2], r[1], r[3], r[3])
            for r in rows
        ],
        "repo string, path string, commit string, lang string, content string, op string, seq long, _t long",
    ).withColumn("ts", F.timestamp_seconds(F.col("_t"))).drop("_t")
    df.coalesce(1).write.parquet(os.path.join(log_dir, f"seg={seg_id}"))


@pytest.fixture()
def log_dir(spark, tmp_path):
    d = os.path.join(str(tmp_path), "log")
    # seg 0: fresh images, including an IN-BATCH duplicate of (r1, seq 1)
    _seg(
        spark,
        d,
        0,
        [
            ("r1", "insert", "v1", 1),
            ("r1", "insert", "v1", 1),  # same-batch redelivery
            ("r2", "insert", "w1", 2),
        ],
    )
    # seg 1: newer image for r1 ...
    _seg(spark, d, 1, [("r1", "update", "v2", 3)])
    # seg 2: ... then the source REDELIVERS the old (r1, seq 1) image
    _seg(spark, d, 2, [("r1", "insert", "v1", 1), ("r2", "update", "w2", 4)])
    return d


def _run(spark, tmp_path, log_dir, name, **kw):
    from pyspark.sql.types import _parse_datatype_string

    tpath = os.path.join(str(tmp_path), name)
    LakeTable.create(
        spark,
        tpath,
        _parse_datatype_string(
            "repo string, path string, commit string, lang string, content string"
        ),
        ["repo", "path", "commit"],
        "repo",
        num_buckets=4,
    )
    tail_and_apply(
        spark,
        tpath,
        log_dir,
        os.path.join(str(tmp_path), name + "_ckpt"),
        _parse_datatype_string(SCHEMA),
        config=PipelineConfig(),
        max_files_per_trigger=1,
        **kw,
    )
    t = LakeTable(spark, tpath)
    return {r["repo"]: r["content"] for r in t.read().collect()}


def test_without_dedup_stale_redelivery_corrupts(spark, tmp_path, log_dir):
    got = _run(spark, tmp_path, log_dir, "plain")
    # the stale (r1, seq 1) image in seg 2 overwrote the newer v2 — the
    # documented hazard this test pins as the negative control
    assert got["r1"] == "v1" and got["r2"] == "w2"


def test_dedup_within_watermark_preserves_newest(spark, tmp_path, log_dir):
    got = _run(spark, tmp_path, log_dir, "dedup", dedup_within="1 hour")
    assert got == {"r1": "v2", "r2": "w2"}
