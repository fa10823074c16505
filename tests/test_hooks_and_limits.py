"""Hooks SPI, dryRun preCheck, byte-budget rate limit, metrics semantics.

Reference parity targets: HookInvoker.java:24-87 (post-commit hooks),
JobContainer.java:103-106,184-213 (dryRun preCheck), Channel.java:176-239
(the bps half of the speed throttle).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.table import LakeTable
from datax_spark.plans.job import JobSpec, run_job
from datax_spark.sources.changelog import generate_changelog
from datax_spark.streaming.pipeline import PipelineConfig, apply_batch
from datax_spark.util import RateLimiter

SCHEMA = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
KEYS = ["repo", "path", "commit"]


def test_on_commit_hook_fires_exactly_once(spark, tmp_path):
    """Hooks fire per COMMITTED batch — never on a fenced replay."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 4)
    events = generate_changelog(spark, n_events=500, n_keys=100)
    fired = []
    cfg = PipelineConfig(on_commit=[lambda m: fired.append(m.batch_id)])
    m1 = apply_batch(t, events, batch_id=0, config=cfg)
    assert m1.applied and fired == [0]
    m2 = apply_batch(t, events, batch_id=0, config=cfg)  # replay: fenced
    assert not m2.applied and fired == [0]
    m3 = apply_batch(t, events, batch_id=1, config=cfg)
    assert m3.applied and fired == [0, 1]


def test_deduped_keys_metric_is_post_dedup_cardinality(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t2"), SCHEMA, KEYS, "repo", 4)
    events = generate_changelog(spark, n_events=2000, n_keys=150, dirty_pct=0.0)
    want = events.select(*KEYS).distinct().count()
    m = apply_batch(
        t, events, batch_id=0,
        config=PipelineConfig(metrics_path=str(tmp_path / "m.jsonl")),
    )
    assert m.deduped_keys == want
    assert m.upserts + m.deletes == m.clean_records  # pre-dedup event counts
    assert m.bytes_estimate > 0  # metrics_path set -> byte accounting on


def test_byte_rate_limiter_budget():
    rl = RateLimiter(10_000)  # 10 kB/s budget
    t0 = time.monotonic()
    rl.admit(100)
    rl.admit(2000)  # cumulative 2100 bytes -> >= 0.21s wall clock
    assert time.monotonic() - t0 >= 0.2
    rl_fast = RateLimiter(1e12)
    assert rl_fast.admit(10**9) < 0.01  # generous budget ~no sleep


def test_apply_segments_byte_budget(spark, tmp_path):
    from datax_spark.sources.changelog import write_segments
    from datax_spark.streaming.pipeline import apply_segments

    logdir = str(tmp_path / "log")
    df = generate_changelog(
        spark, n_events=400, n_keys=80, events_per_segment=200
    )
    write_segments(df, logdir)
    t = LakeTable.create(spark, str(tmp_path / "t3"), SCHEMA, KEYS, "repo", 4)
    t0 = time.monotonic()
    ms = apply_segments(
        spark, t, logdir,
        config=PipelineConfig(max_bytes_per_sec=1e12),  # effectively off
    )
    assert sum(m.bytes_estimate for m in ms) > 0
    assert time.monotonic() - t0 < 120


def test_run_job_dry_run_ok_and_failure(spark, tmp_path):
    src = str(tmp_path / "in")
    spark.createDataFrame([(1, "a")], ["id", "s"]).write.parquet(src)
    spec = {
        "job": {
            "setting": {"dryRun": True},
            "content": [{
                "reader": {"name": "parquetreader", "parameter": {"path": src}},
                "writer": {"name": "parquetwriter",
                           "parameter": {"path": str(tmp_path / "out")}},
            }],
        }
    }
    report = run_job(spark, spec)
    assert report["ok"] and report["checks"][0]["name"] == "reader+transforms"
    assert "id" in report["checks"][0]["schema"]
    # dry run moved no data
    import os
    assert not os.path.exists(str(tmp_path / "out"))

    bad = dict(spec)
    bad = {
        "job": {
            "setting": {"dryRun": True},
            "content": [{
                "reader": {"name": "parquetreader",
                           "parameter": {"path": str(tmp_path / "missing")}},
                "writer": spec["job"]["content"][0]["writer"],
            }],
        }
    }
    report = run_job(spark, bad)
    assert not report["ok"]


def test_run_job_post_hooks(spark, tmp_path):
    src = str(tmp_path / "in2")
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "s"]).write.parquet(src)
    seen = []
    spec = {
        "job": {
            "content": [{
                "reader": {"name": "parquetreader", "parameter": {"path": src}},
                "writer": {"name": "parquetwriter",
                           "parameter": {"path": str(tmp_path / "out2")}},
            }],
        }
    }
    run_job(spark, spec, hooks=[lambda ctx: seen.append(ctx["result"])])
    assert seen == [str(tmp_path / "out2")]
    # dry run never fires hooks
    spec["job"]["setting"] = {"dryRun": True}
    run_job(spark, JobSpec.from_dict(spec), hooks=[lambda ctx: seen.append("x")])
    assert seen == [str(tmp_path / "out2")]


def test_error_limit_still_enforced_with_hooks(spark, tmp_path):
    from datax_spark.quality.quarantine import ErrorLimit, ErrorLimitExceeded

    t = LakeTable.create(spark, str(tmp_path / "t4"), SCHEMA, KEYS, "repo", 4)
    events = generate_changelog(spark, n_events=500, n_keys=100, dirty_pct=0.2)
    fired = []
    cfg = PipelineConfig(
        error_limit=ErrorLimit(record=0),
        on_commit=[lambda m: fired.append(m.batch_id)],
    )
    with pytest.raises(ErrorLimitExceeded):
        apply_batch(t, events, batch_id=0, config=cfg)
    assert fired == []  # aborted batch commits no hook


def test_batch_metrics_expose_lineage(spark, tmp_path):
    """Per-bucket max_seq (ShardCheckpoint analog) rides the metrics."""
    t = LakeTable.create(spark, str(tmp_path / "t5"), SCHEMA, KEYS, "repo", 4)
    events = generate_changelog(spark, n_events=500, n_keys=100, dirty_pct=0.0)
    m = apply_batch(t, events, batch_id=0)
    assert m.lineage and all(isinstance(v, int) for v in m.lineage.values())
    # matches what the committed snapshot recorded
    snap_lineage = t.snapshot().lineage
    for b, mx in m.lineage.items():
        assert snap_lineage[b]["max_seq"] == mx
    # fenced replay exposes no lineage
    m2 = apply_batch(t, events, batch_id=0)
    assert not m2.applied and m2.lineage == {}
