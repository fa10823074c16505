"""Incremental rollup maintenance from the change feed."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.mor import MorTable
from datax_spark.lake.table import LakeTable
from datax_spark.operators.rollup import create_rollup_table, refresh_rollup
from datax_spark.sources.changelog import generate_changelog, write_segments
from datax_spark.streaming.pipeline import apply_batch

SCHEMA = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
KEYS = ["repo", "path", "commit"]


def _direct_agg(table):
    return {
        r["repo"]: (r["n"], r["b"])
        for r in table.read()
        .groupBy("repo")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.octet_length(F.coalesce(F.col("content"), F.lit("")))
                .cast("long")
            ).alias("b"),
        )
        .collect()
    }


def _rollup_state(agg):
    return {
        r["repo"]: (r["n_paths"], r["total_bytes"])
        for r in agg.read().collect()
    }


def _run(spark, tmp_path, cls, cfg=None, n=6000):
    logdir = str(tmp_path / "log")
    write_segments(
        generate_changelog(
            spark, n_events=n, n_keys=n // 8, events_per_segment=n // 4
        ),
        logdir,
    )
    src = cls.create(spark, str(tmp_path / "src"), SCHEMA, KEYS, "repo", 8)
    agg = create_rollup_table(spark, str(tmp_path / "agg"), num_buckets=4)
    segs = sorted(
        int(d.split("=")[1]) for d in os.listdir(logdir) if d.startswith("seg=")
    )
    for seg in segs:
        ev = spark.read.parquet(os.path.join(logdir, f"seg={seg}"))
        apply_batch(src, ev, batch_id=seg, config=cfg)
        res = refresh_rollup(src, agg)
        assert res is not None and res.applied
    return src, agg


def test_rollup_matches_direct_aggregate_cow(spark, tmp_path):
    """Refresh after every batch: the incrementally-maintained rollup
    equals a from-scratch aggregate of the final state — inserts,
    updates (byte deltas), and deletes (groups dropping out) compose."""
    src, agg = _run(spark, tmp_path, LakeTable)
    assert _rollup_state(agg) == _direct_agg(src)


def test_rollup_matches_direct_aggregate_mor(spark, tmp_path):
    """Same over a merge-on-read source: the change feed diffs RESOLVED
    states, so delta encoding is invisible to the consumer."""
    from datax_spark.streaming.pipeline import PipelineConfig

    src, agg = _run(
        spark, tmp_path, MorTable, cfg=PipelineConfig(delete_encoding="eq"),
        n=4000,
    )
    assert _rollup_state(agg) == _direct_agg(src)


def test_rollup_refresh_is_fenced_and_lazy(spark, tmp_path):
    src, agg = _run(spark, tmp_path, LakeTable, n=3000)
    state = _rollup_state(agg)
    v = agg.current_version()
    # nothing new on src -> no-op, no commit
    assert refresh_rollup(src, agg) is None
    assert agg.current_version() == v
    assert _rollup_state(agg) == state
    # a src maintenance commit (rebucket: COW compaction is a no-op here
    # since every MERGE leaves one file per bucket) rewrites file lists
    # but not rows: the refresh advances the fence without corrupting
    # the rollup
    src.rebucket(16)
    res = refresh_rollup(src, agg)
    assert res is not None
    assert _rollup_state(agg) == state
    assert agg.last_batch_id("rollup") == src.current_version()
