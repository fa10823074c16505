"""Merge-on-read table mode: oracle equality, fencing, compaction."""

from __future__ import annotations

import os

from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.mor import MorTable
from datax_spark.oracle import replay_oracle_pandas, state_fingerprint
from datax_spark.sources.changelog import generate_changelog, write_segments
from datax_spark.streaming.pipeline import PipelineConfig, apply_segments

SCHEMA = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
KEYS = ["repo", "path", "commit"]


def _make_log(spark, tmp_path, n=8000, evolve_after=None):
    logdir = str(tmp_path / "log")
    df = generate_changelog(
        spark, n_events=n, n_keys=n // 8, events_per_segment=n // 4,
        evolve_after=evolve_after,
    )
    write_segments(df, logdir)
    return df, logdir


def test_mor_apply_matches_oracle(spark, tmp_path):
    log_df, logdir = _make_log(spark, tmp_path)
    t = MorTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 8)
    ms = apply_segments(spark, t, logdir, config=PipelineConfig())
    assert all(m.applied for m in ms)
    got = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    want = state_fingerprint(replay_oracle_pandas(log_df.toPandas()))
    assert got == want


def test_mor_replay_fenced(spark, tmp_path):
    log_df, logdir = _make_log(spark, tmp_path, n=4000)
    t = MorTable.create(spark, str(tmp_path / "t2"), SCHEMA, KEYS, "repo", 8)
    apply_segments(spark, t, logdir)
    fp = state_fingerprint(t.read().orderBy(KEYS).toPandas())

    def _nfiles(snap):
        return sum(len(fs) for fs in snap.buckets.values()) + sum(
            len(fs) for fs in snap.deltas.values()
        )

    files = _nfiles(t.snapshot())
    assert files > 0  # appends landed as delta files
    ms = apply_segments(spark, t, logdir, start_after_batch=-1)
    assert all(not m.applied for m in ms)
    assert _nfiles(t.snapshot()) == files
    assert state_fingerprint(t.read().orderBy(KEYS).toPandas()) == fp


def test_mor_compact_preserves_state_and_future_applies(spark, tmp_path):
    log_df, logdir = _make_log(spark, tmp_path, n=8000)
    t = MorTable.create(spark, str(tmp_path / "t3"), SCHEMA, KEYS, "repo", 8)
    # apply first half, compact mid-stream, then apply the rest
    segs = sorted(
        int(d.split("=")[1]) for d in os.listdir(logdir) if d.startswith("seg=")
    )
    mid = segs[len(segs) // 2 - 1]
    apply_segments(spark, t, logdir, start_after_batch=None,
                   config=PipelineConfig())
    # re-create cleanly for the mid-compact scenario
    t2 = MorTable.create(spark, str(tmp_path / "t3b"), SCHEMA, KEYS, "repo", 8)
    for seg in segs[: len(segs) // 2]:
        events = spark.read.parquet(os.path.join(logdir, f"seg={seg}"))
        from datax_spark.streaming.pipeline import apply_batch
        apply_batch(t2, events, batch_id=seg)
    stats = t2.compact()
    assert stats["compacted_buckets"] > 0
    for seg in segs[len(segs) // 2:]:
        events = spark.read.parquet(os.path.join(logdir, f"seg={seg}"))
        from datax_spark.streaming.pipeline import apply_batch
        apply_batch(t2, events, batch_id=seg)
    fp_full = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    fp_compacted = state_fingerprint(t2.read().orderBy(KEYS).toPandas())
    assert fp_full == fp_compacted
    want = state_fingerprint(replay_oracle_pandas(log_df.toPandas()))
    assert fp_full == want


def test_mor_read_resolution_never_shuffles_base(spark, tmp_path):
    """The resolved read's only Exchange is the delta dedup: the base is
    scan -> broadcast-anti-join -> union, no hashpartitioning (the
    round-1 scale-killer was a full-table shuffle per read)."""
    log_df, logdir = _make_log(spark, tmp_path, n=4000)
    t = MorTable.create(spark, str(tmp_path / "t5"), SCHEMA, KEYS, "repo", 8)
    segs = sorted(
        int(d.split("=")[1]) for d in os.listdir(logdir) if d.startswith("seg=")
    )
    from datax_spark.streaming.pipeline import apply_batch
    for seg in segs[:2]:
        events = spark.read.parquet(os.path.join(logdir, f"seg={seg}"))
        apply_batch(t, events, batch_id=seg)
    t.compact()  # -> base files
    for seg in segs[2:]:
        events = spark.read.parquet(os.path.join(logdir, f"seg={seg}"))
        apply_batch(t, events, batch_id=seg)  # -> delta files on top
    snap = t.snapshot()
    assert any(snap.buckets.values()) and any(snap.deltas.values())
    plan = t.read()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # exactly one hash exchange: the per-key dedup over DELTA rows
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # and the state still matches the oracle
    got = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    want = state_fingerprint(replay_oracle_pandas(log_df.toPandas()))
    assert got == want


def test_mor_schema_evolution(spark, tmp_path):
    log_df, logdir = _make_log(spark, tmp_path, n=4000, evolve_after=2000)
    t = MorTable.create(spark, str(tmp_path / "t4"), SCHEMA, KEYS, "repo", 8)
    apply_segments(spark, t, logdir)
    out = t.read()
    assert "size_bytes" in out.columns
    rows = out.filter("size_bytes IS NOT NULL").count()
    assert rows > 0


def test_mor_maybe_compact_policy(spark, tmp_path):
    """Auto-compaction triggers on delta/base byte ratio or fragmentation
    and is a driver-side no-op otherwise."""
    log_df, logdir = _make_log(spark, tmp_path, n=4000)
    t = MorTable.create(spark, str(tmp_path / "t6"), SCHEMA, KEYS, "repo", 8)
    segs = sorted(
        int(d.split("=")[1]) for d in os.listdir(logdir) if d.startswith("seg=")
    )
    from datax_spark.streaming.pipeline import apply_batch
    for seg in segs[:2]:
        events = spark.read.parquet(os.path.join(logdir, f"seg={seg}"))
        apply_batch(t, events, batch_id=seg)
    # all-delta table: ratio rule must fire
    stats = t.maybe_compact(max_delta_ratio=0.5)
    assert stats["compacted_buckets"] > 0
    assert not any(t.snapshot().deltas.values())
    # freshly compacted, small delta: no-op under a lenient ratio
    ev = spark.read.parquet(os.path.join(logdir, f"seg={segs[2]}"))
    apply_batch(t, ev, batch_id=segs[2])
    assert t.maybe_compact(max_delta_ratio=10.0,
                           max_files_per_bucket=64)["compacted_buckets"] == 0
    assert any(t.snapshot().deltas.values())
    # fragmentation rule fires regardless of byte ratio
    stats = t.maybe_compact(max_delta_ratio=10.0, max_files_per_bucket=0)
    assert stats["compacted_buckets"] > 0


def test_mor_time_travel_across_compaction(spark, tmp_path):
    """Version pinning survives later appends AND compaction: an old
    snapshot keeps its own base/delta file lists (immutable manifests),
    so `read(version=v)` reproduces the state exactly until vacuum."""
    log_df, logdir = _make_log(spark, tmp_path, n=4000)
    t = MorTable.create(spark, str(tmp_path / "t7"), SCHEMA, KEYS, "repo", 8)
    segs = sorted(
        int(d.split("=")[1]) for d in os.listdir(logdir) if d.startswith("seg=")
    )
    from datax_spark.streaming.pipeline import apply_batch
    apply_batch(t, spark.read.parquet(os.path.join(logdir, f"seg={segs[0]}")),
                batch_id=segs[0])
    v_after_first = t.current_version()
    fp_v1 = state_fingerprint(
        t.read(version=v_after_first).orderBy(KEYS).toPandas()
    )
    for seg in segs[1:]:
        apply_batch(t, spark.read.parquet(os.path.join(logdir, f"seg={seg}")),
                    batch_id=seg)
    t.compact()
    # pinned read unchanged by later appends + compaction
    assert state_fingerprint(
        t.read(version=v_after_first).orderBy(KEYS).toPandas()
    ) == fp_v1
    # and the pinned version still resolves via its own deltas
    assert any(t.snapshot(v_after_first).deltas.values())


def test_key_restricted_read(spark, tmp_path):
    """read(keys=) is the point-lookup/mini-batch view: it must equal
    the full resolved read filtered to those keys, in one pass that
    semi-joins BEFORE resolution (key-local resolution makes that
    exact) — including keys that resolve to tombstones (absent) and
    keys that don't exist."""
    log_df, logdir = _make_log(spark, tmp_path, n=4000)
    t = MorTable.create(spark, str(tmp_path / "tk"), SCHEMA, KEYS, "repo", 8)
    from datax_spark.streaming.pipeline import apply_batch
    apply_batch(t, spark.read.parquet(logdir), batch_id=0)

    full = t.read().toPandas().set_index(KEYS).sort_index()
    some = t.read().orderBy(KEYS).limit(7).select(*KEYS)
    ghost = spark.createDataFrame(
        [("no-such-repo", "p", "c")], "repo string, path string, commit string"
    )
    keys = some.unionByName(ghost)
    got = t.read(keys=keys).toPandas().set_index(KEYS).sort_index()
    want = full.loc[full.index.intersection(
        some.toPandas().set_index(KEYS).index
    )].sort_index()
    assert got.equals(want)
