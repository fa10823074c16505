"""Online bucket-count change (Iceberg partition-evolution analog)."""

from __future__ import annotations

import os

from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.mor import MorTable
from datax_spark.lake.table import BUCKET_COL, LakeTable
from datax_spark.oracle import replay_oracle_pandas, state_fingerprint
from datax_spark.sources.changelog import generate_changelog, write_segments
from datax_spark.streaming.pipeline import PipelineConfig, apply_segments

SCHEMA = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
KEYS = ["repo", "path", "commit"]


def _make_log(spark, tmp_path, name="log", n=6000):
    logdir = str(tmp_path / name)
    df = generate_changelog(
        spark, n_events=n, n_keys=n // 8, events_per_segment=n // 4
    )
    write_segments(df, logdir)
    return df, logdir


def _bucket_ids(snap):
    return sorted(int(b) for b, fs in snap.buckets.items() if fs)


def test_rebucket_grow_preserves_state_and_future_applies(spark, tmp_path):
    """8 -> 32 buckets mid-stream: state identical, subsequent batches
    land in the new layout, final state equals a never-rebucketed twin
    and the replay oracle."""
    log_df, logdir = _make_log(spark, tmp_path)
    segs = sorted(
        int(d.split("=")[1]) for d in os.listdir(logdir) if d.startswith("seg=")
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 8)
    twin = LakeTable.create(spark, str(tmp_path / "tw"), SCHEMA, KEYS, "repo", 8)
    apply_segments(spark, twin, logdir)
    from datax_spark.streaming.pipeline import apply_batch

    half = segs[: len(segs) // 2]
    for seg in half:
        ev = spark.read.parquet(os.path.join(logdir, f"seg={seg}"))
        apply_batch(t, ev, batch_id=seg)
    fp_mid = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    snap = t.rebucket(32)
    assert snap.properties["num_buckets"] == 32
    assert max(_bucket_ids(snap)) > 7, "keys spread past the old id space"
    assert state_fingerprint(t.read().orderBy(KEYS).toPandas()) == fp_mid
    # lineage re-keyed to the new id space only
    assert set(snap.lineage) <= {str(b) for b in _bucket_ids(snap)}
    for seg in segs[len(segs) // 2:]:
        ev = spark.read.parquet(os.path.join(logdir, f"seg={seg}"))
        m = apply_batch(t, ev, batch_id=seg)
        assert m.applied
    got = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    assert got == state_fingerprint(twin.read().orderBy(KEYS).toPandas())
    assert got == state_fingerprint(replay_oracle_pandas(log_df.toPandas()))


def test_rebucket_shrink_drops_dead_ids(spark, tmp_path):
    log_df, logdir = _make_log(spark, tmp_path, n=3000)
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 16)
    apply_segments(spark, t, logdir)
    fp = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    snap = t.rebucket(4)
    assert snap.properties["num_buckets"] == 4
    assert max(_bucket_ids(snap)) <= 3
    assert all(int(b) <= 3 for b in snap.lineage), "no stale lineage ids"
    assert all(int(b) <= 3 for b in snap.file_stats or {}), "no stale stats"
    assert state_fingerprint(t.read().orderBy(KEYS).toPandas()) == fp


def test_rebucket_mor_folds_deltas_and_eq_deletes(spark, tmp_path):
    """A MOR rebucket folds deltas AND eq-delete files into resolved
    key-unique base files in the new layout; future MOR applies keep
    matching the oracle."""
    log_df, logdir = _make_log(spark, tmp_path)
    segs = sorted(
        int(d.split("=")[1]) for d in os.listdir(logdir) if d.startswith("seg=")
    )
    t = MorTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 8)
    cfg = PipelineConfig(delete_encoding="eq")
    from datax_spark.streaming.pipeline import apply_batch

    for seg in segs[: len(segs) // 2]:
        ev = spark.read.parquet(os.path.join(logdir, f"seg={seg}"))
        apply_batch(t, ev, batch_id=seg, config=cfg)
    fp_mid = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    snap = t.rebucket(32)
    assert snap.properties["num_buckets"] == 32
    assert not any(snap.deltas.values()) and not any(snap.eq_deletes.values())
    assert state_fingerprint(t.read().orderBy(KEYS).toPandas()) == fp_mid
    for seg in segs[len(segs) // 2:]:
        ev = spark.read.parquet(os.path.join(logdir, f"seg={seg}"))
        apply_batch(t, ev, batch_id=seg, config=cfg)
    got = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    assert got == state_fingerprint(replay_oracle_pandas(log_df.toPandas()))


def test_rebucket_scan_bucket_pruning_uses_new_layout(spark, tmp_path):
    """Post-rebucket, a bucket-key equality scan pins ONE bucket of the
    NEW count (the prune hash reads num_buckets from the snapshot)."""
    log_df, logdir = _make_log(spark, tmp_path, n=3000)
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 4)
    apply_segments(spark, t, logdir)
    t.rebucket(16)
    some_repo = t.read().select("repo").first()["repo"]
    plan = t.plan_scan([("repo", "=", some_repo)])
    assert len(plan["buckets"]) == 1
    want = t.read().filter(f"repo = '{some_repo}'").count()
    got = t.scan([("repo", "=", some_repo)]).count()
    assert got == want > 0
