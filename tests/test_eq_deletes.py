"""Equality-delete files (Iceberg v2 delete-file analog) on MOR tables.

delete_encoding='eq' routes delete ops into narrow (key, _seq) files
committed atomically with the upsert delta; reads broadcast the per-key
max delete seq and filter base+delta before resolution. Reference
semantics being re-expressed: otswriter DeleteRow vs PutRow op taxonomy
(otswriter/.../model/OTSOpType.java) with DataX's seq total order.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from datax_spark.lake.mor import SEQ_META, MorTable, eq_delete_schema
from datax_spark.oracle import replay_oracle_pandas, state_fingerprint
from datax_spark.sources.changelog import generate_changelog, write_segments
from datax_spark.streaming.pipeline import PipelineConfig, apply_segments

SCHEMA = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
KEYS = ["repo", "path", "commit"]


def _make_log(spark, tmp_path, n=6000):
    logdir = str(tmp_path / "log")
    df = generate_changelog(
        spark, n_events=n, n_keys=n // 8, events_per_segment=n // 4
    )
    write_segments(df, logdir)
    return df, logdir


def test_eq_delete_apply_matches_oracle_and_inline(spark, tmp_path):
    """Same log, two delete encodings -> identical final state, both
    equal to the pandas replay oracle."""
    log_df, logdir = _make_log(spark, tmp_path)
    t_eq = MorTable.create(spark, str(tmp_path / "te"), SCHEMA, KEYS, "repo", 8)
    t_in = MorTable.create(spark, str(tmp_path / "ti"), SCHEMA, KEYS, "repo", 8)
    ms = apply_segments(
        spark, t_eq, logdir, config=PipelineConfig(delete_encoding="eq")
    )
    apply_segments(spark, t_in, logdir, config=PipelineConfig())
    assert all(m.applied for m in ms)
    snap = t_eq.snapshot()
    assert any(snap.eq_deletes.values()), "deletes landed as eq files"
    fp_eq = state_fingerprint(t_eq.read().orderBy(KEYS).toPandas())
    fp_in = state_fingerprint(t_in.read().orderBy(KEYS).toPandas())
    want = state_fingerprint(replay_oracle_pandas(log_df.toPandas()))
    assert fp_eq == want and fp_in == want


def test_eq_delete_files_are_narrow(spark, tmp_path):
    """Delete files carry ONLY key columns + _seq — the whole point of
    the encoding at 100 TB (payload width never hits the delete path)."""
    _, logdir = _make_log(spark, tmp_path, n=3000)
    t = MorTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 8)
    apply_segments(spark, t, logdir, config=PipelineConfig(delete_encoding="eq"))
    snap = t.snapshot()
    files = [
        os.path.join(t.path, rel)
        for fs in snap.eq_deletes.values() for rel in fs
    ]
    assert files
    got = spark.read.parquet(files[0])
    assert set(got.columns) == set(KEYS) | {SEQ_META}
    want_schema = eq_delete_schema(snap.schema, KEYS)
    assert {f.name for f in want_schema.fields} == set(got.columns)


def test_eq_delete_compact_folds_and_vacuum_reclaims(spark, tmp_path):
    log_df, logdir = _make_log(spark, tmp_path, n=4000)
    t = MorTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 8)
    apply_segments(spark, t, logdir, config=PipelineConfig(delete_encoding="eq"))
    fp_before = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    eq_files = [
        os.path.join(t.path, rel)
        for fs in t.snapshot().eq_deletes.values() for rel in fs
    ]
    assert eq_files
    stats = t.compact()
    assert stats["compacted_buckets"] > 0
    snap = t.snapshot()
    assert not any(snap.eq_deletes.values()), "compaction clears eq lists"
    assert not any(snap.deltas.values())
    assert state_fingerprint(t.read().orderBy(KEYS).toPandas()) == fp_before
    t.vacuum(keep_last=1)
    assert not any(os.path.exists(f) for f in eq_files), "vacuum reclaims"
    assert state_fingerprint(t.read().orderBy(KEYS).toPandas()) == fp_before


def test_eq_delete_replay_fenced(spark, tmp_path):
    log_df, logdir = _make_log(spark, tmp_path, n=3000)
    t = MorTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 8)
    cfg = PipelineConfig(delete_encoding="eq")
    apply_segments(spark, t, logdir, config=cfg)
    fp = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    n_eq = sum(len(fs) for fs in t.snapshot().eq_deletes.values())
    ms = apply_segments(spark, t, logdir, config=cfg, start_after_batch=-1)
    assert all(not m.applied for m in ms)
    assert sum(len(fs) for fs in t.snapshot().eq_deletes.values()) == n_eq
    assert state_fingerprint(t.read().orderBy(KEYS).toPandas()) == fp


def test_eq_delete_then_reinsert_and_stale_delete(spark, tmp_path):
    """Cross-batch op interleavings: delete-then-reinsert revives the
    key; a delete never kills rows NEWER than its own seq."""
    t = MorTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 4)
    cfg = PipelineConfig(delete_encoding="eq")
    from datax_spark.streaming.pipeline import apply_batch

    def batch(rows):
        return spark.createDataFrame(
            [(r[0], "p", "c", "na", r[1], r[2], r[3]) for r in rows],
            "repo string, path string, commit string, lang string, "
            "content string, op string, seq long",
        )

    # batch 0: insert k1, k2, k3
    apply_batch(t, batch([("k1", "a", "insert", 1), ("k2", "b", "insert", 2),
                          ("k3", "c", "insert", 3)]), 0, cfg)
    # batch 1: delete k1, update k2
    apply_batch(t, batch([("k1", None, "delete", 10),
                          ("k2", "b2", "update", 11)]), 1, cfg)
    # batch 2: re-insert k1 (newer than its delete), delete k3
    apply_batch(t, batch([("k1", "a2", "insert", 20),
                          ("k3", None, "delete", 21)]), 2, cfg)
    got = {
        r["repo"]: r["content"]
        for r in t.read().select("repo", "content").collect()
    }
    assert got == {"k1": "a2", "k2": "b2"}
    # compaction preserves exactly that state
    t.compact()
    got2 = {
        r["repo"]: r["content"]
        for r in t.read().select("repo", "content").collect()
    }
    assert got2 == got


def test_eq_delete_with_patch_rows(spark, tmp_path):
    """A patch AFTER an eq-delete rebuilds the row from NULLs (the
    delete is a barrier): columns set only before the delete are gone."""
    schema = StructType(
        list(SCHEMA.fields) + [StructField("val", DoubleType())]
    )
    t = MorTable.create(spark, str(tmp_path / "t"), schema, KEYS, "repo", 4)
    from datax_spark.streaming.pipeline import apply_batch

    def batch(rows):
        return spark.createDataFrame(
            [(r[0], "p", "c", "na", r[1], r[2], r[3], r[4]) for r in rows],
            "repo string, path string, commit string, lang string, "
            "content string, val double, op string, seq long",
        )

    full = PipelineConfig(delete_encoding="eq")
    patch = PipelineConfig(delete_encoding="eq", write_mode="update")
    # k1: insert with val -> eq-delete -> patch content only
    apply_batch(t, batch([("k1", "x", 1.5, "insert", 1)]), 0, full)
    apply_batch(t, batch([("k1", None, None, "delete", 10)]), 1, full)
    apply_batch(t, batch([("k1", "y", None, "update", 20)]), 2, patch)
    rows = t.read().select("repo", "content", "val").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["content"] == "y" and r["val"] is None, r


def test_eq_delete_read_plan_never_shuffles_base(spark, tmp_path):
    """The eq filter joins are BROADCAST joins: the base side is still
    scan -> broadcast joins -> union; every hash Exchange in the plan is
    delta- or delete-file-sized (test_mor's invariant extended)."""
    log_df, logdir = _make_log(spark, tmp_path, n=4000)
    t = MorTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 8)
    segs = sorted(
        int(d.split("=")[1]) for d in os.listdir(logdir) if d.startswith("seg=")
    )
    from datax_spark.streaming.pipeline import apply_batch
    cfg = PipelineConfig(delete_encoding="eq")
    for seg in segs[:2]:
        ev = spark.read.parquet(os.path.join(logdir, f"seg={seg}"))
        apply_batch(t, ev, batch_id=seg, config=cfg)
    t.compact()  # -> base files
    for seg in segs[2:]:
        ev = spark.read.parquet(os.path.join(logdir, f"seg={seg}"))
        apply_batch(t, ev, batch_id=seg, config=cfg)
    snap = t.snapshot()
    assert any(snap.buckets.values()) and any(snap.eq_deletes.values())
    plan = t.read()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # hash exchanges: exactly the delta dedup + ONE tiny eq-dmax
    # aggregation (whole-row mode filters the resolved output once) —
    # never a base-sized one (that would show as SortMergeJoin)
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    got = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    want = state_fingerprint(replay_oracle_pandas(log_df.toPandas()))
    assert got == want


def test_eq_delete_streaming_tail(spark, tmp_path):
    """Structured Streaming tail with delete_encoding='eq': same final
    state as the replay oracle; auto-compaction folds the delete files
    along the way (streamed MOR stays bounded)."""
    from pyspark.sql.types import IntegerType, LongType, TimestampType

    from datax_spark.streaming.pipeline import tail_and_apply

    log_df, logdir = _make_log(spark, tmp_path, n=4000)
    ev_schema = StructType(
        [StructField(c, StringType()) for c in
         ["repo", "path", "commit", "lang", "content", "op"]]
        + [StructField("seq", LongType()),
           StructField("ts", TimestampType()),
           StructField("batch_file", IntegerType())]
    )
    t = MorTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 8)
    cfg = PipelineConfig(
        delete_encoding="eq", auto_compact=True,
        compact_options={"max_files_per_bucket": 4},
    )
    tail_and_apply(
        spark, t.path, logdir, str(tmp_path / "ckpt"), ev_schema,
        config=cfg, max_files_per_trigger=4,
    )
    got = state_fingerprint(t.read().orderBy(KEYS).toPandas())
    want = state_fingerprint(replay_oracle_pandas(log_df.toPandas()))
    assert got == want
    snap = t.snapshot()
    assert all(
        len(snap.buckets.get(b, [])) + len(snap.deltas.get(b, []))
        + len(snap.eq_deletes.get(b, [])) <= 4
        for b in set(snap.buckets) | set(snap.deltas) | set(snap.eq_deletes)
    ), "auto-compaction bounded fragmentation incl. delete files"


def test_eq_delete_rejected_on_cow(spark, tmp_path):
    from datax_spark.lake.table import LakeTable
    from datax_spark.streaming.pipeline import apply_batch

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 4)
    ev = spark.createDataFrame(
        [("k", "p", "c", "na", "x", "insert", 1)],
        "repo string, path string, commit string, lang string, "
        "content string, op string, seq long",
    )
    import pytest

    with pytest.raises(ValueError, match="merge-on-read"):
        apply_batch(t, ev, 0, PipelineConfig(delete_encoding="eq"))
