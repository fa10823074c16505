"""Manifest-level file skipping (lake/stats.py + LakeTable.scan).

The write path harvests per-file [min, max] parquet-footer bounds for the
table's ``stats_cols`` into the snapshot; ``scan(filters=...)`` then
prunes buckets (bucket-key equality) and base files (range bounds)
driver-side before Spark plans the read. Every test checks BOTH that
pruning happened (plan_scan counters) and that the result equals the
unpruned read + filter — pruning must never change answers.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from datax_spark.lake.mor import MorTable
from datax_spark.lake.stats import file_survives
from datax_spark.lake.table import LakeTable

SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("seq", LongType()),
        StructField("content", StringType()),
    ]
)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.col("id").alias("seq"),
        F.concat(F.lit("c"), F.col("id")).alias("content"),
    )


def _seqs(df):
    return sorted(r["seq"] for r in df.select("seq").collect())


# ------------------------------------------------------------------ unit
def test_file_survives_ops():
    st = {"seq": [100, 199]}
    assert file_survives(st, [("seq", ">=", 150)])
    assert file_survives(st, [("seq", ">=", 199)])
    assert not file_survives(st, [("seq", ">", 199)])
    assert not file_survives(st, [("seq", ">=", 200)])
    assert file_survives(st, [("seq", "<", 101)])
    assert not file_survives(st, [("seq", "<", 100)])
    assert file_survives(st, [("seq", "<=", 100)])
    assert file_survives(st, [("seq", "=", 100)])
    assert not file_survives(st, [("seq", "=", 99)])
    # conjunction: any single excluding term prunes
    assert not file_survives(st, [("seq", ">=", 150), ("seq", "<", 50)])
    # terms are checked independently: a jointly-unsatisfiable pair where
    # each term alone overlaps the bounds conservatively KEEPS the file
    # (the residual predicate then returns zero rows — sound, not wrong)
    assert file_survives(st, [("seq", ">=", 150), ("seq", "<", 120)])


def test_file_survives_is_conservative():
    # no stats / unknown column / incomparable literal -> keep the file
    assert file_survives(None, [("seq", "=", 5)])
    assert file_survives({}, [("seq", "=", 5)])
    assert file_survives({"other": [0, 1]}, [("seq", "=", 5)])
    assert file_survives({"seq": [0, 10]}, [("seq", ">", "zzz")])


# ------------------------------------------------------------------- COW
def test_cow_scan_prunes_files_and_matches_read(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo"], "repo",
        num_buckets=4, stats_cols=["seq"],
    )
    for i in range(4):
        t.append_insert_only(_rows(spark, i * 100, (i + 1) * 100), batch_id=i)
    snap = t.snapshot()
    assert snap.file_stats, "stats_cols table must record footer bounds"

    filters = [("seq", ">=", 300)]
    plan = t.plan_scan(filters)
    assert plan["files_total"] > plan["files_kept"] > 0
    # each append commit covers one seq century: only batch 3's files survive
    assert plan["files_kept"] <= plan["files_total"] // 4 + 1
    assert _seqs(t.scan(filters)) == _seqs(
        t.read().filter(F.col("seq") >= 300)
    ) == list(range(300, 400))


def test_cow_scan_bucket_pruning_on_key_equality(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo"], "repo",
        num_buckets=8, stats_cols=["seq"],
    )
    t.append_insert_only(_rows(spark, 0, 200), batch_id=0)
    plan = t.plan_scan([("repo", "=", "r42")])
    assert len(plan["buckets"]) == 1
    rows = t.scan([("repo", "=", "r42")]).collect()
    assert [(r["repo"], r["seq"]) for r in rows] == [("r42", 42)]


def test_stats_survive_reload_compact_and_vacuum(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo"], "repo",
        num_buckets=4, stats_cols=["seq"],
    )
    for i in range(3):
        t.append_insert_only(_rows(spark, i * 100, (i + 1) * 100), batch_id=i)
    # sharded refs round-trip: a fresh handle sees identical stats
    t2 = LakeTable(spark, str(tmp_path / "t"))
    assert t2.snapshot().file_stats == t.snapshot().file_stats

    # compaction rewrites buckets -> fresh stats harvested for new files
    t.compact(max_files_per_bucket=1)
    snap = t.snapshot()
    for b, files in snap.buckets.items():
        assert set(snap.file_stats.get(b, {})) == set(files)
        for bounds in snap.file_stats[b].values():
            lo, hi = bounds["seq"]
            assert 0 <= lo <= hi <= 299
    t.vacuum(keep_last=1)
    assert _seqs(t.scan([("seq", "<", 100)])) == list(range(100))


def test_scan_correct_without_stats(spark, tmp_path):
    # stats are opt-in: default tables never prune files but scan still
    # applies the predicate
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo"], "repo", num_buckets=4,
    )
    t.append_insert_only(_rows(spark, 0, 100), batch_id=0)
    t.append_insert_only(_rows(spark, 100, 200), batch_id=1)
    plan = t.plan_scan([("seq", ">=", 150)])
    assert plan["files_kept"] == plan["files_total"]
    assert _seqs(t.scan([("seq", ">=", 150)])) == list(range(150, 200))


# ------------------------------------------------------------------- MOR
MOR_SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("ts_ms", LongType()),
        StructField("content", StringType()),
    ]
)


def _mor_changes(spark, lo, hi, op="insert"):
    return spark.range(lo, hi).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.col("id").alias("ts_ms"),
        F.concat(F.lit("c"), F.col("id")).alias("content"),
        F.lit(op).alias("op"),
        F.col("id").alias("seq"),
    )


def _mor_with_base(spark, tmp_path):
    """Base files bounded to ts_ms [0, 99] (compacted batch 0), plus a
    live delta batch covering [100, 199]."""
    t = MorTable.create(
        spark, str(tmp_path / "m"), MOR_SCHEMA, ["repo"], "repo",
        num_buckets=4, stats_cols=["ts_ms"],
    )
    t.apply_deduped(_mor_changes(spark, 0, 100), batch_id=0)
    # fold batch 0 into BASE files with [0, 99] bounds (threshold 0
    # forces folding even single-delta-file buckets)
    t.compact(max_files_per_bucket=0)
    t.apply_deduped(_mor_changes(spark, 100, 200), batch_id=1)
    return t


def test_mor_scan_prunes_base_never_deltas(spark, tmp_path):
    t = _mor_with_base(spark, tmp_path)
    filters = [("ts_ms", ">=", 150)]
    plan = t.plan_scan(filters)
    # every base file's [0, 99] bounds fail ts_ms >= 150
    assert plan["files_total"] > 0 and plan["files_kept"] == 0
    got = sorted(r["ts_ms"] for r in t.scan(filters).collect())
    want = sorted(r["ts_ms"] for r in t.read().filter(F.col("ts_ms") >= 150).collect())
    assert got == want == list(range(150, 200))


def test_mor_scan_delta_resurrects_pruned_base_key(spark, tmp_path):
    # a delta UPDATE moves a base key into the filtered range: its base
    # file is pruned (bounds [0, 99]) but the delta image must appear
    t = _mor_with_base(spark, tmp_path)
    upd = spark.createDataFrame(
        [("r5", 1000, "updated", "update", 500)],
        "repo string, ts_ms long, content string, op string, seq long",
    )
    t.apply_deduped(upd, batch_id=2)
    rows = t.scan([("ts_ms", ">=", 500)]).collect()
    assert [(r["repo"], r["ts_ms"], r["content"]) for r in rows] == [
        ("r5", 1000, "updated")
    ]


def test_mor_patch_mode_disables_file_pruning(spark, tmp_path):
    """The unsound case the guard exists for: a patch delta sets ts_ms
    into the filtered range but leaves content NULL — the resolved row's
    content comes from the BASE old image, whose file the ts_ms bounds
    would have pruned. mor_patch must force the full base read."""
    t = _mor_with_base(spark, tmp_path)
    patch = spark.createDataFrame(
        [("r5", 1000, None, "update", 500)],
        "repo string, ts_ms long, content string, op string, seq long",
    )
    t.apply_deduped(patch, batch_id=2, patch=True)
    assert t.snapshot().properties.get("mor_patch")
    # with pruning forced on, the base file holding r5's old image dies
    assert t.plan_scan([("ts_ms", ">=", 500)])["files_kept"] == 0
    rows = t.scan([("ts_ms", ">=", 500)]).collect()
    assert [(r["repo"], r["ts_ms"], r["content"]) for r in rows] == [
        ("r5", 1000, "c5")  # content coalesced from the base old image
    ]


# ------------------------------------------------------ clustered rewrite
def test_cow_rewrite_clustered_enables_intra_bucket_pruning(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo"], "repo",
        num_buckets=4, stats_cols=["seq"],
    )
    t.bulk_load(_rows(spark, 0, 4000))
    # hash-bucketed bulk files span the full seq range: nothing prunes
    p0 = t.plan_scan([("seq", ">=", 3900)])
    assert p0["files_kept"] == p0["files_total"]

    t.rewrite_clustered(["seq"], target_file_rows=250)
    p1 = t.plan_scan([("seq", ">=", 3900)])
    assert p1["files_total"] >= 8, "buckets must split into bounded files"
    # sorted bounded files have near-disjoint ranges: a top-2.5% scan
    # keeps ~1 file per bucket
    assert 0 < p1["files_kept"] <= p1["files_total"] // 2
    assert _seqs(t.scan([("seq", ">=", 3900)])) == list(range(3900, 4000))
    assert _seqs(t.scan([("seq", "<", 100)])) == list(range(100))
    assert t.count() == 4000


def test_mor_rewrite_clustered_folds_deltas_and_matches(spark, tmp_path):
    t = _mor_with_base(spark, tmp_path)  # base [0, 99] + delta [100, 199]
    dele = spark.createDataFrame(
        [("r7", None, None, "delete", 300)],
        "repo string, ts_ms long, content string, op string, seq long",
    )
    t.apply_deduped(dele, batch_id=2)
    want = sorted(
        (r["repo"], r["ts_ms"], r["content"]) for r in t.read().collect()
    )
    t.rewrite_clustered(["ts_ms"], target_file_rows=25)
    snap = t.snapshot()
    assert not any(snap.deltas.values()), "rewrite folds deltas"
    got = sorted(
        (r["repo"], r["ts_ms"], r["content"]) for r in t.read().collect()
    )
    assert got == want and ("r7", 7, "c7") not in got
    plan = t.plan_scan([("ts_ms", ">=", 150)])
    assert 0 < plan["files_kept"] < plan["files_total"]
    assert sorted(r["ts_ms"] for r in t.scan([("ts_ms", ">=", 150)]).collect()) == list(
        range(150, 200)
    )


def test_mor_rewrite_clears_patch_flag(spark, tmp_path):
    t = _mor_with_base(spark, tmp_path)
    patch = spark.createDataFrame(
        [("r5", 1000, None, "update", 500)],
        "repo string, ts_ms long, content string, op string, seq long",
    )
    t.apply_deduped(patch, batch_id=2, patch=True)
    t.rewrite_clustered(["ts_ms"], target_file_rows=25)
    # patch deltas drained -> cheap resolution + file pruning re-enabled
    assert not t.snapshot().properties.get("mor_patch")
    rows = t.scan([("ts_ms", ">=", 500)]).collect()
    assert [(r["repo"], r["ts_ms"], r["content"]) for r in rows] == [
        ("r5", 1000, "c5")  # coalesce happened at rewrite time
    ]


def test_metadata_only_count(spark, tmp_path):
    """count(metadata_only=True): zero Spark jobs, answered from the
    manifest's footer row counts; equals the real count across appends,
    merge rewrites, and compaction."""
    import os as _os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from datax_spark.lake.table import LakeTable
    from datax_spark.operators.merge import merge_apply

    schema = StructType(
        [StructField("k", LongType()), StructField("v", StringType())]
    )
    t = LakeTable.create(
        spark, _os.path.join(str(tmp_path), "mc"), schema, ["k"], "k",
        num_buckets=4, stats_cols=["k"],
    )
    t.append_insert_only(
        spark.createDataFrame([(i, "a") for i in range(50)], schema), batch_id=0
    )
    assert t.count(metadata_only=True) == 50 == t.count()
    # merge with deletes rewrites buckets; counts must track
    merge_apply(
        t,
        spark.createDataFrame(
            [(1, "delete", 100, None), (99, "insert", 101, "n")],
            "k long, op string, seq long, v string",
        ),
        1,
    )
    assert t.count(metadata_only=True) == 50 == t.count()
    t.compact(max_files_per_bucket=1)
    assert t.count(metadata_only=True) == 50


def test_metadata_count_requires_stats(spark, tmp_path):
    import os as _os

    import pytest as _pytest
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from datax_spark.lake.table import LakeTable

    schema = StructType(
        [StructField("k", LongType()), StructField("v", StringType())]
    )
    t = LakeTable.create(
        spark, _os.path.join(str(tmp_path), "ns"), schema, ["k"], "k", num_buckets=4
    )
    t.append_insert_only(spark.createDataFrame([(1, "a")], schema), batch_id=0)
    with _pytest.raises(ValueError, match="row-count stats"):
        t.count(metadata_only=True)
