"""Row-level change feed between snapshots (Delta CDF analog)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.mor import MorTable
from datax_spark.lake.table import LakeTable
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


BATCH0 = [
    ("r1", "p", "c", "py", "a", "insert", 1),
    ("r2", "p", "c", "py", "b", "insert", 2),
    ("r3", "p", "c", "py", "c", "insert", 3),
    ("r4", "p", "c", "py", "d", "insert", 4),
]
BATCH1 = [
    ("r1", "p", "c", "py", "a2", "update", 10),   # update
    ("r2", "p", "c", "py", None, "delete", 11),   # delete
    ("r5", "p", "c", "py", "e", "insert", 12),    # insert
    ("r3", "p", "c", "py", "c", "update", 13),    # same row -> NO change
]
WANT = sorted([
    ("r1", "a", "update_preimage"),
    ("r1", "a2", "update_postimage"),
    ("r2", "b", "delete"),
    ("r5", "e", "insert"),
])


def _feed(table, v):
    return sorted(
        (r["repo"], r["content"], r["_change_type"])
        for r in table.read_changes(v).collect()
    )


@pytest.mark.parametrize("cls", [LakeTable, MorTable], ids=["cow", "mor"])
def test_change_feed_classifies_row_changes(spark, tmp_path, cls):
    table = cls.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=KEYS,
        bucket_key="repo", num_buckets=4,
    )
    apply_batch(table, _events(spark, BATCH0), 0)
    v1 = table.current_version()
    apply_batch(table, _events(spark, BATCH1), 1)
    got = _feed(table, v1)
    assert got == WANT
    # every change carries the commit version that produced it
    versions = {r["_commit_version"] for r in table.read_changes(v1).collect()}
    assert versions == {table.current_version()}
    # empty range
    assert table.read_changes(table.current_version()).count() == 0


def test_change_feed_multi_commit_attribution(spark, tmp_path):
    """A 2-commit range attributes each change to its own commit, and a
    key modified twice appears once per commit."""
    table = LakeTable.create(
        spark, str(tmp_path / "t2"), SCHEMA, key_cols=KEYS,
        bucket_key="repo", num_buckets=4,
    )
    apply_batch(table, _events(spark, BATCH0), 0)
    v1 = table.current_version()
    apply_batch(table, _events(spark, [
        ("r1", "p", "c", "py", "a2", "update", 10),
    ]), 1)
    v2 = table.current_version()
    apply_batch(table, _events(spark, [
        ("r1", "p", "c", "py", "a3", "update", 20),
        ("r9", "p", "c", "py", "z", "insert", 21),
    ]), 2)
    feed = table.read_changes(v1)
    per_version = {
        (r["repo"], r["_change_type"], r["_commit_version"]): r["content"]
        for r in feed.collect()
    }
    assert per_version[("r1", "update_postimage", v2)] == "a2"
    assert per_version[("r1", "update_preimage", v2)] == "a"
    assert per_version[("r1", "update_postimage", v2 + 1)] == "a3"
    assert per_version[("r9", "insert", v2 + 1)] == "z"


def test_change_feed_reads_only_changed_buckets(spark, tmp_path):
    """The diff's scans must touch only buckets the commit changed: with
    one key updated, the plan reads 1 bucket's files at both versions,
    not the table."""
    table = LakeTable.create(
        spark, str(tmp_path / "t3"), SCHEMA, key_cols=KEYS,
        bucket_key="repo", num_buckets=8,
    )
    apply_batch(table, _events(
        spark,
        [(f"r{i}", "p", "c", "py", "x", "insert", i) for i in range(50)],
    ), 0)
    v1 = table.current_version()
    apply_batch(table, _events(spark, [
        ("r7", "p", "c", "py", "x2", "update", 100),
    ]), 1)
    snap1, snap2 = table.snapshot(v1), table.snapshot()
    changed = [b for b in snap2.buckets
               if snap1.buckets.get(b) != snap2.buckets[b]]
    assert len(changed) == 1  # single-key batch touched one bucket
    feed = table.read_changes(v1)
    got = sorted((r["repo"], r["content"], r["_change_type"])
                 for r in feed.collect())
    assert got == [("r7", "x", "update_preimage"), ("r7", "x2", "update_postimage")]
    # all file scans in the plan belong to the changed bucket's files
    plan = feed._jdf.queryExecution().executedPlan().toString()
    for b in snap2.buckets:
        if b not in changed:
            for rel in snap2.buckets[b]:
                assert rel.split("/")[-1] not in plan


def test_change_feed_across_schema_evolution(spark, tmp_path):
    """Old-snapshot rows read with NULL in evolved columns; the diff
    still classifies correctly."""
    table = LakeTable.create(
        spark, str(tmp_path / "t4"), SCHEMA, key_cols=KEYS,
        bucket_key="repo", num_buckets=4,
    )
    apply_batch(table, _events(spark, BATCH0), 0)
    v1 = table.current_version()
    evolved = spark.createDataFrame(
        [("r1", "p", "c", "py", "a", "update", 10, 42)],
        "repo string, path string, commit string, lang string, "
        "content string, op string, seq long, size_bytes long",
    )
    apply_batch(table, evolved, 1)
    feed = {(r["repo"], r["_change_type"]): r
            for r in table.read_changes(v1).collect()}
    # same content but size_bytes NULL -> 42 is still a row change
    assert feed[("r1", "update_preimage")]["size_bytes"] is None
    assert feed[("r1", "update_postimage")]["size_bytes"] == 42


def test_change_feed_skips_rewrite_only_commits(spark, tmp_path):
    """Compaction / clustered rewrites move files without changing rows;
    the feed must skip those commit pairs outright (round 5: each
    compaction pair cost a full changed-bucket exceptAll that provably
    nets zero — most of every sync in the sustained DV-mirror run)."""
    import os

    from pyspark.sql import functions as F

    from datax_spark.lake.mor import MorTable
    from datax_spark.streaming.pipeline import apply_batch

    schema = StructType(
        [StructField(c, StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )

    def rows(lo, hi, seq):
        return spark.range(lo, hi).select(
            F.concat(F.lit("r"), F.col("id")).alias("repo"),
            F.lit("p").alias("path"), F.lit("c").alias("commit"),
            F.lit("py").alias("lang"),
            F.concat(F.lit("v"), F.lit(seq), F.lit("-"), F.col("id"))
            .alias("content"),
            F.lit("insert").alias("op"),
            (F.lit(seq * 1000) + F.col("id")).alias("seq"),
        )

    t = MorTable.create(
        spark, os.path.join(str(tmp_path), "t"), schema,
        ["repo", "path", "commit"], "repo", num_buckets=4,
    )
    apply_batch(t, rows(0, 50, 1), 0)          # v2 (create is v1)
    v_apply = t.current_version()
    t.compact(max_files_per_bucket=0)          # v3: pure rewrite
    v_after_compact = t.current_version()
    apply_batch(t, rows(25, 75, 2), 1)         # next data commit
    head = t.current_version()

    # the compaction commit is marked and contributes no feed rows
    assert t.snapshot(v_after_compact).rewrite_only
    assert t.read_changes(v_apply, v_after_compact).count() == 0

    # the full-range feed still carries the second apply's changes
    feed = t.read_changes(v_apply, head)
    kinds = {
        r["_change_type"]: n
        for r, n in (
            (row, row["n"])
            for row in feed.groupBy("_change_type").agg(
                F.count("*").alias("n")
            ).collect()
        )
    }
    assert kinds.get("insert") == 25          # repos 50..74 are new
    assert kinds.get("update_postimage") == 25  # repos 25..49 updated
    assert kinds.get("update_preimage") == 25


@pytest.mark.parametrize(
    "mode", ["inline", "eq", "patch"]
)
def test_change_feed_key_restricted_fast_path(spark, tmp_path, mode):
    """A small append-only MOR commit diffs KEY-RESTRICTED (round 5):
    only keys in the appended delta/eq files can change, so both
    version reads semi-join on that key set before resolution — the
    diff is O(batch), not O(changed-bucket state). The fast path must
    (a) actually engage for a small batch over a big base, and
    (b) produce the exact frame the full-bucket fallback produces, in
    every delete encoding and in patch mode."""
    import os

    from datax_spark.streaming.pipeline import PipelineConfig

    schema = StructType(
        [StructField(c, StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )
    t = MorTable.create(
        spark, os.path.join(str(tmp_path), f"t_{mode}"), schema,
        ["repo", "path", "commit"], "repo", num_buckets=4,
    )
    base = spark.range(0, 4000).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.lit("p").alias("path"), F.lit("c").alias("commit"),
        F.lit("py").alias("lang"),
        F.concat(F.lit("body-"), F.col("id"),
                 F.lit("x" * 120)).alias("content"),
        F.lit("insert").alias("op"),
        F.col("id").alias("seq"),
    )
    apply_batch(t, base, 0)
    t.compact(max_files_per_bucket=0)
    v0 = t.current_version()

    cfg = PipelineConfig(
        delete_encoding="eq" if mode == "eq" else "inline",
        write_mode="update" if mode == "patch" else "replace",
    )
    small = _events(spark, [
        ("r7", "p", "c", "py", "A2", "update", 100_000),
        ("r9", "p", "c", None, None, "delete", 100_001),
        ("rNEW", "p", "c", "py", "fresh", "insert", 100_002),
        # patch mode: NULL lang keeps the old column value
        ("r11", "p", "c", None, "B2", "update", 100_003),
    ])
    apply_batch(t, small, 1, cfg)
    v1 = t.current_version()

    # the small commit is append-only and far below the byte threshold;
    # patch mode refuses the single-pass diff (pre/post images need the
    # coalescing resolution) and rides the generic arm in BOTH runs
    appended = t._appended_files(t.snapshot(v0), t.snapshot(v1))
    if mode == "patch":
        assert appended is None
    else:
        assert appended is not None
        added_delta, added_eq, restrict = appended
        assert restrict  # small batch over a big base
        assert bool(added_eq) == (mode == "eq")

    def canon(df):
        return sorted(
            (
                (r["repo"], r["lang"], r["content"], r["_change_type"])
                for r in df.collect()
            ),
            key=lambda x: tuple("" if v is None else v for v in x),
        )

    fast_df = t.read_changes(v0, v1)
    if mode != "patch":
        # plan pin: the restricted single-pass diff broadcasts the
        # batch's key set — never a sort-merge/nested-loop join, and
        # no full-state exceptAll shape
        fast_df.count()
        plan = fast_df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        assert "NestedLoop" not in plan and "Cartesian" not in plan
        assert "BroadcastHashJoin" in plan
    fast = canon(fast_df)
    orig = MorTable._appended_files
    MorTable._appended_files = lambda self, a, b: None
    try:
        slow = canon(t.read_changes(v0, v1))
    finally:
        MorTable._appended_files = orig
    assert fast == slow
    if mode != "patch":
        # the UNRESTRICTED single-pass arm (bulk-shaped gate outcome)
        # must also match
        MorTable._appended_files = (
            lambda self, a, b, _o=orig: (
                (lambda r: r if r is None else (r[0], r[1], False))(
                    _o(self, a, b)
                )
            )
        )
        try:
            bulk_arm = canon(t.read_changes(v0, v1))
        finally:
            MorTable._appended_files = orig
        assert bulk_arm == slow
    want_lang = "py" if mode != "patch" else "py"  # patch keeps old lang
    assert ("r7", want_lang, "A2", "update_postimage") in fast
    assert ("rNEW", "py", "fresh", "insert") in fast
    deletes = [x for x in fast if x[3] == "delete"]
    assert [x[0] for x in deletes] == ["r9"]
    if mode == "patch":
        # NULL incoming column kept the 4000-batch value
        post = [x for x in fast if x[0] == "r11" and x[3] == "update_postimage"]
        assert post and post[0][1] == "py" and post[0][2] == "B2"

    # a big batch (most keys rewritten) still single-passes, but the
    # byte gate must turn the key-restriction semi-join OFF — and the
    # feed must match the generic diff there too
    big = base.withColumn("seq", F.col("seq") + F.lit(200_000)).withColumn(
        "content", F.concat(F.col("content"), F.lit("!")))
    apply_batch(t, big, 2, cfg)
    appended2 = t._appended_files(t.snapshot(v1), t.snapshot())
    if mode == "patch":
        assert appended2 is None
    else:
        assert appended2 is not None and appended2[2] is False
        fast2 = canon(t.read_changes(v1))
        MorTable._appended_files = lambda self, a, b: None
        try:
            slow2 = canon(t.read_changes(v1))
        finally:
            MorTable._appended_files = orig
        assert fast2 == slow2
        # every surviving base key was rewritten with new content
        kinds = {x[3] for x in fast2}
        assert kinds == {"update_preimage", "update_postimage", "insert"}
