"""Declarative three-clause MERGE INTO (LakeTable.merge_into — the
Delta/Iceberg MERGE analog generalizing the rdbms writers' replace/
update writeModes, CommonRdbmsWriter.java:88-169): join source to the
live table ON the key columns; matched rows delete or update, unmatched
source rows insert — one atomic fenced commit, COW bucket-pruned
rewrite vs MOR O(changes) delta append."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from datax_spark.lake.mor import MorTable
from datax_spark.lake.table import LakeTable

SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("lang", StringType()),
        StructField("n", IntegerType()),
        StructField("content", StringType()),
    ]
)


def _seed(spark, cls, tmp_path, name):
    t = cls.create(
        spark, os.path.join(str(tmp_path), name), SCHEMA, ["repo"], "repo",
        num_buckets=4,
    )
    t.bulk_load(
        spark.createDataFrame(
            [(f"r{i}", "py", i, f"body{i}") for i in range(8)], SCHEMA
        )
    )
    return t


def _src(spark):
    # r2, r5 matched; r5 hits the delete condition; x9 unmatched
    return spark.createDataFrame(
        [
            ("r2", "go", 20, "S2"),
            ("r5", "go", 50, "S5"),
            ("x9", "rs", 90, "S9"),
        ],
        SCHEMA,
    )


def _state(t):
    return {
        r["repo"]: (r["lang"], r["n"], r["content"])
        for r in t.read().collect()
    }


@pytest.mark.parametrize("cls", [LakeTable, MorTable])
def test_three_clause_merge_both_layouts(spark, tmp_path, cls):
    t = _seed(spark, cls, tmp_path, f"m_{cls.__name__}")
    before = t.snapshot()
    t.merge_into(
        _src(spark),
        when_matched_update={
            "content": "concat('MRG:', s.content)",
            "n": F.col("t.n") + F.col("s.n"),  # reads BOTH sides
        },
        when_matched_delete="s.repo = 'r5'",
        when_not_matched_insert="*",
    )
    if cls is MorTable:
        # MOR arm is an O(changes) delta append — base never rewrites
        assert t.snapshot().buckets == before.buckets
    got = _state(t)
    assert got["r2"] == ("py", 22, "MRG:S2")  # updated (lang not SET -> t)
    assert "r5" not in got  # delete clause wins
    assert got["x9"] == ("rs", 90, "S9")  # inserted
    assert got["r0"] == ("py", 0, "body0")  # untouched
    assert len(got) == 8  # 8 seeded - 1 deleted + 1 inserted


def test_cow_and_mor_states_identical(spark, tmp_path):
    states = []
    for cls in (LakeTable, MorTable):
        t = _seed(spark, cls, tmp_path, f"eq_{cls.__name__}")
        t.merge_into(
            _src(spark),
            when_matched_update="*",
            when_matched_delete="length(t.content) % 2 = 0",
            when_not_matched_insert="*",
        )
        states.append(_state(t))
    assert states[0] == states[1]


def test_matched_only_update_ignores_unmatched(spark, tmp_path):
    t = _seed(spark, LakeTable, tmp_path, "mo")
    t.merge_into(_src(spark), when_matched_update="*")
    got = _state(t)
    assert "x9" not in got  # no insert clause: unmatched source IGNORED
    assert got["r2"] == ("go", 20, "S2") and got["r5"] == ("go", 50, "S5")
    assert len(got) == 8


def test_update_condition_gates_the_update_arm(spark, tmp_path):
    t = _seed(spark, LakeTable, tmp_path, "uc")
    t.merge_into(
        _src(spark),
        when_matched_update="*",
        update_condition="s.n >= 30",
        when_not_matched_insert="*",
    )
    got = _state(t)
    assert got["r2"] == ("py", 2, "body2")  # condition false -> untouched
    assert got["r5"] == ("go", 50, "S5")  # condition true -> updated
    assert got["x9"] == ("rs", 90, "S9")  # insert arm unaffected


def test_delete_only_merge(spark, tmp_path):
    t = _seed(spark, MorTable, tmp_path, "do")
    t.merge_into(_src(spark), when_matched_delete=True)
    got = _state(t)
    assert "r2" not in got and "r5" not in got and "x9" not in got
    assert len(got) == 6


def test_insert_dict_fills_unspecified_with_null(spark, tmp_path):
    t = _seed(spark, LakeTable, tmp_path, "ins")
    t.merge_into(
        _src(spark),
        when_not_matched_insert={"content": "concat('I:', s.content)"},
    )
    got = _state(t)
    # keys always from the source row; unspecified payload -> NULL
    assert got["x9"] == (None, None, "I:S9")
    assert got["r2"] == ("py", 2, "body2")  # matched rows untouched


def test_merge_guards(spark, tmp_path):
    t = _seed(spark, LakeTable, tmp_path, "g")
    src = _src(spark)
    with pytest.raises(ValueError, match="at least one clause"):
        t.merge_into(src)
    with pytest.raises(ValueError, match="multiple rows per key"):
        t.merge_into(src.unionByName(src), when_matched_update="*")
    with pytest.raises(ValueError, match="row identity"):
        t.merge_into(src, when_matched_update={"repo": "s.repo"})
    with pytest.raises(ValueError, match="unknown update column"):
        t.merge_into(src, when_matched_update={"nope": "s.content"})
    with pytest.raises(ValueError, match="update_condition without"):
        t.merge_into(src, when_matched_delete=True, update_condition="1=1")
    with pytest.raises(ValueError, match="lacks key columns"):
        t.merge_into(src.drop("repo"), when_matched_update="*")
    # all guards fired before any commit
    assert _state(t)["r2"] == ("py", 2, "body2")


def test_empty_source_is_a_no_op(spark, tmp_path):
    t = _seed(spark, LakeTable, tmp_path, "e")
    v = t.snapshot().version
    t.merge_into(
        spark.createDataFrame([], SCHEMA), when_matched_update="*"
    )
    assert t.snapshot().version == v


def test_merge_plan_shape_target_never_shuffles(spark, tmp_path):
    """The 100-TB contract: the matched frame builds with an INNER join
    (broadcastable either side — an outer join can only broadcast its
    non-preserved side, which would force a sort-merge shuffle of the
    full-width target buckets), persists (source-bounded), and all three
    arms read the cache. The only exchanges left are the anti join's two
    source-bounded sides (AQE broadcast-converts them at runtime)."""
    t = _seed(spark, LakeTable, tmp_path, "plan")
    captured = {}
    orig = t._merge_apply_changes

    def cap(chg, batch_id):
        captured["plan"] = (
            chg._jdf.queryExecution().executedPlan().toString()
        )
        return orig(chg, batch_id)

    t._merge_apply_changes = cap
    t.merge_into(
        _src(spark),
        when_matched_update="*",
        when_matched_delete="s.repo = 'r5'",
        when_not_matched_insert="*",
    )
    plan = captured["plan"]
    # delete + update arms and the anti join's key set all hit the cache
    assert plan.count("InMemoryTableScan") == 3, plan
    # the matched-frame join itself is hash-broadcast, never sort-merge
    assert plan.count("BroadcastHashJoin") >= 1
    # remaining exchanges: only the anti join's two source-bounded sides
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_mor_bulk_load_then_dml_roundtrip(spark, tmp_path):
    """Regression: bulk_load on a MorTable used to fail conforming the
    payload frame to the stored schema (meta columns _seq/_op/_patch
    unresolved). Bulk rows land with NULL meta — superseded by any delta
    image and dead to any delete, per the lake/mor.py contracts."""
    t = _seed(spark, MorTable, tmp_path, "blk")
    assert t.count() == 8
    # a delta image supersedes the NULL-seq bulk row
    t.update_where([("repo", "=", "r1")], {"content": F.lit("upd")})
    assert _state(t)["r1"] == ("py", 1, "upd")
    # an eq-delete kills NULL-seq bulk rows (they out-seq nothing)
    t.delete_where([("repo", "=", "r3")])
    got = _state(t)
    assert "r3" not in got and len(got) == 7
