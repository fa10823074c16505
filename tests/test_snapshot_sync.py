"""Snapshot-diff change capture (operators/snapshot_sync.py).

The captureless-CDC contract: diffing a full dump against the live
table produces the minimal insert/update/delete set, applying it makes
the table equal the dump, a re-applied dump is a fenced no-op, and the
diff join never degenerates into a cartesian/nested-loop plan.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.mor import MorTable
from datax_spark.lake.table import LakeTable
from datax_spark.operators.snapshot_sync import apply_snapshot, snapshot_diff
from datax_spark.streaming.pipeline import PipelineConfig, apply_batch

SCHEMA = StructType(
    [StructField(c, StringType()) for c in ["repo", "path", "commit", "lang", "content"]]
)
KEYS = ["repo", "path", "commit"]


def _events(spark, rows):
    """rows: (repo, lang, content, op, seq)"""
    return spark.createDataFrame(
        [(r, "p", "c", lg, ct, op, s) for (r, lg, ct, op, s) in rows],
        ["repo", "path", "commit", "lang", "content", "op", "seq"],
    )


def _dump(spark, rows):
    """rows: (repo, lang, content)"""
    return spark.createDataFrame(
        [(r, "p", "c", lg, ct) for (r, lg, ct) in rows],
        ["repo", "path", "commit", "lang", "content"],
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", num_buckets=4
    )
    cfg = PipelineConfig(quarantine_dir=str(tmp_path / "q"))
    apply_batch(
        t,
        _events(
            spark,
            [
                ("a", None, "x", "insert", 1),   # lang NULL on purpose
                ("b", "py", "y", "insert", 2),
                ("d", "go", "z", "insert", 3),
            ],
        ),
        0,
        cfg,
    )
    return t


def test_diff_classifies_ops_null_safe(spark, table):
    dump = _dump(
        spark,
        [
            ("a", None, "x"),    # identical incl. the NULL lang -> no event
            ("b", "py", "y2"),   # changed content -> update
            ("e", "rs", "w"),    # new key -> insert
            # d missing -> delete
        ],
    )
    got = {
        r["repo"]: r
        for r in snapshot_diff(table, dump, new_seq=10).collect()
    }
    assert set(got) == {"b", "e", "d"}  # 'a' produced NO phantom update
    assert got["b"]["op"] == "update" and got["b"]["content"] == "y2"
    assert got["e"]["op"] == "insert" and got["e"]["content"] == "w"
    assert got["d"]["op"] == "delete" and got["d"]["content"] is None
    assert all(r["seq"] == 10 for r in got.values())


def test_apply_snapshot_converges_and_is_idempotent(spark, table, tmp_path):
    cfg = PipelineConfig(quarantine_dir=str(tmp_path / "q2"))
    dump = _dump(spark, [("a", None, "x"), ("b", "py", "y2"), ("e", "rs", "w")])
    m = apply_snapshot(table, dump, batch_id=1, config=cfg, new_seq=10)
    assert m.applied
    state = {
        r["repo"]: (r["lang"], r["content"])
        for r in table.read().select("repo", "lang", "content").collect()
    }
    assert state == {"a": (None, "x"), "b": ("py", "y2"), "e": ("rs", "w")}
    # the same dump again: the diff is EMPTY (convergence), and the same
    # batch id is a fenced no-op even before the diff question arises
    assert snapshot_diff(table, dump, new_seq=11).count() == 0
    m2 = apply_snapshot(table, dump, batch_id=1, config=cfg, new_seq=11)
    assert not m2.applied


def test_apply_snapshot_mor_resolved(spark, tmp_path):
    t = MorTable.create(
        spark, str(tmp_path / "m"), SCHEMA, KEYS, "repo", num_buckets=4
    )
    cfg = PipelineConfig(quarantine_dir=str(tmp_path / "q"))
    apply_batch(
        t,
        _events(
            spark,
            [("a", "py", "x", "insert", 1), ("b", "py", "y", "insert", 2)],
        ),
        0,
        cfg,
    )
    dump = _dump(spark, [("b", "py", "y9")])  # a deleted, b updated
    apply_snapshot(t, dump, batch_id=1, config=cfg, new_seq=10)
    rows = t.read().select("repo", "content").collect()
    assert {(r["repo"], r["content"]) for r in rows} == {("b", "y9")}


def test_diff_plan_is_one_equi_join(spark, table):
    dump = _dump(spark, [("a", None, "x"), ("e", "rs", "w")])
    plan = snapshot_diff(table, dump, new_seq=10)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
