"""MOR-native predicate DELETE (lake/mor.py delete_where mode='append'):
matching keys append as narrow equality-delete tombstones — no base
rewrite — vs the inherited COW rewrite (mode='rewrite')."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from datax_spark.lake.mor import MorTable
from datax_spark.operators.merge import merge_apply


def _table(spark, tmp_path, name="t"):
    schema = StructType(
        [
            StructField("k", StringType()),
            StructField("v", StringType()),
            StructField("n", IntegerType()),
        ]
    )
    t = MorTable.create(
        spark, os.path.join(str(tmp_path), name), schema, ["k"], "k",
        num_buckets=4,
    )
    merge_apply(
        t,
        spark.createDataFrame(
            [
                ("a", "insert", 1, "va", 1),
                ("b", "insert", 2, "vb", 20),
                ("c", "insert", 3, "vc", 30),
                ("d", "insert", 4, "vd", 2),
            ],
            "k string, op string, seq long, v string, n int",
        ),
        0,
    )
    return t


def test_append_delete_is_rewrite_free(spark, tmp_path):
    t = _table(spark, tmp_path)
    before = t.snapshot()
    t.delete_where([("n", ">=", 10)])
    after = t.snapshot()
    assert {r["k"] for r in t.read().collect()} == {"a", "d"}
    # base file lists untouched — the delete is an eq-tombstone append
    assert after.buckets == before.buckets
    assert any(after.eq_deletes.values())


def test_append_delete_semantics_match_rewrite(spark, tmp_path):
    ta = _table(spark, tmp_path, "a")
    tr = _table(spark, tmp_path, "r")
    ta.delete_where([("n", ">=", 10)], mode="append")
    tr.delete_where([("n", ">=", 10)], mode="rewrite")
    rows_a = sorted(map(tuple, ta.read().collect()))
    rows_r = sorted(map(tuple, tr.read().collect()))
    assert rows_a == rows_r


def test_later_cdc_event_resurrects_key(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where([("k", "=", "b")])
    assert {r["k"] for r in t.read().collect()} == {"a", "c", "d"}
    merge_apply(
        t,
        spark.createDataFrame(
            [("b", "insert", 99, "vb2", 21)],
            "k string, op string, seq long, v string, n int",
        ),
        1,
    )
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got["b"] == "vb2"


def test_compact_folds_tombstones(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where([("n", ">=", 10)])
    t.compact()
    snap = t.snapshot()
    assert not any(snap.eq_deletes.values())
    assert {r["k"] for r in t.read().collect()} == {"a", "d"}


def test_no_match_is_a_noop(spark, tmp_path):
    t = _table(spark, tmp_path)
    v = t.current_version()
    t.delete_where([("n", ">=", 10**6)])
    assert t.current_version() == v
    # second identical delete after a real one also no-ops
    t.delete_where([("k", "=", "a")])
    v = t.current_version()
    t.delete_where([("k", "=", "a")])
    assert t.current_version() == v


def test_delete_where_prunes_to_bucket(spark, tmp_path):
    t = _table(spark, tmp_path)
    plan = t.plan_scan([("k", "=", "b")], prune_files=False)
    assert len(plan["buckets"]) == 1
    t.delete_where([("k", "=", "b")])
    assert {r["k"] for r in t.read().collect()} == {"a", "c", "d"}


def test_unknown_mode_raises(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="mode"):
        t.delete_where([("k", "=", "a")], mode="bogus")


# --------------------------------------------------------------- update_where
def test_update_where_append_no_rewrite(spark, tmp_path):
    t = _table(spark, tmp_path)
    before = t.snapshot()
    t.update_where([("n", ">=", 10)], {"v": F.concat(F.col("v"), F.lit("!"))})
    after = t.snapshot()
    assert after.buckets == before.buckets  # no base rewrite
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {"a": "va", "b": "vb!", "c": "vc!", "d": "vd"}


def test_update_where_sql_string_and_self_reference(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.update_where([("k", "=", "b")], {"n": "n + 100"})
    got = {r["k"]: r["n"] for r in t.read().collect()}
    assert got == {"a": 1, "b": 120, "c": 30, "d": 2}


def test_update_where_can_set_null(spark, tmp_path):
    # full replace images (not patches): SET col = NULL really nulls
    t = _table(spark, tmp_path)
    t.update_where([("k", "=", "c")], {"v": F.lit(None)})
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got["c"] is None and got["a"] == "va"


def test_update_where_rewrite_mode_matches_append(spark, tmp_path):
    ta = _table(spark, tmp_path, "ua")
    tr = _table(spark, tmp_path, "ur")
    ta.update_where([("n", ">=", 10)], {"v": "upper(v)"}, mode="append")
    tr.update_where([("n", ">=", 10)], {"v": "upper(v)"}, mode="rewrite")
    assert sorted(map(tuple, ta.read().collect())) == sorted(
        map(tuple, tr.read().collect())
    )


def test_update_where_guards(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="key/bucket"):
        t.update_where([("n", ">=", 10)], {"k": F.lit("z")})
    with pytest.raises(ValueError, match="unknown column"):
        t.update_where([("n", ">=", 10)], {"zzz": F.lit(1)})
    with pytest.raises(ValueError, match="mode"):
        t.update_where([("n", ">=", 10)], {"v": F.lit("x")}, mode="bogus")


def test_update_then_later_cdc_event_wins(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.update_where([("k", "=", "b")], {"v": F.lit("patched")})
    merge_apply(
        t,
        spark.createDataFrame(
            [("b", "update", 999, "stream-wins", 21)],
            "k string, op string, seq long, v string, n int",
        ),
        1,
    )
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got["b"] == "stream-wins"


def test_update_where_no_match_noop(spark, tmp_path):
    t = _table(spark, tmp_path)
    v = t.current_version()
    t.update_where([("n", ">=", 10**6)], {"v": F.lit("x")})
    assert t.current_version() == v


def test_delete_then_immediately_next_seq_resurrects(spark, tmp_path):
    """Review fix: the tombstone seq equals the current max _seq, so the
    stream's very NEXT event (max+1) already resurrects the key — no
    silent swallow at the collision seq."""
    t = _table(spark, tmp_path)  # seqs 1..4 applied
    t.delete_where([("k", "=", "d")])
    assert {r["k"] for r in t.read().collect()} == {"a", "b", "c"}
    merge_apply(
        t,
        spark.createDataFrame(
            [("d", "insert", 5, "vd2", 2)],  # exactly max+1
            "k string, op string, seq long, v string, n int",
        ),
        1,
    )
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got["d"] == "vd2"
