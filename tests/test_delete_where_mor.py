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
