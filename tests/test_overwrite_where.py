"""Predicate overwrite (LakeTable.overwrite_where — Delta replaceWhere
analog): atomic delete-matching + insert, bucket-pruned when possible,
delta-folding on MOR."""

import os

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.mor import MorTable
from datax_spark.lake.table import LakeTable
from datax_spark.operators.dedup import dedup_latest

SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("lang", StringType()),
        StructField("content", StringType()),
    ]
)


def _cow(spark, tmp_path, name="t"):
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), name), SCHEMA, ["repo"], "repo",
        num_buckets=4,
    )
    t.bulk_load(
        spark.createDataFrame(
            [("r1", "py", "a"), ("r2", "py", "b"), ("r3", "go", "c"),
             ("r4", None, "d")],
            SCHEMA,
        )
    )
    return t


def _state(t):
    return sorted(tuple(r) for r in t.read().select("repo", "lang", "content").collect())


def test_overwrite_nonkey_predicate(spark, tmp_path):
    t = _cow(spark, tmp_path)
    repl = spark.createDataFrame([("r9", "py", "new")], SCHEMA)
    t.overwrite_where([("lang", "=", "py")], repl)
    # py rows gone, replacement in; go row AND the NULL-lang row survive
    assert _state(t) == [("r3", "go", "c"), ("r4", None, "d"), ("r9", "py", "new")]


def test_overwrite_bucket_key_prunes(spark, tmp_path):
    t = _cow(spark, tmp_path)
    before = dict(t.snapshot().buckets)
    repl = spark.createDataFrame([("r1", "rs", "z")], SCHEMA)
    t.overwrite_where([("repo", "=", "r1")], repl)
    after = t.snapshot().buckets
    got = _state(t)
    assert ("r1", "rs", "z") in got and ("r1", "py", "a") not in got
    # r1's replacement hashes to r1's own bucket: every other bucket must
    # carry forward by reference (no rewrite)
    changed = [b for b in before if after.get(b) != before[b]]
    assert len(changed) <= 1


def test_validate_rejects_out_of_slice_rows(spark, tmp_path):
    t = _cow(spark, tmp_path)
    bad = spark.createDataFrame([("r9", "go", "oops")], SCHEMA)
    with pytest.raises(ValueError, match="NOT matching"):
        t.overwrite_where([("lang", "=", "py")], bad)
    # validate=False forces it through
    t.overwrite_where([("lang", "=", "py")], bad, validate=False)
    assert ("r9", "go", "oops") in _state(t)


def test_overwrite_mor_folds_deltas(spark, tmp_path):
    path = os.path.join(str(tmp_path), "mor")
    t = MorTable.create(spark, path, SCHEMA, ["repo"], "repo", num_buckets=4)
    ev = spark.createDataFrame(
        [("r1", "py", "a", "insert", 1), ("r2", "py", "b", "insert", 2),
         ("r3", "go", "c", "insert", 3)],
        "repo string, lang string, content string, op string, seq long",
    )
    t.apply_deduped(dedup_latest(ev, ["repo"]), 0)
    # delta-only update on r3 that the overwrite slice does NOT cover
    ev2 = spark.createDataFrame(
        [("r3", "go", "c2", "update", 4)],
        "repo string, lang string, content string, op string, seq long",
    )
    t.apply_deduped(dedup_latest(ev2, ["repo"]), 1)
    assert any(t.snapshot().deltas.values())
    repl = spark.createDataFrame([("r8", "py", "n")], SCHEMA)
    t.overwrite_where([("lang", "=", "py")], repl)
    got = sorted(
        tuple(r) for r in t.read().select("repo", "lang", "content").collect()
    )
    # r3's DELTA image survives the overwrite (folded resolved, not lost)
    assert got == [("r3", "go", "c2"), ("r8", "py", "n")]
    # a non-key predicate replaces every bucket: all delta lists cleared
    snap = t.snapshot()
    assert not any(snap.deltas.values())


def test_delete_where(spark, tmp_path):
    t = _cow(spark, tmp_path, name="del")
    t.delete_where([("lang", "=", "py")])
    # py rows gone; go and NULL-lang rows intact
    assert _state(t) == [("r3", "go", "c"), ("r4", None, "d")]
    # deleting an empty slice is a no-op commit, not an error
    t.delete_where([("lang", "=", "java")])
    assert _state(t) == [("r3", "go", "c"), ("r4", None, "d")]


def test_validate_rejects_null_predicate_rows(spark, tmp_path):
    """A replacement row where the predicate evaluates NULL is outside
    the slice (survivors keep NULL-pred rows) and must fail validation —
    otherwise re-running the same overwrite would duplicate it."""
    t = _cow(spark, tmp_path, name="nullv")
    bad = spark.createDataFrame([("r9", None, "x")], SCHEMA)
    with pytest.raises(ValueError, match="NOT matching"):
        t.overwrite_where([("lang", "=", "py")], bad)


# --------------------------------------------------- COW update_where (DML)
def test_cow_update_where_applies_set_exprs(spark, tmp_path):
    from pyspark.sql import functions as F

    t = _cow(spark, tmp_path, "upd")
    t.update_where(
        [("lang", "=", "py")],
        {"content": F.concat(F.col("content"), F.lit("!")), "lang": "upper(lang)"},
    )
    assert _state(t) == [
        ("r1", "PY", "a!"), ("r2", "PY", "b!"), ("r3", "go", "c"),
        ("r4", None, "d"),
    ]


def test_cow_update_where_guards(spark, tmp_path):
    from pyspark.sql import functions as F

    t = _cow(spark, tmp_path, "updg")
    with pytest.raises(ValueError, match="key/bucket"):
        t.update_where([("lang", "=", "py")], {"repo": F.lit("x")})
    with pytest.raises(ValueError, match="unknown column"):
        t.update_where([("lang", "=", "py")], {"zzz": F.lit("x")})
