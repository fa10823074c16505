"""Numeric type-widening schema evolution (operators/merge.py).

Iceberg-style: columns may only widen (int->long, float->double); old
files read up-cast, nothing rewrites. Non-widening changes raise instead
of silently casting.
"""

import os

import pytest
from pyspark.sql.types import (
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from datax_spark.lake.table import LakeTable
from datax_spark.operators.merge import (
    SchemaEvolutionError,
    _evolve_schema,
    merge_apply,
)


def _table(spark, tmp_path, value_type, name="t"):
    schema = StructType(
        [StructField("k", StringType()), StructField("n", value_type)]
    )
    return LakeTable.create(
        spark, os.path.join(str(tmp_path), name), schema, ["k"], "k", num_buckets=4
    )


def test_int_widens_to_long(spark, tmp_path):
    t = _table(spark, tmp_path, IntegerType())
    merge_apply(
        t,
        spark.createDataFrame(
            [("a", "insert", 1, 7)], "k string, op string, seq long, n int"
        ),
        0,
    )
    big = 2**40
    merge_apply(
        t,
        spark.createDataFrame(
            [("b", "insert", 2, big)], "k string, op string, seq long, n long"
        ),
        1,
    )
    out = t.read()
    assert out.schema["n"].dataType.typeName() == "long"
    got = {r["k"]: r["n"] for r in out.collect()}
    assert got == {"a": 7, "b": big}


def test_float_widens_to_double(spark, tmp_path):
    t = _table(spark, tmp_path, FloatType())
    merge_apply(
        t,
        spark.createDataFrame(
            [("a", "insert", 1, 1.5)], "k string, op string, seq long, n float"
        ),
        0,
    )
    merge_apply(
        t,
        spark.createDataFrame(
            [("b", "insert", 2, 2.25)], "k string, op string, seq long, n double"
        ),
        1,
    )
    out = t.read()
    assert out.schema["n"].dataType.typeName() == "double"
    got = {r["k"]: r["n"] for r in out.collect()}
    assert got == {"a": 1.5, "b": 2.25}


def test_narrower_batch_casts_up(spark, tmp_path):
    """A batch still carrying the OLD narrow type after the table widened
    must apply cleanly (casts up at write) and keep the wide schema."""
    t = _table(spark, tmp_path, IntegerType())
    merge_apply(
        t,
        spark.createDataFrame(
            [("a", "insert", 1, 2**40)], "k string, op string, seq long, n long"
        ),
        0,
    )
    merge_apply(
        t,
        spark.createDataFrame(
            [("b", "insert", 2, 5)], "k string, op string, seq long, n int"
        ),
        1,
    )
    out = t.read()
    assert out.schema["n"].dataType.typeName() == "long"
    got = {r["k"]: r["n"] for r in out.collect()}
    assert got == {"a": 2**40, "b": 5}


def test_incompatible_change_raises(spark, tmp_path):
    t = _table(spark, tmp_path, IntegerType())
    merge_apply(
        t,
        spark.createDataFrame(
            [("a", "insert", 1, 7)], "k string, op string, seq long, n int"
        ),
        0,
    )
    with pytest.raises(SchemaEvolutionError, match="not a widening"):
        merge_apply(
            t,
            spark.createDataFrame(
                [("b", "insert", 2, "oops")], "k string, op string, seq long, n string"
            ),
            1,
        )


def test_evolve_schema_pure():
    a = StructType([StructField("k", StringType()), StructField("n", IntegerType())])
    b = StructType([StructField("n", FloatType())])
    with pytest.raises(SchemaEvolutionError):
        _evolve_schema(a, b)


def _int_key_table(spark, tmp_path, hash_version=None, name="ik"):
    schema = StructType(
        [StructField("k", IntegerType()), StructField("v", StringType())]
    )
    extra = (
        {"bucket_hash_version": hash_version} if hash_version is not None else None
    )
    return LakeTable.create(
        spark, os.path.join(str(tmp_path), name), schema, ["k"], "k",
        num_buckets=8, extra_properties=extra,
    )


def test_bucket_key_widening_does_not_rebucket(spark, tmp_path):
    """ADVICE r3 (high): widening the BUCKET KEY int->long must keep each
    key's rows in the bucket its old rows live in. v2 layouts canonicalize
    the hash input (xxhash64 over long) so the update REPLACES the old
    row instead of duplicating it in a different bucket."""
    t = _int_key_table(spark, tmp_path)
    merge_apply(
        t,
        spark.createDataFrame(
            [(42, "insert", 1, "old")], "k int, op string, seq long, v string"
        ),
        0,
    )
    merge_apply(
        t,
        spark.createDataFrame(
            [(42, "update", 2, "new")], "k long, op string, seq long, v string"
        ),
        1,
    )
    out = t.read()
    assert out.schema["k"].dataType.typeName() == "long"
    rows = out.collect()
    assert len(rows) == 1, f"duplicate key after bucket-key widening: {rows}"
    assert rows[0]["v"] == "new"
    # pruning agrees with the write path: the scan finds the row
    assert t.scan([("k", "=", 42)]).count() == 1


def test_bucket_key_widening_refused_on_v1_layout(spark, tmp_path):
    """Pre-round-4 layouts hash the raw column (xxhash64(int 42) !=
    xxhash64(long 42)) — widening their bucket key must raise, never
    silently re-bucket."""
    t = _int_key_table(spark, tmp_path, hash_version=1)
    merge_apply(
        t,
        spark.createDataFrame(
            [(42, "insert", 1, "old")], "k int, op string, seq long, v string"
        ),
        0,
    )
    with pytest.raises(SchemaEvolutionError, match="bucket key"):
        merge_apply(
            t,
            spark.createDataFrame(
                [(42, "update", 2, "new")], "k long, op string, seq long, v string"
            ),
            1,
        )
    # non-bucket-key widening on v1 still works (only the key is pinned)
    merge_apply(
        t,
        spark.createDataFrame(
            [(43, "insert", 3, "x", 5)],
            "k int, op string, seq long, v string, extra long",
        ),
        2,
    )
    assert t.read().filter("k = 43").count() == 1
