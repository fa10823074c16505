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
