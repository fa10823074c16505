"""dx_* transformer semantics vs the reference's documented behavior."""

import pytest
from pyspark.sql import functions as F

from datax_spark.operators.transforms import (
    TransformSpec,
    apply_transform_chain,
    dx_digest,
    dx_filter,
    dx_pad,
    dx_replace,
    dx_substr,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("hello world", 5, "x"), ("ab", -3, "y"), (None, 0, "z")],
        "s string, n int, tag string",
    )


def _col(df, c):
    return [r[0] for r in df.select(c).collect()]


def test_dx_substr(spark, df):
    out = df.select(dx_substr("s", 0, 5).alias("v"))
    assert _col(out, "v") == ["hello", "ab", None]  # null passes through
    out2 = df.select(dx_substr("s", 6, 50).alias("v"))
    assert _col(out2, "v")[0] == "world"


def test_dx_pad(spark, df):
    out = df.select(dx_pad("s", "l", 4, "*").alias("v"))
    assert _col(out, "v") == ["hell", "**ab", "****"]  # truncate / pad / null->""
    out2 = df.select(dx_pad("s", "r", 4, "*").alias("v"))
    assert _col(out2, "v") == ["hell", "ab**", "****"]
    with pytest.raises(ValueError):
        dx_pad("s", "x", 4, "*")


def test_dx_replace(spark, df):
    out = df.select(dx_replace("s", 0, 5, "HELLO").alias("v"))
    assert _col(out, "v")[0] == "HELLO world"
    out2 = df.select(dx_replace("s", 6, 100, "Z").alias("v"))
    assert _col(out2, "v")[0] == "hello Z"


def test_dx_filter_inverted_sense(spark, df):
    # drops rows MATCHING the predicate (FilterTransformer semantics)
    out = dx_filter(df, "n", ">", 0)
    assert sorted(_col(out, "n")) == [-3, 0]
    out2 = dx_filter(df, "s", "like", "hello.*")
    assert _col(out2, "s") == ["ab", None]  # null never dropped
    out3 = dx_filter(df, "s", "not like", "hello.*")
    assert _col(out3, "s") == ["hello world", None]


def test_dx_digest(spark, df):
    out = df.select(dx_digest("tag", "md5").alias("v"))
    import hashlib

    assert _col(out, "v")[0] == hashlib.md5(b"x").hexdigest()


def test_transform_chain_config_order(spark, df):
    specs = [
        TransformSpec("dx_pad", "s", {"pad_type": "r", "length": 8, "pad_string": "!"}),
        TransformSpec("dx_substr", "s", {"start_index": 0, "length": 3}),
        TransformSpec("dx_filter", "s", {"code": "=", "value": "ab!"}),
    ]
    out = apply_transform_chain(df, specs)
    assert sorted(_col(out, "s")) == ["!!!", "hel"]


def test_transform_chain_stays_jvm_side(spark, df):
    """The compiled chain must not introduce Python UDFs (no BatchEvalPython
    in the physical plan) — transforms are whole-stage-codegen expressions."""
    specs = [
        TransformSpec("dx_pad", "s", {"pad_type": "l", "length": 10, "pad_string": " "}),
        TransformSpec("dx_replace", "s", {"start_index": 1, "length": 2, "replace_string": "zz"}),
    ]
    plan = apply_transform_chain(df, specs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
