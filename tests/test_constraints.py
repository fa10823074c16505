"""Table-level CHECK constraints (Delta analog) through the apply path."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.table import LakeTable
from datax_spark.quality.quarantine import ErrorLimit, ErrorLimitExceeded
from datax_spark.streaming.pipeline import PipelineConfig, apply_batch

SCHEMA = StructType(
    [StructField(c, StringType()) for c in ["repo", "path", "commit", "lang", "content"]]
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(r[0], "p", "c", r[1], r[2], "insert", i + 1) for i, r in enumerate(rows)],
        "repo string, path string, commit string, lang string, content string, op string, seq long",
    )


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(
        spark,
        os.path.join(str(tmp_path), "t"),
        SCHEMA,
        ["repo", "path", "commit"],
        "repo",
        num_buckets=4,
        constraints={
            "content_len": "length(content) <= 10",
            "lang_known": "lang IN ('py', 'go', 'rs')",
        },
    )


def test_violations_quarantine_with_named_reason(spark, tmp_path, table):
    qdir = os.path.join(str(tmp_path), "q")
    ev = _events(
        spark,
        [
            ("r1", "py", "ok"),
            ("r2", "py", "this is far too long"),  # content_len
            ("r3", "zz", "ok"),  # lang_known
            ("r4", None, "ok"),  # NULL constraint expr -> passes (Delta 3VL)
        ],
    )
    m = apply_batch(table, ev, 0, PipelineConfig(quarantine_dir=qdir))
    assert m.dirty_records == 2
    assert m.dirty_reasons == {
        "constraint:content_len": 1,
        "constraint:lang_known": 1,
    }
    got = sorted(r["repo"] for r in table.read().collect())
    assert got == ["r1", "r4"]
    q = spark.read.parquet(qdir)
    reasons = {r["repo"]: r["_dirty_reason"] for r in q.collect()}
    assert reasons == {
        "r2": "constraint:content_len",
        "r3": "constraint:lang_known",
    }


def test_constraint_violations_trip_error_limit(spark, table):
    ev = _events(spark, [("r1", "py", "way too long for limit")])
    with pytest.raises(ErrorLimitExceeded):
        apply_batch(
            table, ev, 0, PipelineConfig(error_limit=ErrorLimit(record=0))
        )


def test_builtin_rules_win_over_constraints(spark, table):
    # a row that is BOTH null-key and constraint-violating reports the
    # built-in reason (first rule wins, stable taxonomy)
    ev = spark.createDataFrame(
        [(None, "p", "c", "zz", "xx", "insert", 1)],
        "repo string, path string, commit string, lang string, content string, op string, seq long",
    )
    m = apply_batch(table, ev, 0, PipelineConfig())
    assert m.dirty_reasons == {"null_key": 1}


def test_deletes_bypass_payload_constraints(spark, table):
    ev = spark.createDataFrame(
        [("r1", "p", "c", None, None, "delete", 1)],
        "repo string, path string, commit string, lang string, content string, op string, seq long",
    )
    m = apply_batch(table, ev, 0, PipelineConfig())
    assert m.dirty_records == 0
