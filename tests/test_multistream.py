"""Per-stream fencing: two independent CDC streams into one table."""

from __future__ import annotations

from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.table import LakeTable
from datax_spark.streaming.pipeline import PipelineConfig, apply_batch

SCHEMA = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string, op string, seq long"
    )


def test_independent_stream_fences(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path", "commit"], "repo", 4
    )
    a = PipelineConfig(stream_id="stream-a")
    b = PipelineConfig(stream_id="stream-b")
    m1 = apply_batch(t, _ev(spark, [("ra", "p", "c", "py", "v1", "insert", 1)]), 5, a)
    assert m1.applied
    # same batch id on ANOTHER stream must still apply (fences are per-stream)
    m2 = apply_batch(t, _ev(spark, [("rb", "p", "c", "py", "v2", "insert", 2)]), 5, b)
    assert m2.applied
    # replay on the same stream is fenced
    m3 = apply_batch(t, _ev(spark, [("rx", "p", "c", "py", "x", "insert", 3)]), 5, a)
    assert not m3.applied
    assert t.last_batch_id("stream-a") == 5
    assert t.last_batch_id("stream-b") == 5
    got = {r["repo"]: r["content"] for r in t.read().collect()}
    assert got == {"ra": "v1", "rb": "v2"}
