"""Parquet bloom filters on lake data files (bloom_cols table property)."""

from __future__ import annotations

import os

from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.table import LakeTable
from datax_spark.sources.changelog import generate_changelog, write_segments
from datax_spark.streaming.pipeline import apply_segments

SCHEMA = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
KEYS = ["repo", "path", "commit"]


def _bloom_offsets(spark, file_path: str) -> dict[str, int]:
    """Column -> bloom filter offset from the parquet footer via the JVM
    reader (-1 = no bloom). pyarrow 16 doesn't expose bloom metadata."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(file_path)
    footer = jvm.org.apache.parquet.hadoop.ParquetFileReader.readFooter(conf, p)
    out: dict[str, int] = {}
    rg = footer.getBlocks().get(0)
    for i in range(rg.getColumns().size()):
        col = rg.getColumns().get(i)
        name = col.getPath().toDotString()
        out[name] = col.getBloomFilterOffset()
    return out


def test_bloom_cols_written_and_queries_correct(spark, tmp_path):
    logdir = str(tmp_path / "log")
    write_segments(
        generate_changelog(spark, n_events=3000, n_keys=400,
                           events_per_segment=1500),
        logdir,
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 4,
        bloom_cols=["path"],
    )
    apply_segments(spark, t, logdir)
    snap = t.snapshot()
    some_file = os.path.join(
        t.path, next(fs[0] for fs in snap.buckets.values() if fs)
    )
    offsets = _bloom_offsets(spark, some_file)
    assert offsets["path"] >= 0, offsets
    assert offsets["content"] == -1, "only opted-in columns get blooms"

    # point lookup correctness (the bloom is a reader-side optimization,
    # never a semantics change)
    df = t.read()
    row = df.select("repo", "path").first()
    got = df.filter(df.path == row["path"]).count()
    want = sum(
        1 for r in df.select("path").collect() if r["path"] == row["path"]
    )
    assert got == want > 0


def test_no_bloom_by_default(spark, tmp_path):
    logdir = str(tmp_path / "log")
    write_segments(
        generate_changelog(spark, n_events=1500, n_keys=200,
                           events_per_segment=1500),
        logdir,
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 4)
    apply_segments(spark, t, logdir)
    snap = t.snapshot()
    some_file = os.path.join(
        t.path, next(fs[0] for fs in snap.buckets.values() if fs)
    )
    offsets = _bloom_offsets(spark, some_file)
    assert all(v == -1 for v in offsets.values()), offsets
