"""LakeTable.fsck: manifest/storage consistency checker (driver-side)."""

import os

from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.table import LakeTable
from datax_spark.operators.merge import merge_apply

SCHEMA = StructType([StructField("k", StringType()), StructField("v", StringType())])


def _table(spark, tmp_path):
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, ["k"], "k", num_buckets=4
    )
    for i in range(2):
        merge_apply(
            t,
            spark.createDataFrame(
                [(f"k{j}", "insert", i * 10 + j, f"v{i}") for j in range(6)],
                "k string, op string, seq long, v string",
            ),
            i,
        )
    return t


def test_clean_table_passes(spark, tmp_path):
    t = _table(spark, tmp_path)
    rep = t.fsck()
    assert rep["ok"], rep
    assert rep["missing"] == 0 and rep["misplaced"] == 0
    assert rep["files_referenced"] > 0
    # superseded commit files from version 2's rewrite are orphan-free
    # only after vacuum; fsck reports them without failing
    assert rep["ok"] is True


def test_missing_file_detected(spark, tmp_path):
    t = _table(spark, tmp_path)
    snap = t.snapshot()
    rel = next(iter(snap.buckets.values()))[0]
    os.unlink(os.path.join(t.path, rel))
    rep = t.fsck()
    assert not rep["ok"]
    assert rep["missing"] >= 1
    assert any(rel in s for s in rep["samples"]["missing"])


def test_orphans_reported_and_vacuumed(spark, tmp_path):
    t = _table(spark, tmp_path)
    # a crashed commit: staged files that never published
    stray = os.path.join(t.path, "data", "commit-deadbeef", "_bucket=0")
    os.makedirs(stray)
    with open(os.path.join(stray, "part-0.parquet"), "w") as f:
        f.write("x")
    rep = t.fsck()
    assert rep["ok"] and rep["orphans"] >= 1
    t.vacuum(keep_last=1)
    rep2 = t.fsck()
    assert rep2["ok"] and rep2["orphans"] == 0
