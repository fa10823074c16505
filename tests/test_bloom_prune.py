"""Driver-side bloom-filter file skipping (lake/parquet_bloom.py).

plan_scan's third pruning pass probes each candidate file's own parquet
bloom filter for ``=`` filters on the table's ``bloom_cols`` — the
point-lookup case where min/max bounds are useless (hash-spread values
span every file's range). Every test checks BOTH that pruning happened
(plan counters) and that results equal the unpruned read + filter:
blooms have false positives, never false negatives, so pruning on a
definite "absent" must be invisible to answers.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from datax_spark.lake.parquet_bloom import (
    file_might_contain,
    footer_bloom_index,
    xxhash64,
)
from datax_spark.lake.table import LakeTable

SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("eid", StringType()),
        StructField("seq", LongType()),
        StructField("content", StringType()),
    ]
)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("r"), F.col("id") % 37).alias("repo"),
        F.concat(F.lit("e"), F.col("id")).alias("eid"),
        F.col("id").alias("seq"),
        F.concat(F.lit("c"), F.col("id")).alias("content"),
    )


def _make_table(spark, tmp_path, **kw):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        ["repo", "eid"],
        "repo",
        4,
        bloom_cols=["eid"],
        **kw,
    )
    # three insert-only appends -> three BASE files per touched bucket,
    # each holding a disjoint eid range
    for lo in (0, 500, 1000):
        t.append_insert_only(_rows(spark, lo, lo + 500), batch_id=lo + 1)
    return t


# ------------------------------------------------------------------ unit
def test_xxhash64_spec_vectors():
    # public XXH64 test vectors (xxHash reference implementation, seed 0)
    assert xxhash64(b"") == 0xEF46DB3751D8E999
    # >=32-byte input exercises the 4-lane stripe loop
    assert xxhash64(bytes(range(64))) != xxhash64(bytes(range(63)))
    # seed changes the hash
    assert xxhash64(b"datax", 1) != xxhash64(b"datax", 0)


def test_footer_index_matches_jvm_reader(spark, tmp_path):
    t = _make_table(spark, tmp_path)
    snap = t.snapshot()
    path = os.path.join(
        t.path, next(fs[0] for fs in snap.buckets.values() if fs)
    )
    idx, n_rg = footer_bloom_index(path)
    assert set(idx) == {"eid"}, idx  # only the opted-in column
    # blooms cover EVERY row group (the soundness precondition for
    # pruning — file_might_contain refuses to prune otherwise)
    assert n_rg >= 1 and len(idx["eid"]) == n_rg, (idx, n_rg)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    footer = jvm.org.apache.parquet.hadoop.ParquetFileReader.readFooter(
        conf, jvm.org.apache.hadoop.fs.Path(path)
    )
    rg = footer.getBlocks().get(0)
    jvm_off = {
        rg.getColumns().get(i).getPath().toDotString():
            rg.getColumns().get(i).getBloomFilterOffset()
        for i in range(rg.getColumns().size())
    }
    assert idx["eid"][0][0] == jvm_off["eid"]
    assert jvm_off["content"] == -1


def test_no_false_negatives_and_point_lookup_prunes(spark, tmp_path):
    t = _make_table(spark, tmp_path)
    full = {
        r["eid"]: r["seq"]
        for r in t.read().select("eid", "seq").collect()
    }
    assert len(full) == 1500

    # present values: NEVER bloom-pruned away (sampled across all ranges)
    for i in (0, 250, 499, 500, 777, 999, 1000, 1250, 1499):
        plan = t.plan_scan([("eid", "=", f"e{i}")])
        rows = t.scan([("eid", "=", f"e{i}")]).collect()
        assert [r["seq"] for r in rows] == [full[f"e{i}"]], (i, plan)
        # pruning DID happen: only ~the one file holding the range
        # survives (false positives allowed, wholesale keeps are not)
        assert plan["files_kept"] < plan["files_total"], plan
        assert plan["files_bloom_pruned"] >= 1, plan

    # absent value: provably nowhere -> everything pruned, zero rows
    plan = t.plan_scan([("eid", "=", "zz-not-there")])
    assert plan["files_kept"] == 0, plan
    assert plan["files_bloom_pruned"] == plan["files_total"]
    assert t.scan([("eid", "=", "zz-not-there")]).count() == 0

    # prune_files=False bypasses blooms entirely
    plan = t.plan_scan([("eid", "=", "zz-not-there")], prune_files=False)
    assert plan["files_bloom_pruned"] == 0
    assert plan["files_kept"] == plan["files_total"]


def test_non_equality_and_foreign_columns_never_probe(spark, tmp_path):
    t = _make_table(spark, tmp_path)
    # range op on the bloom column: blooms only answer equality
    plan = t.plan_scan([("eid", ">=", "e0")])
    assert plan["files_bloom_pruned"] == 0
    # '=' on a column without a bloom: kept
    plan = t.plan_scan([("content", "=", "c1")])
    assert plan["files_bloom_pruned"] == 0
    # NULL literal: no probe (bloom can't speak for nulls)
    plan = t.plan_scan([("eid", "=", None)])
    assert plan["files_bloom_pruned"] == 0


def test_bloom_ndv_hint_shrinks_bitset(spark, tmp_path):
    small = LakeTable.create(
        spark, str(tmp_path / "ndv"), SCHEMA, ["repo", "eid"], "repo", 4,
        bloom_cols=["eid"], bloom_ndv={"eid": 500},
    )
    small.append_insert_only(_rows(spark, 0, 500), batch_id=1)
    snap = small.snapshot()
    path = os.path.join(
        small.path, next(fs[0] for fs in snap.buckets.values() if fs)
    )
    (offset, length, ptype) = footer_bloom_index(path)[0]["eid"][0]
    # parquet-mr's unsized default reserves ~1 MiB; the hint right-sizes
    assert length is not None and length < 65536, length
    assert file_might_contain(path, {"eid": "e-definitely-absent"}) is False


def test_probe_is_optimization_only_on_corrupt_bloom(spark, tmp_path):
    t = _make_table(spark, tmp_path)
    snap = t.snapshot()
    rel = next(fs[0] for fs in snap.buckets.values() if fs)
    path = os.path.join(t.path, rel)
    (offset, length, _ptype) = footer_bloom_index(path)[0]["eid"][0]
    # scribble over the bloom HEADER: the probe must fail open (keep)
    with open(path, "r+b") as f:
        f.seek(offset)
        f.write(b"\xff" * 8)
    assert file_might_contain(path, {"eid": "e-definitely-absent"}) is True


def test_partial_row_group_coverage_never_prunes(spark, tmp_path, monkeypatch):
    """A row group whose chunk has NO bloom is invisible to the index; a
    prune that ignored it could drop a file that holds the value in that
    group. The guard: probing refuses to prune unless the bloom entries
    cover EVERY row group."""
    import datax_spark.lake.parquet_bloom as pb

    t = _make_table(spark, tmp_path)
    snap = t.snapshot()
    path = os.path.join(
        t.path, next(fs[0] for fs in snap.buckets.values() if fs)
    )
    real_idx, real_n = footer_bloom_index(path)
    # the real bloom proves this value absent...
    assert file_might_contain(path, {"eid": "e-definitely-absent"}) is False
    # ...but if the file claimed one MORE row group than the blooms
    # cover (mixed-writer file), the probe must keep it
    monkeypatch.setattr(
        pb, "footer_bloom_index", lambda p: (real_idx, real_n + 1)
    )
    assert pb.file_might_contain(
        path, {"eid": "e-definitely-absent"}
    ) is True


def test_in_list_point_lookup_batch(spark, tmp_path):
    """IN-list lookups: bucket pruning unions the hit buckets, min/max
    uses ANY semantics, blooms keep a file iff ANY listed value might be
    present — and the residual isin() keeps results exact."""
    t = _make_table(spark, tmp_path)
    want = {"e10", "e600", "e1200"}
    plan = t.plan_scan([("eid", "in", sorted(want))])
    got = {r["eid"] for r in t.scan([("eid", "in", sorted(want))]).collect()}
    assert got == want
    assert plan["files_kept"] < plan["files_total"], plan
    assert plan["files_bloom_pruned"] >= 1, plan

    # all-absent list prunes everything
    plan = t.plan_scan([("eid", "in", ["zz1", "zz2"])])
    assert plan["files_kept"] == 0
    assert t.scan([("eid", "in", ["zz1", "zz2"])]).count() == 0

    # empty list: matches nothing (residual lit(False)); NULLs in the
    # list are ignored per SQL IN semantics
    assert t.scan([("eid", "in", [])]).count() == 0
    got = {r["eid"] for r in t.scan([("eid", "in", ["e10", None])]).collect()}
    assert got == {"e10"}


def test_in_list_on_bucket_key_prunes_buckets(spark, tmp_path):
    t = _make_table(spark, tmp_path)
    full = t.plan_scan([])
    # repo values hash-spread over 4 buckets; two values pin <= 2 buckets
    plan = t.plan_scan([("repo", "in", ["r0", "r5"])])
    assert len(plan["buckets"]) <= 2 < len(full["buckets"]) + 1
    got = {r["repo"] for r in t.scan([("repo", "in", ["r0", "r5"])]).collect()}
    assert got == {"r0", "r5"}


def test_in_filter_validation(spark, tmp_path):
    import pytest as _pytest

    t = _make_table(spark, tmp_path)
    with _pytest.raises(ValueError, match="'in' filter"):
        t.plan_scan([("eid", "in", "e10")])  # bare string, not a list
