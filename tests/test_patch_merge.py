"""Partial-column (UpdateRow) MERGE semantics — writeMode=update.

otswriter PutRow vs UpdateRow parity (otswriter/.../model/OTSConst.java:
17-18): update patches only the non-null incoming columns; replace
overwrites the whole row.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from datax_spark.lake.mor import MorTable
from datax_spark.lake.table import LakeTable
from datax_spark.streaming.pipeline import PipelineConfig, apply_batch

SCHEMA = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
    + [StructField("val", DoubleType())]
)
KEYS = ["repo", "path", "commit"]
EV_SCHEMA = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
    + [StructField("val", DoubleType()),
       StructField("op", StringType()),
       StructField("seq", LongType())]
)


def _events(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def test_patch_keeps_old_values_for_null_columns(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 4)
    cfg = PipelineConfig(write_mode="update")
    apply_batch(t, _events(spark, [
        ("r1", "p", "c", "py", "one", 1.5, "insert", 1),
        ("r2", "p", "c", "py", "two", 2.5, "insert", 2),
        ("r3", "p", "c", "py", "three", 3.5, "insert", 3),
    ]), 0, cfg)
    # batch 1: patch r1's content only (val NULL -> keep 1.5); patch r2's
    # val only (content must stay; but content null would be quarantined,
    # so send content and null lang instead); delete r3; insert r4 with
    # null val.
    apply_batch(t, _events(spark, [
        ("r1", "p", "c", None, "one-v2", None, "update", 10),
        ("r2", "p", "c", None, "two", 9.9, "update", 11),
        ("r3", "p", "c", None, "x", None, "delete", 12),
        ("r4", "p", "c", "go", "four", None, "insert", 13),
    ]), 1, cfg)
    rows = {r["repo"]: r for r in t.read().collect()}
    assert set(rows) == {"r1", "r2", "r4"}
    assert rows["r1"]["content"] == "one-v2" and rows["r1"]["val"] == 1.5
    assert rows["r1"]["lang"] == "py"  # null incoming lang kept old value
    assert rows["r2"]["val"] == 9.9
    assert rows["r4"]["val"] is None and rows["r4"]["lang"] == "go"


def test_replace_mode_nulls_columns(spark, tmp_path):
    """Contrast: whole-row replace (PutRow) nulls what the image lacks."""
    t = LakeTable.create(spark, str(tmp_path / "t2"), SCHEMA, KEYS, "repo", 4)
    apply_batch(t, _events(spark, [
        ("r1", "p", "c", "py", "one", 1.5, "insert", 1),
    ]), 0)
    apply_batch(t, _events(spark, [
        ("r1", "p", "c", None, "one-v2", None, "update", 10),
    ]), 1)
    row = t.read().collect()[0]
    assert row["content"] == "one-v2"
    assert row["val"] is None and row["lang"] is None


def test_patch_within_batch_uses_latest_image(spark, tmp_path):
    """Patch granularity is the micro-batch: dedup keeps only the
    batch-latest image, which is what patches the table."""
    t = LakeTable.create(spark, str(tmp_path / "t3"), SCHEMA, KEYS, "repo", 4)
    cfg = PipelineConfig(write_mode="update")
    apply_batch(t, _events(spark, [
        ("r1", "p", "c", "py", "a", 1.0, "insert", 1),
    ]), 0, cfg)
    apply_batch(t, _events(spark, [
        ("r1", "p", "c", None, "b", 7.0, "update", 2),  # superseded in-batch
        ("r1", "p", "c", None, "c", None, "update", 3),  # latest image
    ]), 1, cfg)
    row = t.read().collect()[0]
    # 7.0 from the superseded event does NOT compose; latest image's null
    # val patches against the TABLE state (1.0)
    assert row["content"] == "c" and row["val"] == 1.0


def test_mor_patch_matches_cow_patch(spark, tmp_path):
    """MOR write_mode=update (patch-tagged deltas + coalesce-at-read)
    must produce the same state as the COW patch for the same batches."""
    batches = [
        [
            ("r1", "p", "c", "py", "one", 1.5, "insert", 1),
            ("r2", "p", "c", "py", "two", 2.5, "insert", 2),
            ("r3", "p", "c", "py", "three", 3.5, "insert", 3),
        ],
        [
            ("r1", "p", "c", None, "one-v2", None, "update", 10),
            ("r2", "p", "c", None, "two", 9.9, "update", 11),
            ("r3", "p", "c", None, "x", None, "delete", 12),
            ("r4", "p", "c", "go", "four", None, "insert", 13),
        ],
        [
            ("r1", "p", "c", "rs", "one-v3", None, "update", 20),
            ("r3", "p", "c", None, "back", None, "update", 21),  # after delete
        ],
    ]
    cow = LakeTable.create(spark, str(tmp_path / "cow"), SCHEMA, KEYS, "repo", 4)
    mor = MorTable.create(spark, str(tmp_path / "mor"), SCHEMA, KEYS, "repo", 4)
    cfg = PipelineConfig(write_mode="update")
    for i, rows in enumerate(batches):
        apply_batch(cow, _events(spark, rows), i, cfg)
        apply_batch(mor, _events(spark, rows), i, cfg)
    want = sorted(
        tuple(r) for r in cow.read().select(*SCHEMA.fieldNames()).collect()
    )
    got = sorted(
        tuple(r) for r in mor.read().select(*SCHEMA.fieldNames()).collect()
    )
    assert got == want
    # r3 was deleted then partially recreated: only the patched column set
    rows = {r["repo"]: r for r in mor.read().collect()}
    assert rows["r3"]["content"] == "back"
    assert rows["r3"]["val"] is None and rows["r3"]["lang"] is None
    assert rows["r1"]["content"] == "one-v3" and rows["r1"]["val"] == 1.5
    assert rows["r1"]["lang"] == "rs"

    # compaction folds the patch deltas without changing the state, and
    # downgrades the snapshot back to cheap whole-row resolution
    assert mor.snapshot().properties.get("mor_patch") is True
    mor.compact(max_files_per_bucket=0)
    assert not any(mor.snapshot().deltas.values())
    assert mor.snapshot().properties.get("mor_patch") is False
    got2 = sorted(
        tuple(r) for r in mor.read().select(*SCHEMA.fieldNames()).collect()
    )
    assert got2 == want


def test_mor_patch_resolve_plan_never_shuffles_base(spark, tmp_path):
    """The patch resolution's exchanges are delta-bounded: the window+agg
    over the delta shares ONE hash exchange, the base side arrives only
    via broadcast anti/semi joins. No exchange may sit above the base
    file scan."""
    mor = MorTable.create(spark, str(tmp_path / "morplan"), SCHEMA, KEYS, "repo", 4)
    cfg = PipelineConfig(write_mode="update")
    apply_batch(mor, _events(spark, [
        ("r1", "p", "c", "py", "a", 1.0, "insert", 1),
    ]), 0)
    mor.compact(max_files_per_bucket=0)  # base files exist
    apply_batch(mor, _events(spark, [
        ("r1", "p", "c", None, "b", None, "update", 2),
    ]), 1, cfg)
    plan = mor.read()._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange <= 2, f"patch resolve grew exchanges:\n{plan}"
    # base files appear only under BroadcastQueryStage/anti-semi sides or
    # the union's survivor arm — never under a hash exchange. Approximate
    # check: every hashpartitioning exchange's subtree must mention the
    # delta commit dirs, not exclusively base ones. Cheap proxy: the scan
    # row of the base (largest) file set appears in the plan exactly for
    # survivor + old-image sides, which are join-pruned, and the plan has
    # no SortMergeJoin (which would imply a shuffled base).
    assert "SortMergeJoin" not in plan, plan


def test_mor_patch_old_table_rejected(spark, tmp_path):
    """A MOR table without the _patch meta column (pre-patch layout)
    refuses write_mode=update instead of corrupting resolution."""
    # old-layout stored schema: payload + _seq/_op, no _patch
    stored = StructType(
        list(SCHEMA.fields)
        + [StructField("_seq", LongType()), StructField("_op", StringType())]
    )
    LakeTable.create(
        spark, str(tmp_path / "old"), stored, KEYS, "repo", 4,
        extra_properties={"table_mode": "mor"},
    )
    t = MorTable(spark, str(tmp_path / "old"))
    cfg = PipelineConfig(write_mode="update")
    with pytest.raises(ValueError, match="_patch"):
        apply_batch(t, _events(spark, [
            ("r1", "p", "c", "py", "a", 1.0, "insert", 1),
        ]), 0, cfg)
