"""Quarantine replay lifecycle: corrupt -> quarantine -> repair -> replay.

Final state must equal the oracle replay of the CORRECTED log; replay is
idempotent (ledger + merge fence) and still-dirty rows re-quarantine.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from datax_spark.lake.table import LakeTable
from datax_spark.quality.replay import pending_batches, replay_quarantine
from datax_spark.streaming.pipeline import PipelineConfig, apply_batch

SCHEMA = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
KEYS = ["repo", "path", "commit"]
EV_SCHEMA = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content", "op"]]
    + [StructField("seq", LongType())]
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def test_replay_lifecycle(spark, tmp_path):
    qdir = str(tmp_path / "q")
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, "repo", 4)
    cfg = PipelineConfig(quarantine_dir=qdir)

    # batch 0: two clean rows + two dirty (bad op marker, null content)
    m0 = apply_batch(t, _ev(spark, [
        ("r1", "p", "c", "py", "one", "insert", 1),
        ("r2", "p", "c", "py", "two", "insert", 2),
        ("r3", "p", "c", "py", "three", "UPSERT", 3),   # invalid_op
        ("r4", "p", "c", "py", None, "insert", 4),      # null_content
    ]), 0, cfg)
    assert m0.dirty_records == 2 and t.count() == 2
    assert pending_batches(spark, qdir) == [0]

    # repair: normalize the op vocabulary, backfill content
    def repair(df):
        return df.withColumn(
            "op", F.when(F.col("op") == "UPSERT", "update").otherwise(F.col("op"))
        ).withColumn("content", F.coalesce(F.col("content"), F.lit("backfilled")))

    m = replay_quarantine(t, qdir, repair_fn=repair, config=cfg)
    assert m is not None and m.applied and m.dirty_records == 0
    rows = {r["repo"]: r["content"] for r in t.read().collect()}
    assert rows == {
        "r1": "one", "r2": "two", "r3": "three", "r4": "backfilled",
    }

    # idempotent: nothing pending, second replay is a no-op
    assert pending_batches(spark, qdir) == []
    assert replay_quarantine(t, qdir, repair_fn=repair, config=cfg) is None


def test_replay_requarantines_still_dirty(spark, tmp_path):
    qdir = str(tmp_path / "q2")
    t = LakeTable.create(spark, str(tmp_path / "t2"), SCHEMA, KEYS, "repo", 4)
    cfg = PipelineConfig(quarantine_dir=qdir)
    apply_batch(t, _ev(spark, [
        ("r1", "p", "c", "py", "one", "insert", 1),
        ("r2", "p", "c", "py", None, "insert", 2),   # dirty
        ("r3", "p", "c", "py", None, "insert", 3),   # dirty
    ]), 0, cfg)
    assert pending_batches(spark, qdir) == [0]

    # partial repair: only r2 gets content; r3 stays dirty
    def repair(df):
        return df.withColumn(
            "content",
            F.when(F.col("repo") == "r2", F.lit("fixed")).otherwise(
                F.col("content")
            ),
        )

    m = replay_quarantine(t, qdir, repair_fn=repair, config=cfg)
    assert m.applied and m.dirty_records == 1
    assert t.count() == 2  # r1 + repaired r2
    # r3 re-quarantined under the replay's batch id, pending again
    assert pending_batches(spark, qdir) == [m.batch_id]
