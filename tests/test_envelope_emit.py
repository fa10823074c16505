"""Outbound Debezium emitter (sources/envelope.to_debezium).

The contract under test: a downstream consumer that replays the emitted
envelopes through ``from_debezium`` + ``apply_batch`` converges on the
source table's exact state (lake -> envelope bus -> lake replication),
and the envelopes themselves are faithful Debezium shapes (op codes,
null-ness of before/after, one envelope per update pair).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.table import LakeTable
from datax_spark.oracle import state_fingerprint
from datax_spark.sources.envelope import from_debezium, to_debezium
from datax_spark.streaming.pipeline import apply_batch

PAYLOAD = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
KEYS = ["repo", "path", "commit"]


def _chg(spark, rows):
    return spark.createDataFrame(
        [(r, "p", "c", "na", c, op, s) for (r, c, op, s) in rows],
        "repo string, path string, commit string, lang string, "
        "content string, op string, seq long",
    )


def _mk(spark, tmp_path, name):
    return LakeTable.create(
        spark, str(tmp_path / name), PAYLOAD, KEYS, "repo", 4
    )


def _fp(t):
    return state_fingerprint(t.read().orderBy(KEYS).toPandas())


def test_emitted_feed_replicates_table(spark, tmp_path):
    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")
    batch1 = _chg(spark, [
        ("r1", "v1", "insert", 1),
        ("r2", "w1", "insert", 2),
        ("r3", "x1", "insert", 3),
    ])
    # batch 2: update r1, delete r2, insert r4, leave r3 untouched
    batch2 = _chg(spark, [
        ("r1", "v2", "update", 10),
        ("r2", None, "delete", 11),
        ("r4", "y1", "insert", 12),
    ])
    apply_batch(a, batch1, 0)
    v1 = a.current_version()
    apply_batch(a, batch2, 1)

    # B starts from the same base state, then consumes A's EMITTED feed
    apply_batch(b, batch1, 0)
    env = to_debezium(a.read_changes(v1), KEYS)
    parsed = from_debezium(env.select("value"), PAYLOAD)
    apply_batch(b, parsed, 1)
    assert _fp(b) == _fp(a)


def test_envelope_shapes(spark, tmp_path):
    a = _mk(spark, tmp_path, "a")
    apply_batch(a, _chg(spark, [
        ("r1", "v1", "insert", 1), ("r2", "w1", "insert", 2),
    ]), 0)
    v1 = a.current_version()
    apply_batch(a, _chg(spark, [
        ("r1", "v2", "update", 10),
        ("r2", None, "delete", 11),
        ("r4", "y1", "insert", 12),
    ]), 1)
    rows = to_debezium(a.read_changes(v1), KEYS, ts_ms=1234).collect()
    by_op = {}
    for r in rows:
        doc = json.loads(r["value"])
        by_op[doc["op"]] = doc
        assert set(doc) == {"before", "after", "op", "ts_ms", "source"}
        assert doc["ts_ms"] == 1234
        assert doc["source"]["lsn"] == r["_commit_version"]
        key = json.loads(r["key"])
        assert set(key) == set(KEYS) and key["repo"] is not None
    assert set(by_op) == {"c", "u", "d"}
    assert by_op["c"]["before"] is None
    assert by_op["c"]["after"]["repo"] == "r4"
    assert by_op["d"]["after"] is None
    assert by_op["d"]["before"]["repo"] == "r2"
    # the update PAIR collapsed into one envelope carrying both images
    assert by_op["u"]["before"]["content"] == "v1"
    assert by_op["u"]["after"]["content"] == "v2"
    assert len([r for r in rows if json.loads(r["value"])["op"] == "u"]) == 1


def test_emit_has_no_join_node(spark, tmp_path):
    """Update pairing must be the one-shuffle aggregation form, never a
    self-join (aliased self-joins on shared lineage plan as nested
    loops — NOTES.md)."""
    a = _mk(spark, tmp_path, "a")
    apply_batch(a, _chg(spark, [("r1", "v1", "insert", 1)]), 0)
    v1 = a.current_version()
    apply_batch(a, _chg(spark, [("r1", "v2", "update", 10)]), 1)
    feed = a.read_changes(v1)
    # operate on a cached feed so the emitter's own plan is isolated
    feed = feed.localCheckpoint()
    plan = (
        to_debezium(feed, KEYS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "hashpartitioning" in plan.lower(), plan
