"""Offsets ride the commit: each applied micro-batch records its Kafka
end-offset map inside the stream's fence entry (streams.<sid>.
source_offsets) in the SAME atomic commit as the data — the Delta
``txn`` idempotent-writer pattern. A LOST streaming checkpoint then
resumes from the table itself (starting_offsets='table'), re-reading
only from the last recorded offsets instead of the whole topic, under a
version-derived stream id (a fresh checkpoint restarts batch ids at 0;
the old fence would swallow them).

The offset map comes from the checkpoint's own offset log (written
durably BEFORE foreachBatch runs) — zero extra Spark actions, so the
2-actions-per-batch invariant holds with recording ON (asserted in
test_apply_batch_is_two_actions's suite separately; here we pin the
recovery semantics).
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.table import LakeTable
from datax_spark.oracle import state_fingerprint
from datax_spark.sources.kafka_broker import start_broker
from datax_spark.sources.kafka_live import (
    batch_end_offsets,
    kafka_resume_offsets,
    tail_kafka_and_apply,
)
from datax_spark.streaming.pipeline import apply_batch
from datax_spark.streaming.relay import emit_changes_kafka

PAYLOAD = StructType(
    [StructField(c, StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
KEYS = ["repo", "path", "commit"]


@pytest.fixture()
def broker():
    srv = start_broker()
    yield srv
    srv.shutdown()
    srv.server_close()


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


def _tail(spark, dst, broker, topic, ckpt, **kw):
    host, port = broker.server_address
    tail_kafka_and_apply(
        spark, dst.path, host, port, topic, ckpt,
        payload_schema=PAYLOAD, timeout_sec=90.0, **kw,
    )


def test_batch_end_offsets_parses_offset_log(tmp_path):
    d = tmp_path / "ck" / "offsets"
    d.mkdir(parents=True)
    (d / "3").write_text(
        "v1\n"
        '{"batchWatermarkMs":0,"batchTimestampMs":1}\n'
        '{"t 0": 7, "t 1": 2}\n'
    )
    assert batch_end_offsets(str(tmp_path / "ck"), 3) == {"t 0": 7, "t 1": 2}
    # fail-open arms: absent batch, unparseable content
    assert batch_end_offsets(str(tmp_path / "ck"), 9) is None
    (d / "4").write_text("v1\nnot json\n")
    assert batch_end_offsets(str(tmp_path / "ck"), 4) is None


def test_offsets_ride_the_commit(spark, tmp_path, broker):
    src = _mk(spark, tmp_path, "src")
    dst = _mk(spark, tmp_path, "dst")
    broker.state.create_topic("t", 3)
    host, port = broker.server_address
    apply_batch(src, _chg(spark, [
        ("r%d" % i, "v1", "insert", i) for i in range(1, 13)
    ]), 0)
    emit_changes_kafka(src, host, port, "t", str(tmp_path / "cur"))
    _tail(spark, dst, broker, "t", str(tmp_path / "ck"))
    assert _fp(dst) == _fp(src)

    # the fence entry carries the consumed end-offset map, equal to the
    # broker's actual high-water marks
    streams = dst.snapshot().properties["streams"]
    offs = {
        k: v for e in streams.values()
        for k, v in e.get("source_offsets", {}).items()
    }
    hwm = {
        f"t {p}": len(log)
        for (t, p), log in broker.state.logs.items() if t == "t"
    }
    assert offs == hwm
    assert kafka_resume_offsets(dst, "t") == offs
    # a topic never recorded -> None (caller falls back to earliest)
    assert kafka_resume_offsets(dst, "other") is None


def test_checkpoint_loss_resumes_from_table_offsets(spark, tmp_path, broker):
    src = _mk(spark, tmp_path, "src")
    dst = _mk(spark, tmp_path, "dst")
    broker.state.create_topic("t", 3)
    host, port = broker.server_address
    cur = str(tmp_path / "cur")
    ckpt = str(tmp_path / "ck")

    apply_batch(src, _chg(spark, [
        ("r%d" % i, "v1", "insert", i) for i in range(1, 13)
    ]), 0)
    emit_changes_kafka(src, host, port, "t", cur)
    _tail(spark, dst, broker, "t", ckpt)
    assert _fp(dst) == _fp(src)
    recorded = kafka_resume_offsets(dst, "t")
    assert recorded and sum(recorded.values()) > 0

    # the checkpoint is LOST; more changes land on the topic meanwhile
    shutil.rmtree(ckpt)
    apply_batch(src, _chg(spark, [
        ("r1", "v2", "update", 100), ("r2", None, "delete", 101),
        ("r99", "new", "insert", 102),
    ]), 1)
    emit_changes_kafka(src, host, port, "t", cur)

    mark = len(broker.state.fetch_log)
    _tail(spark, dst, broker, "t", str(tmp_path / "ck2"),
          starting_offsets="table")
    assert _fp(dst) == _fp(src)
    # the resumed query started AT the recorded offsets — it never
    # re-fetched the already-applied prefix of the topic
    resumed_fetches = broker.state.fetch_log[mark:]
    assert resumed_fetches
    for topic, pid, off in resumed_fetches:
        assert off >= recorded[f"{topic} {pid}"], (topic, pid, off)
    # and the resume ran under a version-derived stream id whose fence
    # accepted batch 0 of the fresh checkpoint
    sids = [s for s in dst.snapshot().properties["streams"] if "@v" in s]
    assert sids, dst.snapshot().properties["streams"]


def test_resume_table_without_recorded_offsets_reads_earliest(
    spark, tmp_path, broker
):
    src = _mk(spark, tmp_path, "src")
    dst = _mk(spark, tmp_path, "dst")
    broker.state.create_topic("t", 2)
    host, port = broker.server_address
    apply_batch(src, _chg(spark, [
        ("a", "v1", "insert", 1), ("b", "w1", "insert", 2),
    ]), 0)
    emit_changes_kafka(src, host, port, "t", str(tmp_path / "cur"))
    # dst never tailed before and carries no offsets -> earliest
    _tail(spark, dst, broker, "t", str(tmp_path / "ck"),
          starting_offsets="table")
    assert _fp(dst) == _fp(src)


def test_record_offsets_off_keeps_fence_entry_lean(spark, tmp_path, broker):
    src = _mk(spark, tmp_path, "src")
    dst = _mk(spark, tmp_path, "dst")
    broker.state.create_topic("t", 2)
    host, port = broker.server_address
    apply_batch(src, _chg(spark, [("a", "v1", "insert", 1)]), 0)
    emit_changes_kafka(src, host, port, "t", str(tmp_path / "cur"))
    _tail(spark, dst, broker, "t", str(tmp_path / "ck"),
          record_offsets=False)
    assert _fp(dst) == _fp(src)
    for e in dst.snapshot().properties["streams"].values():
        assert "source_offsets" not in e
    assert kafka_resume_offsets(dst, "t") is None
