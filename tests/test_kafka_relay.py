"""Lake -> Kafka -> lake replication (streaming/relay.emit_changes_kafka
+ sources/kafka_live.tail_kafka_and_apply).

The wire-transport twin of test_relay.py: the bus is the real Produce/
Fetch protocol against the embedded broker instead of segment dirs.
Delivery contract under test: at-least-once transport (cursor advances
only after a clean produce of the whole window; a produce error leaves
it, the retry re-emits the window) x seq-idempotent latest-wins apply
(source.lsn = commit version) = the consumer's END state converges on
the producer's no matter how many duplicates land on the topic.
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql.types import StringType, StructField, StructType

from datax_spark.lake.table import LakeTable
from datax_spark.oracle import state_fingerprint
from datax_spark.sources.kafka_broker import start_broker
from datax_spark.sources.kafka_live import tail_kafka_and_apply
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


def _tail(spark, dst, broker, topic, ckpt):
    host, port = broker.server_address
    tail_kafka_and_apply(
        spark, dst.path, host, port, topic, ckpt,
        payload_schema=PAYLOAD, timeout_sec=90.0,
    )


def test_kafka_relay_replicates_and_converges(spark, tmp_path, broker):
    src = _mk(spark, tmp_path, "src")
    dst = _mk(spark, tmp_path, "dst")
    cursor_dir = str(tmp_path / "emit_cursor")
    ckpt = str(tmp_path / "ckpt")
    broker.state.create_topic("relay", 3)
    host, port = broker.server_address

    apply_batch(src, _chg(spark, [
        ("r1", "v1", "insert", 1), ("r2", "w1", "insert", 2),
    ]), 0)
    apply_batch(src, _chg(spark, [
        ("r1", "v2", "update", 10), ("r2", None, "delete", 11),
        ("r3", "x1", "insert", 12),
    ]), 1)

    emitted = emit_changes_kafka(src, host, port, "relay", cursor_dir)
    assert emitted == list(range(2, src.current_version() + 1))
    _tail(spark, dst, broker, "relay", ckpt)
    assert _fp(dst) == _fp(src)

    # up to date -> no emit
    assert emit_changes_kafka(src, host, port, "relay", cursor_dir) == []

    # crash between produce and cursor write: rewind the cursor, re-emit
    # -> the SAME window lands again as duplicate envelopes; the resumed
    # tail (same checkpoint) drains them and the end state is unchanged
    cur = json.load(open(os.path.join(cursor_dir, "_cursor.json")))
    with open(os.path.join(cursor_dir, "_cursor.json"), "w") as f:
        json.dump({"emitted_version": cur["emitted_version"] - 1}, f)
    re_emitted = emit_changes_kafka(src, host, port, "relay", cursor_dir)
    assert re_emitted == [src.current_version()]
    _tail(spark, dst, broker, "relay", ckpt)
    assert _fp(dst) == _fp(src)


def test_kafka_relay_produce_failure_leaves_cursor(spark, tmp_path, broker):
    """A produce error raises WITHOUT advancing the cursor; after the
    broker heals, the retry re-emits the whole window (now extended by a
    newer commit) and the consumer converges through the duplicates."""
    src = _mk(spark, tmp_path, "src")
    dst = _mk(spark, tmp_path, "dst")
    cursor_dir = str(tmp_path / "emit_cursor")
    ckpt = str(tmp_path / "ckpt")
    broker.state.create_topic("relay", 3)
    host, port = broker.server_address

    apply_batch(src, _chg(spark, [
        ("r%d" % i, "v1", "insert", i) for i in range(1, 9)
    ]), 0)
    emit_changes_kafka(src, host, port, "relay", cursor_dir)
    _tail(spark, dst, broker, "relay", ckpt)
    assert _fp(dst) == _fp(src)

    # break ONE partition that demonstrably carries traffic (same keys
    # update in batch 1, so it will again): its produce returns
    # UNKNOWN_TOPIC_OR_PARTITION while the others may succeed -> a
    # PARTIAL window lands on the topic
    victim = next(
        p for (t, p), log in sorted(broker.state.logs.items()) if log
    )
    # None (not pop) keeps the partition in the Metadata response — the
    # partitioner modulus must not change — while produce hits the
    # missing-log arm
    dead = broker.state.logs[("relay", victim)]
    broker.state.logs[("relay", victim)] = None
    apply_batch(src, _chg(spark, [
        ("r%d" % i, "v2", "update", 100 + i) for i in range(1, 9)
    ]), 1)
    before = json.load(open(os.path.join(cursor_dir, "_cursor.json")))
    with pytest.raises(RuntimeError, match="cursor not advanced"):
        emit_changes_kafka(src, host, port, "relay", cursor_dir)
    after = json.load(open(os.path.join(cursor_dir, "_cursor.json")))
    assert after == before

    # heal + retry: the full window re-emits (duplicating whatever the
    # partial attempt already landed on the healthy partitions)
    broker.state.logs[("relay", victim)] = dead
    assert emit_changes_kafka(src, host, port, "relay", cursor_dir) == [
        src.current_version()
    ]
    _tail(spark, dst, broker, "relay", ckpt)
    assert _fp(dst) == _fp(src)


def test_kafka_relay_confluent_avro_loop(spark, tmp_path, broker):
    """The production encoding end-to-end: the relay emits Confluent-
    framed AVRO envelopes (debezium_avro_schema generated from the
    payload schema), the consumer decodes them over the same wire with
    the offline schema map, and the states converge."""
    from datax_spark.sources.envelope_avro import debezium_avro_schema

    src = _mk(spark, tmp_path, "src")
    dst = _mk(spark, tmp_path, "dst")
    cursor_dir = str(tmp_path / "emit_cursor")
    ckpt = str(tmp_path / "ckpt")
    broker.state.create_topic("relay-avro", 2)
    host, port = broker.server_address
    schema = debezium_avro_schema(PAYLOAD)

    apply_batch(src, _chg(spark, [
        ("r1", "v1", "insert", 1), ("r2", "w1", "insert", 2),
    ]), 0)
    apply_batch(src, _chg(spark, [
        ("r1", "v2", "update", 10), ("r2", None, "delete", 11),
    ]), 1)

    emitted = emit_changes_kafka(
        src, host, port, "relay-avro", cursor_dir,
        value_format="confluent_avro", schema_id=7, avro_schema=schema,
    )
    assert emitted == list(range(2, src.current_version() + 1))
    # the topic really carries framed Avro, not JSON text
    blob = next(
        v for log in broker.state.logs.values() if log
        for (_ts, _k, v) in log
    )
    assert blob[0] == 0x00 and blob[1:5] == (7).to_bytes(4, "big")
    tail_kafka_and_apply(
        spark, dst.path, host, port, "relay-avro", ckpt,
        payload_schema=PAYLOAD, value_format="confluent_avro",
        registry_schemas={7: schema}, timeout_sec=90.0,
    )
    assert _fp(dst) == _fp(src)


def test_debezium_avro_schema_rejects_lossy_types(spark):
    from pyspark.sql.types import BinaryType

    from datax_spark.sources.envelope_avro import debezium_avro_schema

    bad = StructType(
        [StructField("k", StringType()), StructField("blob", BinaryType())]
    )
    with pytest.raises(ValueError, match="blob"):
        debezium_avro_schema(bad)
