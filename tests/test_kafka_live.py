"""Live Kafka connector (sources/kafka_live.py): wire-protocol client
vs an in-process fixture broker that VERIFIES record-batch CRC32C on
produce (the corruption gate, like the ODPS tunnel fixture), plus the
Structured Streaming tail -> fenced lake apply with checkpoint resume
pinned as "no fetch from offset 0 is ever re-issued".

The fixture broker speaks Metadata v1 / ListOffsets v1 / Produce v3 /
Fetch v4 with record batches v2 — the same classic-grammar encodings
the client sends, parsed independently in sources/kafka_broker.py (now a package module so the driver-gated cdc_kafka_apply query reuses it). The batch
LAYOUT itself is additionally pinned against a hand-built byte literal
(test_record_batch_golden_bytes) so a symmetric client/fixture codec
misreading cannot self-cancel.
"""

from __future__ import annotations

import json
import struct

import pytest

from datax_spark.sources.kafka_live import (
    EARLIEST,
    LATEST,
    Buf,
    KafkaClient,
    KafkaStreamReader,
    decode_record_batches,
    enc_bytes,
    enc_string,
    enc_varlong,
    encode_record_batch,
    kafka_read,
    kafka_write,
    murmur2,
    partition_for,
    tail_kafka_and_apply,
)
from datax_spark.sources.kafka_broker import start_broker
from datax_spark.sources.odps_live import crc32c


# ---------------------------------------------------------------------------
# fixture broker
# ---------------------------------------------------------------------------


@pytest.fixture()
def broker():
    srv = start_broker()
    yield srv
    srv.shutdown()
    srv.server_close()


def _client(srv) -> KafkaClient:
    host, port = srv.server_address
    return KafkaClient(host, port)


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------


def test_record_batch_golden_bytes():
    """Pin the v2 batch layout against a literal built field-by-field
    from the public spec — independent of the encoder's own helpers."""
    batch = encode_record_batch(7, [(b"k", b"val", 1000)])
    # record: attrs=0, tsDelta=0, offDelta=0, key len 1 'k',
    # value len 3 'val', 0 headers
    record = (
        b"\x00"          # record attributes
        b"\x00"          # timestamp delta varint(0)
        b"\x00"          # offset delta varint(0)
        b"\x02k"         # key length zigzag(1)=2
        b"\x06val"       # value length zigzag(3)=6
        b"\x00"          # headers count
    )
    body = bytes([len(record) << 1]) + record  # length varint
    after_crc = (
        struct.pack(">h", 0)       # attributes
        + struct.pack(">i", 0)     # last offset delta
        + struct.pack(">q", 1000)  # base timestamp
        + struct.pack(">q", 1000)  # max timestamp
        + struct.pack(">q", -1)    # producer id
        + struct.pack(">h", -1)    # producer epoch
        + struct.pack(">i", -1)    # base sequence
        + struct.pack(">i", 1)     # record count
        + body
    )
    expected = (
        struct.pack(">q", 7)                       # base offset
        + struct.pack(">i", 9 + len(after_crc))    # batch length
        + struct.pack(">i", 0)                     # leader epoch
        + b"\x02"                                  # magic
        + struct.pack(">I", crc32c(after_crc))
        + after_crc
    )
    assert batch == expected
    assert decode_record_batches(batch) == [(7, 1000, b"k", b"val")]


def test_record_batch_roundtrip_and_crc_gate():
    recs = [
        (None, b"v0", 100),
        (b"key1", None, 150),
        (b"key2", b"v2" * 1000, 175),
    ]
    blob = encode_record_batch(42, recs)
    got = decode_record_batches(blob)
    assert got == [(42 + i, ts, k, v) for i, (k, v, ts) in enumerate(recs)]
    # two concatenated batches (a fetch response may splice them)
    blob2 = blob + encode_record_batch(45, [(b"a", b"b", 200)])
    assert len(decode_record_batches(blob2)) == 4
    # flip one payload bit -> CRC gate raises, never partial rows
    bad = bytearray(blob)
    bad[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_record_batches(bytes(bad))


def test_record_batch_gzip():
    """gzip codec: attributes bit pinned, roundtrip equality, CRC gate
    still outermost, bad gzip bytes surface as ValueError (the broker's
    CORRUPT_MESSAGE arm), non-stdlib codecs refused loudly."""
    import gzip

    from datax_spark.sources.kafka_live import CODEC_GZIP

    recs = [(b"k%d" % i, b"payload-%d" % i * 50, 100 + i) for i in range(20)]
    blob = encode_record_batch(10, recs, codec=CODEC_GZIP)
    # attributes live 21 bytes in: 8 base offset + 4 len + 4 epoch +
    # 1 magic + 4 crc
    (attrs,) = struct.unpack_from(">h", blob, 21)
    assert attrs & 0x07 == CODEC_GZIP
    assert decode_record_batches(blob) == [
        (10 + i, ts, k, v) for i, (k, v, ts) in enumerate(recs)
    ]
    # repetitive payloads actually compress
    assert len(blob) < len(encode_record_batch(10, recs))
    # CRC gate fires before any gzip work
    bad = bytearray(blob)
    bad[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_record_batches(bytes(bad))
    # valid CRC over a corrupt gzip stream -> ValueError, not zlib.error
    after_crc = bytearray(blob[21:])
    gz_at = 2 + 4 + 8 + 8 + 8 + 2 + 4 + 4  # header fields before records
    after_crc[gz_at:] = b"\x1f\x8b" + b"garbage"
    forged = (
        blob[:8]
        + struct.pack(">i", 9 + len(after_crc))
        + blob[12:17]
        + struct.pack(">I", crc32c(bytes(after_crc)))
        + bytes(after_crc)
    )
    with pytest.raises(ValueError, match="gzip"):
        decode_record_batches(forged)
    # snappy/lz4/zstd: refused at encode with an actionable message
    with pytest.raises(ValueError, match="snappy"):
        encode_record_batch(0, recs, codec=2)
    # gzip container is deterministic (mtime=0) — byte-stable for CRC
    assert blob == encode_record_batch(10, recs, codec=CODEC_GZIP)
    # sanity: the records block really is standard gzip
    assert gzip.decompress(blob[21 + gz_at:]) is not None


def test_varlong_roundtrip():
    for v in (0, 1, -1, 63, 64, -64, -65, 300, -300, 2**31, -(2**31),
              2**62 - 1, -(2**62)):
        b = Buf(enc_varlong(v))
        assert b.varlong() == v


def test_partitioner_properties():
    assert murmur2(b"") == murmur2(b"")  # deterministic incl. empty
    seen = {partition_for(f"key-{i}".encode(), 8) for i in range(200)}
    assert seen == set(range(8))  # all partitions reachable
    for i in range(50):
        p = partition_for(f"k{i}".encode(), 3)
        assert 0 <= p < 3
        assert p == partition_for(f"k{i}".encode(), 3)


# ---------------------------------------------------------------------------
# client vs fixture broker
# ---------------------------------------------------------------------------


def test_client_metadata_offsets_produce_fetch(broker):
    broker.state.create_topic("events", 2)
    cli = _client(broker)
    try:
        assert cli.metadata(["events"]) == {"events": [0, 1]}
        assert cli.metadata() == {"events": [0, 1]}
        with pytest.raises(ValueError, match="error 3"):
            cli.metadata(["nope"])
        assert cli.list_offset("events", 0, EARLIEST) == 0
        assert cli.list_offset("events", 0, LATEST) == 0

        base = cli.produce("events", 0, [(b"k1", b"v1", 10), (None, b"v2", 11)])
        assert base == 0
        assert cli.produce("events", 0, [(b"k3", b"v3", 12)]) == 2
        assert cli.list_offset("events", 0, LATEST) == 3

        recs, hwm = cli.fetch("events", 0, 0)
        assert hwm == 3
        assert [(o, k, v) for o, _, k, v in recs] == [
            (0, b"k1", b"v1"), (1, None, b"v2"), (2, b"k3", b"v3")]
        # mid-log fetch honors the offset
        recs2, _ = cli.fetch("events", 0, 2)
        assert [(o, v) for o, _, _, v in recs2] == [(2, b"v3")]
        # caught-up fetch: empty, hwm unchanged
        recs3, hwm3 = cli.fetch("events", 0, 3)
        assert recs3 == [] and hwm3 == 3
    finally:
        cli.close()


def test_broker_rejects_corrupt_produce(broker):
    """The fixture's CRC verification is load-bearing: a corrupted batch
    comes back as CORRUPT_MESSAGE (2), which the client raises."""
    broker.state.create_topic("t", 1)
    cli = _client(broker)
    try:
        batch = bytearray(encode_record_batch(0, [(b"k", b"v", 1)]))
        batch[-1] ^= 0x01
        body = (
            enc_string(None) + struct.pack(">hi", 1, 30000)
            + struct.pack(">i", 1) + enc_string("t")
            + struct.pack(">i", 1) + struct.pack(">i", 0)
            + enc_bytes(bytes(batch))
        )
        buf = cli._request(0, 3, body)
        buf.i32(); buf.string(); buf.i32(); buf.i32()
        assert buf.i16() == 2  # CORRUPT_MESSAGE
        assert broker.state.logs[("t", 0)] == []
    finally:
        cli.close()


def test_gzip_produce_roundtrip(broker):
    """A gzip-compressed produce lands (the broker DECODES it — the
    both-directions verification gate covers the compressed path) and
    fetches back record-identical."""
    from datax_spark.sources.kafka_live import CODEC_GZIP

    broker.state.create_topic("gz", 1)
    cli = _client(broker)
    try:
        recs = [(b"k%d" % i, b"text " * 40 + b"%d" % i, 50 + i)
                for i in range(30)]
        base = cli.produce("gz", 0, recs, codec=CODEC_GZIP)
        assert base == 0
        got, hwm = cli.fetch("gz", 0, 0)
        assert hwm == 30
        assert got == [(i, ts, k, v) for i, (k, v, ts) in enumerate(recs)]
    finally:
        cli.close()


def test_stream_reader_offsets_and_pagination(broker):
    broker.state.create_topic("ev", 2)
    cli = _client(broker)
    try:
        for i in range(5):
            cli.produce("ev", i % 2, [(f"k{i}".encode(), f"v{i}".encode(), i)])
    finally:
        cli.close()
    host, port = broker.server_address
    opts = {"host": host, "port": str(port), "topics": "ev",
            "maxrecordsperpartition": "2"}
    r = KafkaStreamReader(opts)
    start = r.initialOffset()
    assert start == {"ev 0": 0, "ev 1": 0}
    rows1, off1 = r.read(start)
    rows1 = list(rows1)
    assert len(rows1) == 4  # capped at 2 per partition
    assert off1 == {"ev 0": 2, "ev 1": 2}
    rows2, off2 = r.read(off1)
    assert len(list(rows2)) == 1  # partition 0 has 3 records total
    assert off2 == {"ev 0": 3, "ev 1": 2}
    rows3, off3 = r.read(off2)
    assert list(rows3) == [] and off3 == off2
    # latest mode starts at the high watermark
    r2 = KafkaStreamReader(dict(opts, startingoffsets="latest"))
    assert r2.initialOffset() == {"ev 0": 3, "ev 1": 2}


# ---------------------------------------------------------------------------
# Spark batch read / producer write
# ---------------------------------------------------------------------------


def test_kafka_batch_read(spark, broker):
    broker.state.create_topic("batch", 3)
    cli = _client(broker)
    try:
        for i in range(30):
            pid = partition_for(f"k{i}".encode(), 3)
            cli.produce("batch", pid,
                        [(f"k{i}".encode(), f"v{i}".encode(), i)])
    finally:
        cli.close()
    host, port = broker.server_address
    df = kafka_read(spark, host, port, ["batch"])
    rows = df.collect()
    assert len(rows) == 30
    got = {bytes(r.key).decode(): bytes(r.value).decode() for r in rows}
    assert got == {f"k{i}": f"v{i}" for i in range(30)}
    for r in rows:
        assert r.partition == partition_for(bytes(r.key), 3)
    # empty topic -> empty frame with the contract schema
    broker.state.create_topic("empty", 1)
    edf = kafka_read(spark, host, port, ["empty"])
    assert edf.count() == 0 and "value" in edf.columns


def test_kafka_write_partitions_and_order(spark, broker):
    broker.state.create_topic("out", 4)
    host, port = broker.server_address
    rows = [(f"key-{i % 7}", f"payload-{i}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "key string, value string, seq long")
    totals = kafka_write(df, host, port, "out", order_col="seq",
                         batch_size=10)
    assert totals == {"written": 100, "errors": 0}
    # every record landed on the DefaultPartitioner-compatible partition
    # and per-key order follows seq (per-partition emit order)
    per_key: dict[bytes, list[int]] = {}
    for (topic, pid), log in broker.state.logs.items():
        if topic != "out":
            continue
        for _ts, k, v in log:
            assert pid == partition_for(k, 4)
            per_key.setdefault(k, []).append(
                int(v.decode().rsplit("-", 1)[1]))
    assert sum(len(v) for v in per_key.values()) == 100
    for k, seqs in per_key.items():
        assert seqs == sorted(seqs), f"order lost for {k!r}"


# ---------------------------------------------------------------------------
# streaming tail -> fenced apply, checkpoint resume
# ---------------------------------------------------------------------------

PAYLOAD_DDL = ("repo string, path string, commit string, lang string, "
               "content string")


def _dbz(repo, path, commit, content, seq, op="u", lang="py"):
    after = None if op == "d" else {
        "repo": repo, "path": path, "commit": commit, "lang": lang,
        "content": content}
    before = ({"repo": repo, "path": path, "commit": commit, "lang": lang,
               "content": content} if op == "d" else None)
    return json.dumps({
        "before": before, "after": after, "op": op, "ts_ms": seq,
        "source": {"lsn": seq, "table": "files"},
    })


def _seed_topic(broker, cli, n_keys=20, versions=3):
    """Debezium JSON envelopes over 2 partitions, keyed by repo —
    returns the expected final state under latest-wins."""
    broker.state.create_topic("dbz", 2)
    expected = {}
    seq = 0
    for v in range(versions):
        for j in range(n_keys):
            seq += 1
            key = f"r{j}".encode()
            pid = partition_for(key, 2)
            if v == versions - 1 and j % 5 == 0:
                cli.produce("dbz", pid, [(key, _dbz(
                    f"r{j}", "p", f"c{j}", f"x{v}-{j}", seq, op="d"
                ).encode(), seq)])
                expected.pop((f"r{j}", "p", f"c{j}"), None)
            else:
                cli.produce("dbz", pid, [(key, _dbz(
                    f"r{j}", "p", f"c{j}", f"x{v}-{j}", seq,
                    op="c" if v == 0 else "u").encode(), seq)])
                expected[(f"r{j}", "p", f"c{j}")] = f"x{v}-{j}"
    return expected


def test_tail_kafka_applies_and_resumes(spark, broker, tmp_path):
    from datax_spark.lake.table import LakeTable

    cli = _client(broker)
    try:
        expected = _seed_topic(broker, cli)
        payload = spark.createDataFrame([], PAYLOAD_DDL).schema
        table = LakeTable.create(
            spark, str(tmp_path / "tbl"), payload,
            key_cols=["repo", "path", "commit"], bucket_key="repo",
            num_buckets=4)
        host, port = broker.server_address
        tail_kafka_and_apply(
            spark, str(tmp_path / "tbl"), host, port, "dbz",
            checkpoint_dir=str(tmp_path / "ckpt"), envelope="debezium",
            timeout_sec=120, max_records_per_partition=25,
        )
        got = {(r.repo, r.path, r.commit): r.content
               for r in table.read().collect()}
        assert got == expected

        # late events + restart from the SAME checkpoint: every fetch of
        # run 2 starts at the checkpointed offsets — offset 0 is never
        # re-fetched (the consumer-group-resume analog, made crisp)
        broker.state.fetch_log.clear()
        seq = 10_000
        for j in (1, 2, 7):
            seq += 1
            key = f"r{j}".encode()
            cli.produce("dbz", partition_for(key, 2), [(key, _dbz(
                f"r{j}", "p", f"c{j}", f"late-{j}", seq).encode(), seq)])
            expected[(f"r{j}", "p", f"c{j}")] = f"late-{j}"
        tail_kafka_and_apply(
            spark, str(tmp_path / "tbl"), host, port, "dbz",
            checkpoint_dir=str(tmp_path / "ckpt"), envelope="debezium",
            timeout_sec=120, max_records_per_partition=25,
        )
        got2 = {(r.repo, r.path, r.commit): r.content
                for r in table.read().collect()}
        assert got2 == expected
        assert broker.state.fetch_log, "run 2 fetched nothing"
        assert min(off for _, _, off in broker.state.fetch_log) > 0
    finally:
        cli.close()


def test_kafka_mirror_roundtrip(spark, broker, tmp_path):
    """Full circle: lake table A's change feed -> to_debezium envelopes
    -> kafka_write (key-partitioned, commit-version ordered) -> wire ->
    tail_kafka_and_apply -> table B converges on A's exact state. The
    engine as CDC source AND sink over its own transport."""
    from datax_spark.lake.table import LakeTable
    from datax_spark.sources.envelope import to_debezium
    from datax_spark.streaming.pipeline import PipelineConfig, apply_batch

    payload = spark.createDataFrame([], PAYLOAD_DDL).schema
    keys = ["repo", "path", "commit"]
    a = LakeTable.create(spark, str(tmp_path / "a"), payload,
                         key_cols=keys, bucket_key="repo", num_buckets=4)
    v0 = a.current_version()

    def _events(rows):
        return spark.createDataFrame(
            rows, PAYLOAD_DDL + ", op string, seq long")

    apply_batch(a, _events(
        [(f"r{j}", "p", f"c{j}", "py", f"v0-{j}", "insert", j)
         for j in range(15)]), batch_id=1, config=PipelineConfig())
    apply_batch(a, _events(
        [(f"r{j}", "p", f"c{j}", "py", f"v1-{j}", "update", 100 + j)
         for j in range(0, 15, 3)]
        + [("r1", "p", "c1", "py", "v0-1", "delete", 200)]),
        batch_id=2, config=PipelineConfig())

    broker.state.create_topic("mirror", 3)
    host, port = broker.server_address
    env = to_debezium(a.read_changes(v0), keys)
    totals = kafka_write(env, host, port, "mirror",
                         order_col="_commit_version")
    assert totals["errors"] == 0 and totals["written"] > 0

    b = LakeTable.create(spark, str(tmp_path / "b"), payload,
                         key_cols=keys, bucket_key="repo", num_buckets=2)
    tail_kafka_and_apply(
        spark, str(tmp_path / "b"), host, port, "mirror",
        checkpoint_dir=str(tmp_path / "ckpt_b"), envelope="debezium",
        timeout_sec=120,
    )
    state_a = {tuple(r) for r in a.read().select(*payload.names).collect()}
    state_b = {tuple(r) for r in b.read().select(*payload.names).collect()}
    assert state_b == state_a and len(state_a) == 14
