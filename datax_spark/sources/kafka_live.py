"""Live Kafka source/sink speaking the public wire protocol (stdlib).

The reference has no Kafka plugin — but the north-rule ingest path
("binlog/WAL tail -> lake upsert") is, in every production deployment
of the capture stacks this engine already parses (Debezium via Kafka
Connect, Canal's MQ mode, Maxwell), delivered THROUGH Kafka. This
module closes that transport gap with the same recipe as the other
eleven live connectors in this repo: a stdlib-socket client speaking
the documented public protocol, split planning driver-side, and an
in-process fixture broker in the test file that VERIFIES the bytes
(record-batch CRC32C is checked on BOTH directions — the corruption
gate, like the ODPS tunnel fixture).

Protocol surface (public Kafka protocol guide, non-flexible versions so
the primitive grammar stays the classic one — INT16/INT32/INT64 big
endian, STRING = int16 length, BYTES = int32 length, ARRAY = int32
count):

- Metadata v1 (api key 3) — topic/partition discovery;
- ListOffsets v1 (api key 2) — earliest/latest log offsets;
- Produce v3 (api key 0) — first version carrying record batches v2;
- Fetch v4 (api key 1) — first version carrying record batches v2.

Record batches use the **v2 (magic 2) format**: the current on-disk and
wire layout, CRC32C (Castagnoli) over the batch from the attributes
field onward, zigzag-varint record framing — implemented here from the
spec and shared by client and fixture, so each side verifies bytes the
other produced.

Fidelity notes, stated plainly: single-broker bootstrap (the fixture is
one node; against a real cluster the Metadata response's leader map
would route per-partition connections — the split planning already
keys on it), no SASL/TLS, no transactions (READ_UNCOMMITTED).
Compression: none + gzip (the stdlib-expressible codecs; snappy/lz4/
zstd would need libraries this environment does not ship). Those are
breadth, not shape.

Scale shape: the streaming source's offset map is
``{topic-partition: next offset}`` — Structured Streaming's checkpoint
replaces Kafka consumer-group state entirely (no __consumer_offsets
round-trip, no rebalance protocol needed: partition assignment is the
engine's job here). Records flow into the same fenced ``apply_batch``
as every other changelog source.
"""

from __future__ import annotations

import json
import os
import socket
import struct
import threading
from typing import Any, Iterator, Tuple

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve in module scope

from datax_spark.sources.odps_live import crc32c

API_PRODUCE, API_FETCH, API_LIST_OFFSETS, API_METADATA = 0, 1, 2, 3

EARLIEST, LATEST = -2, -1


# ---------------------------------------------------------------------------
# primitive grammar (classic / non-flexible)
# ---------------------------------------------------------------------------


class Buf:
    __slots__ = ("b", "p")

    def __init__(self, b: bytes, p: int = 0):
        self.b, self.p = b, p

    def _unpack(self, fmt: str, size: int):
        (v,) = struct.unpack_from(fmt, self.b, self.p)
        self.p += size
        return v

    def i8(self): return self._unpack(">b", 1)
    def i16(self): return self._unpack(">h", 2)
    def i32(self): return self._unpack(">i", 4)
    def i64(self): return self._unpack(">q", 8)
    def u32(self): return self._unpack(">I", 4)

    def string(self) -> str | None:
        n = self.i16()
        if n < 0:
            return None
        v = self.b[self.p:self.p + n].decode("utf-8")
        self.p += n
        return v

    def bytes_(self) -> bytes | None:
        n = self.i32()
        if n < 0:
            return None
        v = self.b[self.p:self.p + n]
        self.p += n
        return v

    def varlong(self) -> int:
        shift = acc = 0
        while True:
            byte = self.b[self.p]
            self.p += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)


def enc_string(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode("utf-8")
    return struct.pack(">h", len(b)) + b


def enc_bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def enc_varlong(v: int) -> bytes:
    acc = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = bytearray()
    while True:
        byte = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


# ---------------------------------------------------------------------------
# record batch v2 (magic 2) — shared by client and fixture broker
# ---------------------------------------------------------------------------


#: attributes bits 0-2 = compression codec (public protocol constants).
CODEC_NONE, CODEC_GZIP = 0, 1
_CODEC_NAMES = {0: "none", 1: "gzip", 2: "snappy", 3: "lz4", 4: "zstd"}


def encode_record_batch(
    base_offset: int,
    records: list[tuple[bytes | None, bytes | None, int]],
    codec: int = CODEC_NONE,
) -> bytes:
    """records: [(key, value, timestamp_ms)]; producer fields -1
    (idempotence off). ``codec`` sets attributes bits 0-2; gzip (1)
    compresses the records block — the individual record frames,
    concatenated — exactly as the Java client does, with the batch
    header (and the CRC) staying uncompressed. mtime=0 keeps the gzip
    container deterministic (byte-stable batches for the CRC gate)."""
    if not records:
        raise ValueError("empty record batch")
    if codec not in (CODEC_NONE, CODEC_GZIP):
        raise ValueError(
            f"unsupported produce codec {_CODEC_NAMES.get(codec, codec)}: "
            "only none/gzip are stdlib-expressible (snappy/lz4/zstd need "
            "libraries this environment does not ship)"
        )
    base_ts = records[0][2]
    max_ts = max(t for _, _, t in records)
    body = bytearray()
    for i, (key, value, ts) in enumerate(records):
        rec = bytearray()
        rec += b"\x00"  # record attributes
        rec += enc_varlong(ts - base_ts)
        rec += enc_varlong(i)  # offset delta
        for blob in (key, value):
            if blob is None:
                rec += enc_varlong(-1)
            else:
                rec += enc_varlong(len(blob))
                rec += blob
        rec += enc_varlong(0)  # headers count
        body += enc_varlong(len(rec))
        body += rec
    if codec == CODEC_GZIP:
        import gzip as _gzip

        body = _gzip.compress(bytes(body), mtime=0)
    after_crc = (
        struct.pack(">h", codec)                 # attributes
        + struct.pack(">i", len(records) - 1)    # last offset delta
        + struct.pack(">q", base_ts)
        + struct.pack(">q", max_ts)
        + struct.pack(">q", -1)                  # producer id
        + struct.pack(">h", -1)                  # producer epoch
        + struct.pack(">i", -1)                  # base sequence
        + struct.pack(">i", len(records))
        + bytes(body)
    )
    crc = crc32c(after_crc)
    tail = (
        struct.pack(">i", 0)   # partition leader epoch
        + struct.pack(">b", 2)  # magic
        + struct.pack(">I", crc)
        + after_crc
    )
    return struct.pack(">q", base_offset) + struct.pack(">i", len(tail)) + tail


def decode_record_batches(
    blob: bytes,
) -> list[tuple[int, int, bytes | None, bytes | None]]:
    """A fetch record-set may concatenate several batches. Returns
    [(offset, timestamp_ms, key, value)]. CRC32C is VERIFIED on every
    batch — a corrupt frame raises, it never yields partial rows."""
    out: list[tuple[int, int, bytes | None, bytes | None]] = []
    buf = Buf(blob)
    while buf.p + 12 <= len(blob):
        base_offset = buf.i64()
        batch_len = buf.i32()
        if buf.p + batch_len > len(blob):
            break  # partial batch at the tail of a size-capped fetch
        end = buf.p + batch_len
        buf.i32()  # partition leader epoch
        magic = buf.i8()
        if magic != 2:
            raise ValueError(f"unsupported record batch magic {magic}")
        crc = buf.u32()
        if crc32c(blob[buf.p:end]) != crc:
            raise ValueError("record batch CRC32C mismatch")
        attrs = buf.i16()
        codec = attrs & 0x07
        buf.i32()  # last offset delta
        base_ts = buf.i64()
        buf.i64()  # max ts
        buf.i64(); buf.i16(); buf.i32()  # producer id/epoch, base seq
        n = buf.i32()
        if codec == CODEC_NONE:
            rbuf = Buf(blob, buf.p)
            rend = end
        elif codec == CODEC_GZIP:
            import gzip as _gzip

            try:
                raw = _gzip.decompress(blob[buf.p:end])
            except Exception as exc:  # zlib.error / EOFError / OSError
                raise ValueError(f"bad gzip records block: {exc}") from exc
            rbuf = Buf(raw)
            rend = len(raw)
        else:
            raise ValueError(
                f"unsupported fetch codec {_CODEC_NAMES.get(codec, codec)}"
            )
        rblob = rbuf.b
        for _ in range(n):
            rec_len = rbuf.varlong()
            rec_end = rbuf.p + rec_len
            rbuf.i8()  # record attributes
            ts_delta = rbuf.varlong()
            off_delta = rbuf.varlong()
            klen = rbuf.varlong()
            key = None
            if klen >= 0:
                key = rblob[rbuf.p:rbuf.p + klen]
                rbuf.p += klen
            vlen = rbuf.varlong()
            value = None
            if vlen >= 0:
                value = rblob[rbuf.p:rbuf.p + vlen]
                rbuf.p += vlen
            hdrs = rbuf.varlong()
            for _ in range(hdrs):
                hk = rbuf.varlong(); rbuf.p += max(hk, 0)
                hv = rbuf.varlong(); rbuf.p += max(hv, 0)
            if rbuf.p != rec_end:
                raise ValueError("record length mismatch")
            out.append(
                (base_offset + off_delta, base_ts + ts_delta, key, value)
            )
        if rbuf.p != rend:
            raise ValueError("record batch trailing bytes")
        buf.p = end
    return out


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------


class KafkaClient:
    """Minimal single-bootstrap Kafka client. Thread-safe per instance
    (one socket, one in-flight request — the lock serializes; the
    streaming source runs it driver-side, the batch reader opens one
    client per slice inside mapInPandas)."""

    def __init__(self, host: str, port: int, client_id: str = "datax-spark",
                 timeout: float = 10.0):
        self.host, self.port = host, port
        self.client_id = client_id
        self.timeout = timeout
        self._sock: socket.socket | None = None
        self._corr = 0
        self._lock = threading.Lock()

    def _conn(self) -> socket.socket:
        if self._sock is None:
            self._sock = socket.create_connection(
                (self.host, self.port), timeout=self.timeout
            )
        return self._sock

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None

    def _request(self, api_key: int, api_version: int, body: bytes) -> Buf:
        with self._lock:
            self._corr += 1
            corr = self._corr
            header = (
                struct.pack(">hhi", api_key, api_version, corr)
                + enc_string(self.client_id)
            )
            msg = header + body
            sock = self._conn()
            sock.sendall(struct.pack(">i", len(msg)) + msg)
            raw = self._read_frame(sock)
            buf = Buf(raw)
            got = buf.i32()
            if got != corr:
                raise ValueError(f"correlation id mismatch {got} != {corr}")
            return buf

    @staticmethod
    def _read_frame(sock: socket.socket) -> bytes:
        hdr = b""
        while len(hdr) < 4:
            chunk = sock.recv(4 - len(hdr))
            if not chunk:
                raise ConnectionError("broker closed connection")
            hdr += chunk
        (n,) = struct.unpack(">i", hdr)
        out = bytearray()
        while len(out) < n:
            chunk = sock.recv(n - len(out))
            if not chunk:
                raise ConnectionError("broker closed mid-frame")
            out += chunk
        return bytes(out)

    # -- Metadata v1 --------------------------------------------------------

    def metadata(self, topics: list[str] | None = None) -> dict[str, list[int]]:
        """{topic: [partition ids]} (error codes raised per topic)."""
        if topics is None:
            body = struct.pack(">i", -1)  # null array = all topics
        else:
            body = struct.pack(">i", len(topics)) + b"".join(
                enc_string(t) for t in topics
            )
        buf = self._request(API_METADATA, 1, body)
        for _ in range(buf.i32()):  # brokers
            buf.i32(); buf.string(); buf.i32(); buf.string()
        buf.i32()  # controller id
        out: dict[str, list[int]] = {}
        for _ in range(buf.i32()):  # topics
            err = buf.i16()
            name = buf.string()
            buf.i8()  # is_internal
            parts = []
            for _ in range(buf.i32()):
                perr = buf.i16()
                pid = buf.i32()
                buf.i32()  # leader
                for _ in range(buf.i32()):
                    buf.i32()  # replicas
                for _ in range(buf.i32()):
                    buf.i32()  # isr
                if perr:
                    raise ValueError(f"partition error {perr} on {name}")
                parts.append(pid)
            if err:
                raise ValueError(f"metadata error {err} on topic {name}")
            out[name] = sorted(parts)
        return out

    # -- ListOffsets v1 -----------------------------------------------------

    def list_offset(self, topic: str, partition: int, ts: int = LATEST) -> int:
        body = (
            struct.pack(">i", -1)  # replica id
            + struct.pack(">i", 1) + enc_string(topic)
            + struct.pack(">i", 1)
            + struct.pack(">iq", partition, ts)
        )
        buf = self._request(API_LIST_OFFSETS, 1, body)
        for _ in range(buf.i32()):
            buf.string()
            for _ in range(buf.i32()):
                buf.i32()  # partition
                err = buf.i16()
                buf.i64()  # timestamp
                off = buf.i64()
                if err:
                    raise ValueError(f"list_offsets error {err}")
                return off
        raise ValueError("empty ListOffsets response")

    # -- Produce v3 ---------------------------------------------------------

    def produce(
        self,
        topic: str,
        partition: int,
        records: list[tuple[bytes | None, bytes | None, int]],
        acks: int = 1,
        codec: int = CODEC_NONE,
    ) -> int:
        """Append one record batch; returns the base offset assigned."""
        batch = encode_record_batch(0, records, codec=codec)
        body = (
            enc_string(None)  # transactional id
            + struct.pack(">hi", acks, 30000)
            + struct.pack(">i", 1) + enc_string(topic)
            + struct.pack(">i", 1)
            + struct.pack(">i", partition) + enc_bytes(batch)
        )
        buf = self._request(API_PRODUCE, 3, body)
        base = -1
        for _ in range(buf.i32()):
            buf.string()
            for _ in range(buf.i32()):
                buf.i32()  # partition
                err = buf.i16()
                base = buf.i64()
                buf.i64()  # log append time
                if err:
                    raise ValueError(f"produce error {err}")
        buf.i32()  # throttle
        return base

    # -- Fetch v4 -----------------------------------------------------------

    def fetch(
        self,
        topic: str,
        partition: int,
        offset: int,
        max_bytes: int = 1 << 20,
        max_wait_ms: int = 100,
    ) -> tuple[list[tuple[int, int, bytes | None, bytes | None]], int]:
        """-> ([(offset, ts, key, value)] from ``offset`` on, high
        watermark). Empty list + hwm == offset means caught up."""
        body = (
            struct.pack(">iiii", -1, max_wait_ms, 1, max_bytes)
            + struct.pack(">b", 0)  # READ_UNCOMMITTED
            + struct.pack(">i", 1) + enc_string(topic)
            + struct.pack(">i", 1)
            + struct.pack(">iqi", partition, offset, max_bytes)
        )
        buf = self._request(API_FETCH, 4, body)
        buf.i32()  # throttle
        records: list[tuple[int, int, bytes | None, bytes | None]] = []
        hwm = -1
        for _ in range(buf.i32()):
            buf.string()
            for _ in range(buf.i32()):
                buf.i32()  # partition
                err = buf.i16()
                hwm = buf.i64()
                buf.i64()  # last stable offset
                n_aborted = buf.i32()
                for _ in range(max(n_aborted, 0)):
                    buf.i64(); buf.i64()
                blob = buf.bytes_() or b""
                if err:
                    raise ValueError(f"fetch error {err}")
                # a batch may start below the requested offset (batches
                # are the storage unit) — filter client-side like the
                # real consumer does
                records.extend(
                    r for r in decode_record_batches(blob) if r[0] >= offset
                )
        return records, hwm


# ---------------------------------------------------------------------------
# Structured Streaming source (same tier as ots_stream)
# ---------------------------------------------------------------------------

KAFKA_STREAM_SCHEMA = (
    "topic string, partition int, offset long, ts long, key binary, "
    "value binary"
)


def murmur2(data: bytes) -> int:
    """Kafka's murmur2 (the DefaultPartitioner hash, public algorithm —
    seed 0x9747b28c). ``partition_for`` below reproduces
    ``toPositive(murmur2(key)) % numPartitions`` so rows this engine
    produces land on the same partitions a Java producer would pick."""
    length = len(data)
    m, r = 0x5BD1E995, 24
    h = (0x9747B28C ^ length) & 0xFFFFFFFF
    i = 0
    while length - i >= 4:
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> r
        k = (k * m) & 0xFFFFFFFF
        h = ((h * m) & 0xFFFFFFFF) ^ k
        i += 4
    rem = length - i
    if rem == 3:
        h ^= data[i + 2] << 16
    if rem >= 2:
        h ^= data[i + 1] << 8
    if rem >= 1:
        h ^= data[i]
        h = (h * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h


def partition_for(key: bytes, num_partitions: int) -> int:
    return (murmur2(key) & 0x7FFFFFFF) % num_partitions


def _tp(topic: str, partition: int) -> str:
    return f"{topic} {partition}"


class KafkaStreamReader:
    """SimpleDataSourceStreamReader tier: the OFFSET is the per-
    topic-partition next-fetch map, so the Structured Streaming
    checkpoint replaces consumer-group state (see module docstring).
    Driver prefetch bounds per-batch volume via maxRecordsPerPartition —
    the maxFilesPerTrigger analog; at cluster scale the partitioned
    DataSourceStreamReader tier would fan fetches to executors (the
    executor-parallel shape is proven by the batch reader below)."""

    def __init__(self, options: dict):
        o = options
        self.host = o["host"]
        self.port = int(o["port"])
        self.topics = [t for t in o["topics"].split(",") if t]
        self.start = o.get("startingoffsets", "earliest")
        self.max_per_part = int(o.get("maxrecordsperpartition", 10000))

    # one client per call: KafkaClient carries a socket and a lock —
    # neither survives pickling, and the reader object must stay
    # serializable for the engine's wrapper

    def initialOffset(self) -> dict:
        # explicit start map ('{"topic pid": next_offset}') — the
        # offsets-ride-the-commit resume path (kafka_resume_offsets);
        # partitions it does not name start at 0 via _read's setdefault
        if self.start.lstrip().startswith("{"):
            return {k: int(v) for k, v in json.loads(self.start).items()}
        cli = KafkaClient(self.host, self.port)
        try:
            ts = EARLIEST if self.start == "earliest" else LATEST
            out = {}
            meta = cli.metadata(self.topics)
            for topic in self.topics:
                for pid in meta.get(topic, []):
                    out[_tp(topic, pid)] = cli.list_offset(topic, pid, ts)
            return out
        finally:
            cli.close()

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        cli = KafkaClient(self.host, self.port)
        try:
            return self._read(cli, start)
        finally:
            cli.close()

    def _read(self, cli: KafkaClient, start: dict) -> Tuple[Iterator[tuple], dict]:
        offsets = dict(start)
        # fold in partitions created after the checkpoint was laid down
        meta = cli.metadata(self.topics)
        for topic in self.topics:
            for pid in meta.get(topic, []):
                offsets.setdefault(_tp(topic, pid), 0)
        rows: list[tuple] = []
        for key in sorted(offsets):
            topic, _, pid_s = key.partition(" ")
            pid = int(pid_s)
            pos = offsets[key]
            pulled = 0
            while pulled < self.max_per_part:
                recs, hwm = cli.fetch(topic, pid, pos)
                if not recs:
                    break
                for off, ts, k, v in recs:
                    rows.append((topic, pid, off, ts, k, v))
                    pos = off + 1
                    pulled += 1
                    if pulled >= self.max_per_part:
                        break
                if pos >= hwm:
                    break
            offsets[key] = pos
        return iter(rows), offsets

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; broker holds no state


def kafka_stream_source():
    """Build the DataSource class lazily (pyspark import stays optional
    for pure-protocol users of this module)."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class _Reader(KafkaStreamReader, SimpleDataSourceStreamReader):
        def __init__(self, options):
            KafkaStreamReader.__init__(self, options)

    class KafkaStreamDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "kafka_tail"

        def schema(self) -> str:
            return KAFKA_STREAM_SCHEMA

        def simpleStreamReader(self, schema) -> "_Reader":
            return _Reader(dict(self.options))

    return KafkaStreamDataSource


# ---------------------------------------------------------------------------
# batch read (executor-parallel, one slice per topic-partition)
# ---------------------------------------------------------------------------


def kafka_read(
    spark,
    host: str,
    port: int,
    topics: list[str],
    max_bytes: int = 1 << 20,
):
    """Bounded batch read of whole topics: split planning driver-side
    (one slice per topic-partition with its [earliest, latest) range),
    fetch loops inside mapInPandas on executors — the same shape as
    every batch connector in this repo. Returns the stream schema."""
    import pandas as pd

    cli = KafkaClient(host, port)
    try:
        meta = cli.metadata(topics)
        slices = []
        for topic in topics:
            for pid in meta.get(topic, []):
                lo = cli.list_offset(topic, pid, EARLIEST)
                hi = cli.list_offset(topic, pid, LATEST)
                if hi > lo:
                    slices.append((topic, pid, lo, hi))
    finally:
        cli.close()
    if not slices:
        return spark.createDataFrame([], KAFKA_STREAM_SCHEMA)

    sdf = spark.createDataFrame(
        slices, "topic string, partition int, lo long, hi long"
    ).repartition(len(slices))

    def _pull(iter_pdf):
        for pdf in iter_pdf:
            for row in pdf.itertuples(index=False):
                c = KafkaClient(host, port)
                try:
                    out: list[tuple] = []
                    pos = row.lo
                    while pos < row.hi:
                        recs, _ = c.fetch(
                            row.topic, row.partition, pos, max_bytes
                        )
                        if not recs:
                            break
                        for off, ts, k, v in recs:
                            if off >= row.hi:
                                break
                            out.append(
                                (row.topic, row.partition, off, ts, k, v)
                            )
                            pos = off + 1
                finally:
                    c.close()
                if out:
                    yield pd.DataFrame(
                        out,
                        columns=[
                            "topic", "partition", "offset", "ts", "key",
                            "value",
                        ],
                    )

    return sdf.mapInPandas(_pull, KAFKA_STREAM_SCHEMA)


# ---------------------------------------------------------------------------
# producer sink (executor-parallel, DefaultPartitioner-compatible)
# ---------------------------------------------------------------------------


def kafka_write(
    df,
    host: str,
    port: int,
    topic: str,
    key_col: str = "key",
    value_col: str = "value",
    order_col: str | None = None,
    batch_size: int = 500,
    timestamp_ms: int = 0,
    codec: str = "none",
) -> dict[str, int]:
    """Produce a DataFrame to a topic: partition assignment is computed
    engine-side with the DefaultPartitioner hash (``partition_for``), the
    frame is repartitioned ON that id so each Kafka partition is owned by
    exactly one task (per-partition ORDER survives — give ``order_col``,
    e.g. seq, to pin intra-partition emit order), and each task appends
    record batches of ``batch_size``. Per-batch produce failures count as
    dirty, not job aborts — the DataX dirty-record contract.
    ``codec='gzip'`` compresses each record batch (attributes bits 0-2;
    the header and CRC stay uncompressed, per the public v2 layout).

    The emit side of a Kafka relay: pair with
    ``streaming/relay.emit_changes`` + ``sources/envelope.to_debezium``
    to publish a lake table's change feed as a Debezium topic.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType
    from pyspark.sql.functions import pandas_udf

    codec_id = {"none": CODEC_NONE, "gzip": CODEC_GZIP}.get(codec)
    if codec_id is None:
        raise ValueError(f"unsupported codec {codec!r}: none|gzip")
    cli = KafkaClient(host, port)
    try:
        num_partitions = len(cli.metadata([topic])[topic])
    finally:
        cli.close()

    @pandas_udf(IntegerType())
    def _part(keys: "pd.Series") -> "pd.Series":
        return keys.map(
            lambda k: partition_for(bytes(k) if k is not None else b"",
                                    num_partitions)
        )

    cols = [
        F.col(key_col).cast("binary").alias("key"),
        F.col(value_col).cast("binary").alias("value"),
    ]
    if order_col is not None:
        cols.append(F.col(order_col).alias("emit_order"))
    out = df.select(*cols).withColumn("kpart", _part(F.col("key")))
    out = out.repartition(num_partitions, F.col("kpart"))
    if order_col is not None:
        out = out.sortWithinPartitions("kpart", "emit_order")

    def _produce(iter_pdf):
        c = KafkaClient(host, port)
        written = errors = 0
        try:
            pending: dict[int, list] = {}
            for pdf in iter_pdf:
                for row in pdf.itertuples(index=False):
                    pid = int(row.kpart)
                    pending.setdefault(pid, []).append(
                        (
                            bytes(row.key) if row.key is not None else None,
                            bytes(row.value) if row.value is not None else None,
                            timestamp_ms,
                        )
                    )
                    batch = pending[pid]
                    if len(batch) >= batch_size:
                        try:
                            c.produce(topic, pid, batch, codec=codec_id)
                            written += len(batch)
                        except (ValueError, OSError):
                            errors += len(batch)
                        pending[pid] = []
            for pid, batch in pending.items():
                if batch:
                    try:
                        c.produce(topic, pid, batch, codec=codec_id)
                        written += len(batch)
                    except (ValueError, OSError):
                        errors += len(batch)
        finally:
            c.close()
        yield pd.DataFrame({"written": [written], "errors": [errors]})

    totals = (
        out.mapInPandas(_produce, "written long, errors long")
        .groupBy()
        .sum("written", "errors")
        .collect()[0]
    )
    return {"written": totals[0] or 0, "errors": totals[1] or 0}


# ---------------------------------------------------------------------------
# streaming tail -> fenced lake apply
# ---------------------------------------------------------------------------


def batch_end_offsets(checkpoint_dir: str, batch_id: int) -> dict | None:
    """The END offset map of micro-batch ``batch_id`` — read from the
    Structured Streaming checkpoint's offset log (``offsets/<id>``: a
    ``v1`` header, a metadata JSON line, then one line per source; for
    the ``kafka_tail`` source that line IS the reader's
    ``{"topic pid": next_offset}`` dict). The engine writes it durably
    BEFORE invoking foreachBatch, so reading it inside the sink costs
    one O(partitions) driver file read and ZERO Spark actions. Fails
    open (None) — offset recording is a recovery optimization, never a
    reason to fail an apply."""
    path = os.path.join(checkpoint_dir, "offsets", str(batch_id))
    try:
        with open(path) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        return {k: int(v) for k, v in json.loads(lines[-1]).items()}
    except (OSError, ValueError, IndexError, AttributeError):
        return None


def kafka_resume_offsets(table, topic: str) -> dict | None:
    """The recorded consumed-offset map for ``topic`` from the table's
    own commits — max per topic-partition across every stream entry
    carrying ``source_offsets`` (tail_kafka_and_apply records them in
    the same atomic commit as each applied batch). None when no commit
    ever recorded offsets for this topic: the caller falls back to
    ``earliest``, and the seq-idempotent apply makes the re-read safe —
    recorded offsets only save transport work, they are not needed for
    correctness."""
    prefix = topic + " "
    out: dict[str, int] = {}
    for entry in (table.snapshot().properties.get("streams") or {}).values():
        for k, v in (entry or {}).get("source_offsets", {}).items():
            if k.startswith(prefix):
                out[k] = max(out.get(k, 0), int(v))
    return out or None


def tail_kafka_and_apply(
    spark,
    table_path: str,
    host: str,
    port: int,
    topic: str,
    checkpoint_dir: str,
    envelope: str = "debezium",
    payload_schema=None,
    value_format: str = "json",
    registry_url: str | None = None,
    registry_schemas: dict[int, str] | None = None,
    config=None,
    timeout_sec: float = 60.0,
    max_records_per_partition: int = 10000,
    processing_interval: str = "1 second",
    starting_offsets: str = "earliest",
    record_offsets: bool = True,
):
    """LIVE Kafka CDC tail -> fenced lake apply: the production shape of
    the north rule (Debezium/Canal/Maxwell envelopes arriving over the
    transport they actually ship on). ``value_format``:

    - ``'json'``: the record value IS the JSON envelope text (Connect's
      JsonConverter) — cast binary->string, pure Column parse;
    - ``'confluent_avro'``: Confluent-framed Avro (the dominant
      production encoding) — decoded Arrow-batched to the SAME JSON text
      (sources/envelope_avro.py), then the identical Column parse.

    Offsets live in the Structured Streaming checkpoint (the per-
    topic-partition map IS the stream offset); the lake-side batch-id
    fence makes replayed micro-batches no-ops — kill/restart resumes
    mid-topic exactly once, no consumer group required.

    Offsets ALSO ride the table (``record_offsets``, default on): each
    applied batch's end-offset map — read from the checkpoint's offset
    log, zero extra Spark actions — commits atomically inside the
    stream's fence entry (``streams.<sid>.source_offsets``), the Delta
    ``txn`` pattern. ``starting_offsets='table'`` then survives a LOST
    checkpoint: resume from the table's own recorded offsets (falling
    back to ``earliest`` when none), re-reading only what the last
    recorded commit had not applied. The table-resume arm runs under a
    version-derived stream id (``<sid>@v<version>``) because a fresh
    checkpoint restarts micro-batch ids at 0 and the old fence would
    silently swallow them; the re-read overlap converges through
    latest-wins seq dedup, exactly like the relay's at-least-once emit.
    """
    from dataclasses import replace as _dc_replace

    from pyspark.sql import functions as F

    from datax_spark.lake.table import LakeTable
    from datax_spark.streaming.pipeline import (
        PipelineConfig,
        apply_batch,
        default_payload_schema,
        parse_envelope,
    )

    cfg = config or PipelineConfig()
    if payload_schema is None:
        payload_schema = default_payload_schema(
            LakeTable(spark, table_path)
        )
    if starting_offsets == "table":
        t = LakeTable(spark, table_path)
        resumed = kafka_resume_offsets(t, topic)
        starting_offsets = (
            json.dumps(resumed) if resumed is not None else "earliest"
        )
        # deterministic per resume point: a crash-loop re-resuming from
        # the same version reuses the id (its own batches fence), while
        # any progress moves to a fresh fence namespace
        cfg = _dc_replace(
            cfg, stream_id=f"{cfg.stream_id}@v{t.current_version()}"
        )
    spark.dataSource.register(kafka_stream_source())
    raw = (
        spark.readStream.format("kafka_tail")
        .option("host", host)
        .option("port", str(port))
        .option("topics", topic)
        .option("startingOffsets", starting_offsets)
        .option("maxRecordsPerPartition", str(max_records_per_partition))
        .load()
    )
    if value_format == "json":
        txt = raw.select(F.col("value").cast("string").alias("value"))
    elif value_format == "confluent_avro":
        from datax_spark.sources.envelope_avro import avro_values_to_json

        txt = avro_values_to_json(
            raw, url=registry_url, schemas=registry_schemas
        ).select(F.col("value").alias("value"))
    else:
        raise ValueError(
            f"value_format {value_format!r}: 'json' or 'confluent_avro'"
        )
    stream = parse_envelope(txt, envelope, payload_schema)

    def _sink(batch_df, batch_id: int) -> None:
        table = LakeTable(batch_df.sparkSession, table_path)
        extras = None
        if record_offsets:
            off = batch_end_offsets(checkpoint_dir, batch_id)
            if off:
                extras = {"source_offsets": off}
        apply_batch(table, batch_df, batch_id, cfg, stream_extras=extras)

    query = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=processing_interval)
        .start()
    )
    # drain-then-stop (no availableNow on SimpleDataSourceStreamReader —
    # same loop as tail_ots_stream_and_apply)
    import time as _time

    deadline = _time.monotonic() + timeout_sec
    idle = 0
    seen: set[str] = set()
    while _time.monotonic() < deadline and query.isActive:
        _time.sleep(0.2)
        p = query.lastProgress
        if not p or p["batchId"] in seen or p.get("numInputRows") is None:
            continue
        seen.add(p["batchId"])
        idle = idle + 1 if p["numInputRows"] == 0 else 0
        if idle >= 2:
            break
    if query.isActive:
        query.stop()
    return query
