"""In-process single-node Kafka broker (the embedded test double).

Speaks the same wire subset as ``sources/kafka_live.py`` — Metadata v1 /
ListOffsets v1 / Produce v3 / Fetch v4, record batches v2 — parsed
INDEPENDENTLY of the client's encoder so a symmetric codec misreading
cannot self-cancel, and it VERIFIES record-batch CRC32C (and gzip
framing) on every produce: a corrupt batch comes back CORRUPT_MESSAGE,
never a partial append. The Kafka analog of the embedded-Derby JDBC
twin: tests and the driver-gated ``cdc_kafka_apply`` query run the REAL
protocol end-to-end without an external cluster.

Single node, plaintext, no consumer groups (the engine's streaming
checkpoint owns offsets) — exactly the surface the client uses.
"""

from __future__ import annotations

import socketserver
import struct
import threading

from datax_spark.sources.kafka_live import (
    EARLIEST,
    Buf,
    decode_record_batches,
    enc_bytes,
    enc_string,
    encode_record_batch,
)


class _BrokerState:
    def __init__(self):
        self.logs: dict[tuple[str, int], list] = {}
        self.fetch_log: list[tuple[str, int, int]] = []
        self.produce_batches = 0
        self.max_fetch_records = 1000
        self.lock = threading.Lock()

    def create_topic(self, name: str, partitions: int) -> None:
        for p in range(partitions):
            self.logs[(name, p)] = []

    def topics(self) -> dict[str, list[int]]:
        out: dict[str, list[int]] = {}
        for t, p in self.logs:
            out.setdefault(t, []).append(p)
        return out


class _Handler(socketserver.BaseRequestHandler):
    state: _BrokerState  # set by the fixture

    def handle(self):
        while True:
            hdr = self._recv(4)
            if hdr is None:
                return
            (n,) = struct.unpack(">i", hdr)
            raw = self._recv(n)
            if raw is None:
                return
            buf = Buf(raw)
            api_key, api_version, corr = buf.i16(), buf.i16(), buf.i32()
            buf.string()  # client id
            body = {
                (3, 1): self._metadata,
                (2, 1): self._list_offsets,
                (0, 3): self._produce,
                (1, 4): self._fetch,
            }[(api_key, api_version)](buf)
            msg = struct.pack(">i", corr) + body
            self.request.sendall(struct.pack(">i", len(msg)) + msg)

    def _recv(self, n: int):
        out = b""
        while len(out) < n:
            try:
                chunk = self.request.recv(n - len(out))
            except OSError:
                return None
            if not chunk:
                return None
            out += chunk
        return out

    def _metadata(self, buf: Buf) -> bytes:
        n = buf.i32()
        wanted = None if n < 0 else [buf.string() for _ in range(n)]
        st = self.state
        host, port = self.server.server_address  # type: ignore[attr-defined]
        out = struct.pack(">i", 1)  # one broker
        out += struct.pack(">i", 0) + enc_string(host)
        out += struct.pack(">i", port) + enc_string(None)
        out += struct.pack(">i", 0)  # controller id
        topics = st.topics()
        names = sorted(topics) if wanted is None else wanted
        out += struct.pack(">i", len(names))
        for name in names:
            parts = topics.get(name)
            out += struct.pack(">h", 3 if parts is None else 0)
            out += enc_string(name) + struct.pack(">b", 0)
            out += struct.pack(">i", len(parts or []))
            for pid in sorted(parts or []):
                out += struct.pack(">hiii", 0, pid, 0, 1)
                out += struct.pack(">i", 0)  # replicas[0]=0 (count 1 above)
                out += struct.pack(">ii", 1, 0)  # isr
            # NOTE: replicas encoded as count=1 then id=0 — the int32
            # right after leader is the replica array count.
        return out

    def _list_offsets(self, buf: Buf) -> bytes:
        buf.i32()  # replica id
        st = self.state
        out_topics = []
        for _ in range(buf.i32()):
            name = buf.string()
            parts = []
            for _ in range(buf.i32()):
                pid = buf.i32()
                ts = buf.i64()
                log = st.logs.get((name, pid), [])
                off = 0 if ts == EARLIEST else len(log)
                parts.append((pid, off))
            out_topics.append((name, parts))
        out = struct.pack(">i", len(out_topics))
        for name, parts in out_topics:
            out += enc_string(name) + struct.pack(">i", len(parts))
            for pid, off in parts:
                out += struct.pack(">ihqq", pid, 0, -1, off)
        return out

    def _produce(self, buf: Buf) -> bytes:
        buf.string()  # transactional id
        buf.i16()  # acks
        buf.i32()  # timeout
        st = self.state
        out_topics = []
        for _ in range(buf.i32()):
            name = buf.string()
            parts = []
            for _ in range(buf.i32()):
                pid = buf.i32()
                blob = buf.bytes_() or b""
                with st.lock:
                    log = st.logs.get((name, pid))
                    if log is None:
                        parts.append((pid, 3, -1))
                        continue
                    try:
                        recs = decode_record_batches(blob)  # verifies CRC
                    except ValueError:
                        parts.append((pid, 2, -1))  # CORRUPT_MESSAGE
                        continue
                    base = len(log)
                    for _off, ts, k, v in recs:
                        log.append((ts, k, v))
                    st.produce_batches += 1
                    parts.append((pid, 0, base))
            out_topics.append((name, parts))
        out = struct.pack(">i", len(out_topics))
        for name, parts in out_topics:
            out += enc_string(name) + struct.pack(">i", len(parts))
            for pid, err, base in parts:
                out += struct.pack(">ihqq", pid, err, base, -1)
        out += struct.pack(">i", 0)  # throttle
        return out

    def _fetch(self, buf: Buf) -> bytes:
        buf.i32(); buf.i32(); buf.i32(); buf.i32()  # replica/wait/min/max
        buf.i8()  # isolation
        st = self.state
        out_topics = []
        for _ in range(buf.i32()):
            name = buf.string()
            parts = []
            for _ in range(buf.i32()):
                pid = buf.i32()
                off = buf.i64()
                buf.i32()  # partition max bytes
                with st.lock:
                    log = list(st.logs.get((name, pid), []))
                st.fetch_log.append((name, pid, off))
                hwm = len(log)
                blob = b""
                if off < hwm:
                    chunk = log[off:off + st.max_fetch_records]
                    blob = encode_record_batch(
                        off, [(k, v, ts) for ts, k, v in chunk]
                    )
                parts.append((pid, hwm, blob))
            out_topics.append((name, parts))
        out = struct.pack(">i", 0)  # throttle
        out += struct.pack(">i", len(out_topics))
        for name, parts in out_topics:
            out += enc_string(name) + struct.pack(">i", len(parts))
            for pid, hwm, blob in parts:
                out += struct.pack(">ihqq", pid, 0, hwm, hwm)
                out += struct.pack(">i", 0)  # aborted txns: empty array
                out += enc_bytes(blob)
        return out


class BrokerServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


def start_broker(host: str = "127.0.0.1", port: int = 0):
    """Start an embedded broker; returns the server (its ``state`` holds
    the logs/telemetry, ``server_address`` the bound endpoint). Call
    ``shutdown()`` + ``server_close()`` when done."""
    state = _BrokerState()
    handler = type("_BoundHandler", (_Handler,), {"state": state})
    srv = BrokerServer((host, port), handler)
    srv.state = state
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv
