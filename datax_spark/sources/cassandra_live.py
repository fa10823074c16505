"""Live Cassandra reader/writer over the REAL wire protocol (CQL v4).

Round 4 session 3 upgrades cassandrareader/cassandrawriter from
option-dict builders (sources/connectors.py, for the spark-cassandra
connector) to an executable implementation of the reference's actual
data path, speaking the CQL native protocol v4 over stdlib sockets:

- ``CqlWire``: frame codec (9-byte header, STARTUP/READY handshake,
  QUERY with consistency + VALUES/PAGE_SIZE/PAGING_STATE flags, BATCH
  of bound statements, RESULT Rows metadata + typed value decode,
  ERROR surfacing). The bytes are exactly what a real Cassandra node
  accepts — no driver library ships here.
- ``cassandra_split_ranges``: the reader's split planning
  (cassandrareader/.../CassandraReaderSplitUtil.java:180-230 +
  CassandraRangeSplitWrap.java:40-66): probe ``SELECT min(pk), max(pk)``
  once, then even integer sub-ranges, each slice a
  ``pk >= lo AND pk < hi`` predicate (last slice closed) run with
  ``ALLOW FILTERING`` exactly like the reference's generated QUERY_SQL.
- ``cassandra_read``: executor-parallel slice reads — each slice pages
  through its range with the protocol's native paging (PAGE_SIZE flag
  + paging state) inside ``mapInPandas``, one task per slice.
- ``cassandra_write``: batched bound-statement inserts
  (CassandraHelper.insertBatch, cassandrawriter/.../
  CassandraHelper.java:384-420 — BatchStatement of
  ``INSERT INTO ks.t (...) VALUES (?,...)`` with per-column typed
  binds), batch type LOGGED by default like ``new BatchStatement()``.

Tests drive the client against an in-process socket server speaking
the same frame grammar (tests/test_cassandra_live.py) — the Cassandra
twin of the Derby/ES/FTP/Mongo proofs: the CLIENT is protocol-real,
the backend is a fixture because no cassandra node ships in this image.
"""

from __future__ import annotations

import socket
import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession

# opcodes (native_protocol_v4.spec §2.4)
OP_ERROR, OP_STARTUP, OP_READY = 0x00, 0x01, 0x02
OP_QUERY, OP_RESULT, OP_BATCH = 0x07, 0x08, 0x0D

# CQL type ids (§6)
T_BIGINT, T_BLOB, T_BOOLEAN, T_DOUBLE = 0x02, 0x03, 0x04, 0x07
T_FLOAT, T_INT, T_VARCHAR = 0x08, 0x09, 0x0D

CONSISTENCY = {
    "ANY": 0, "ONE": 1, "TWO": 2, "THREE": 3, "QUORUM": 4, "ALL": 5,
    "LOCAL_QUORUM": 6, "EACH_QUORUM": 7, "LOCAL_ONE": 0x0A,
}

# query-parameter flag bits (§4.1.4)
_F_VALUES, _F_PAGE_SIZE, _F_PAGING_STATE = 0x01, 0x04, 0x08


class CqlWireError(RuntimeError):
    """Server ERROR frame or protocol violation."""


# --------------------------------------------------------------------------
# primitive codecs (§3)
# --------------------------------------------------------------------------


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">H", len(b)) + b


def _long_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + b


def _read_string(buf: bytes, off: int) -> tuple[str, int]:
    (n,) = struct.unpack_from(">H", buf, off)
    return buf[off + 2 : off + 2 + n].decode(), off + 2 + n


def _bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def _read_bytes(buf: bytes, off: int) -> tuple[bytes | None, int]:
    (n,) = struct.unpack_from(">i", buf, off)
    off += 4
    if n < 0:
        return None, off
    return buf[off : off + n], off + n


def encode_value(type_id: int, v: Any) -> bytes | None:
    """Python value -> CQL serialized bytes for the given type id."""
    if v is None:
        return None
    if type_id == T_BIGINT:
        return struct.pack(">q", int(v))
    if type_id == T_INT:
        return struct.pack(">i", int(v))
    if type_id == T_DOUBLE:
        return struct.pack(">d", float(v))
    if type_id == T_FLOAT:
        return struct.pack(">f", float(v))
    if type_id == T_BOOLEAN:
        return b"\x01" if v else b"\x00"
    if type_id == T_VARCHAR:
        return str(v).encode()
    if type_id == T_BLOB:
        return bytes(v)
    raise CqlWireError(f"unsupported cql type 0x{type_id:02x}")


def decode_value(type_id: int, b: bytes | None) -> Any:
    if b is None:
        return None
    if type_id == T_BIGINT:
        return struct.unpack(">q", b)[0]
    if type_id == T_INT:
        return struct.unpack(">i", b)[0]
    if type_id == T_DOUBLE:
        return struct.unpack(">d", b)[0]
    if type_id == T_FLOAT:
        return struct.unpack(">f", b)[0]
    if type_id == T_BOOLEAN:
        return b == b"\x01"
    if type_id == T_VARCHAR:
        return b.decode()
    if type_id == T_BLOB:
        return bytes(b)
    raise CqlWireError(f"unsupported cql type 0x{type_id:02x}")


# Spark DDL type -> CQL type id (the writer's bind encoding; the DDL is
# the same column list the reader schema uses)
SPARK_TO_CQL = {
    "long": T_BIGINT, "bigint": T_BIGINT, "int": T_INT, "integer": T_INT,
    "double": T_DOUBLE, "float": T_FLOAT, "boolean": T_BOOLEAN,
    "string": T_VARCHAR, "binary": T_BLOB,
}


# --------------------------------------------------------------------------
# transport
# --------------------------------------------------------------------------


class CqlResult:
    def __init__(self, columns, rows, paging_state):
        self.columns = columns  # [(name, type_id)]
        self.rows = rows  # list of tuples (decoded)
        self.paging_state = paging_state


class CqlWire:
    """One connection, v4 frames, STARTUP handshake on connect."""

    def __init__(self, host: str, port: int = 9042, timeout: float = 30.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._stream = 0
        body = struct.pack(">H", 1) + _string("CQL_VERSION") + _string("3.0.0")
        op, _ = self._request(OP_STARTUP, body)
        if op != OP_READY:
            raise CqlWireError(f"expected READY after STARTUP, got 0x{op:02x}")

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self) -> "CqlWire":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _recv_exact(self, n: int) -> bytes:
        chunks = []
        while n:
            c = self._sock.recv(n)
            if not c:
                raise CqlWireError("connection closed mid-frame")
            chunks.append(c)
            n -= len(c)
        return b"".join(chunks)

    def _request(self, opcode: int, body: bytes) -> tuple[int, bytes]:
        self._stream = (self._stream + 1) % 32768
        hdr = struct.pack(">BBhBi", 0x04, 0, self._stream, opcode, len(body))
        self._sock.sendall(hdr + body)
        rhdr = self._recv_exact(9)
        ver, _flags, _stream, ropcode, rlen = struct.unpack(">BBhBi", rhdr)
        if ver != 0x84:
            raise CqlWireError(f"unexpected response version 0x{ver:02x}")
        rbody = self._recv_exact(rlen) if rlen else b""
        if ropcode == OP_ERROR:
            (code,) = struct.unpack_from(">i", rbody, 0)
            msg, _ = _read_string(rbody, 4)
            raise CqlWireError(f"server error 0x{code:04x}: {msg}")
        return ropcode, rbody

    def query(
        self,
        cql: str,
        values: list[tuple[int, Any]] | None = None,
        consistency: str = "ONE",
        page_size: int | None = None,
        paging_state: bytes | None = None,
    ) -> CqlResult:
        flags = 0
        tail = b""
        if values:
            flags |= _F_VALUES
            tail += struct.pack(">H", len(values))
            for tid, v in values:
                tail += _bytes(encode_value(tid, v))
        if page_size is not None:
            flags |= _F_PAGE_SIZE
            tail += struct.pack(">i", page_size)
        if paging_state is not None:
            flags |= _F_PAGING_STATE
            tail += _bytes(paging_state)
        body = (
            _long_string(cql)
            + struct.pack(">H", CONSISTENCY[consistency])
            + bytes([flags])
            + tail
        )
        op, rbody = self._request(OP_QUERY, body)
        if op != OP_RESULT:
            raise CqlWireError(f"expected RESULT, got 0x{op:02x}")
        return _parse_result(rbody)

    def rows(
        self,
        cql: str,
        consistency: str = "ONE",
        page_size: int = 1000,
    ) -> Iterator[tuple]:
        """Protocol-native paging: QUERY, then re-QUERY with the
        returned paging state until the server stops handing one back."""
        state: bytes | None = None
        while True:
            res = self.query(
                cql, consistency=consistency,
                page_size=page_size, paging_state=state,
            )
            yield from res.rows
            state = res.paging_state
            if state is None:
                return

    def batch(
        self,
        statements: list[tuple[str, list[tuple[int, Any]]]],
        consistency: str = "ONE",
        logged: bool = True,
    ) -> None:
        """BATCH of bound statements (§4.1.7) — the wire form of the
        reference's BatchStatement of BoundStatements."""
        body = bytes([0 if logged else 1]) + struct.pack(">H", len(statements))
        for cql, values in statements:
            body += b"\x00" + _long_string(cql)  # kind 0: query string
            body += struct.pack(">H", len(values))
            for tid, v in values:
                body += _bytes(encode_value(tid, v))
        body += struct.pack(">H", CONSISTENCY[consistency]) + b"\x00"
        op, rbody = self._request(OP_BATCH, body)
        if op != OP_RESULT:
            raise CqlWireError(f"expected RESULT after BATCH, got 0x{op:02x}")


def _parse_result(body: bytes) -> CqlResult:
    (kind,) = struct.unpack_from(">i", body, 0)
    off = 4
    if kind == 0x0001:  # Void
        return CqlResult([], [], None)
    if kind != 0x0002:  # Rows is all this client asks for
        return CqlResult([], [], None)
    flags, n_cols = struct.unpack_from(">ii", body, off)
    off += 8
    paging_state = None
    if flags & 0x0002:  # has_more_pages
        paging_state, off = _read_bytes(body, off)
    if flags & 0x0001:  # global_tables_spec
        _, off = _read_string(body, off)
        _, off = _read_string(body, off)
    columns: list[tuple[str, int]] = []
    for _ in range(n_cols):
        if not flags & 0x0001:
            _, off = _read_string(body, off)
            _, off = _read_string(body, off)
        name, off = _read_string(body, off)
        (tid,) = struct.unpack_from(">H", body, off)
        off += 2
        columns.append((name, tid))
    (n_rows,) = struct.unpack_from(">i", body, off)
    off += 4
    rows = []
    for _ in range(n_rows):
        vals = []
        for _, tid in columns:
            raw, off = _read_bytes(body, off)
            vals.append(decode_value(tid, raw))
        rows.append(tuple(vals))
    return CqlResult(columns, rows, paging_state)


# --------------------------------------------------------------------------
# reader: min/max split + executor-parallel paged range reads
# --------------------------------------------------------------------------


def cassandra_split_ranges(
    host: str, port: int, keyspace: str, table: str,
    split_pk: str, num_slices: int,
) -> list[str]:
    """CassandraReaderSplitUtil.getPkRange + RangeSplitWrap: one
    ``SELECT min(pk), max(pk)`` probe, even integer sub-ranges, each a
    CQL predicate string (interior slices half-open, last closed —
    CassandraRangeSplitWrap.java:52-62)."""
    with CqlWire(host, port) as w:
        res = w.query(
            f"SELECT min({split_pk}), max({split_pk}) "
            f"FROM {keyspace}.{table}"
        )
    lo, hi = (res.rows[0] if res.rows else (None, None))
    if lo is None or hi is None:
        return [""]  # empty table: one unfiltered slice
    lo, hi = int(lo), int(hi)
    n = min(num_slices, max(1, hi - lo + 1))
    step = (hi - lo + 1) // n
    preds = []
    for i in range(n):
        a = lo + i * step
        b = lo + (i + 1) * step
        if i == n - 1:
            preds.append(f"{split_pk} >= {a} AND {split_pk} <= {hi}")
        else:
            preds.append(f"{split_pk} >= {a} AND {split_pk} < {b}")
    return preds


def cassandra_read(
    spark: SparkSession,
    host: str,
    port: int,
    keyspace: str,
    table: str,
    schema: str,
    split_pk: str,
    num_slices: int = 4,
    where: str | None = None,
    page_size: int = 1000,
    consistency: str = "ONE",
) -> DataFrame:
    """Executor-parallel table read. ``schema`` is a Spark DDL string
    naming the projected columns (the DataX column list); each slice is
    one task that pages through its pk range with the protocol's native
    paging — rows never funnel through the driver. The generated CQL is
    the reference's buildQuerySql shape: projection + where + range +
    ALLOW FILTERING (CassandraReaderSplitUtil.java:138-176)."""
    preds = cassandra_split_ranges(
        host, port, keyspace, table, split_pk, num_slices
    )
    from pyspark.sql.types import StructType

    target: StructType = spark.createDataFrame([], schema).schema
    cols = [f.name for f in target.fields]
    proj = ", ".join(cols)
    slices = spark.createDataFrame(
        [(i,) for i in range(len(preds))], "slice_id int"
    ).repartition(len(preds))

    def _cql_for(pred: str) -> str:
        conds = [c for c in (where, pred) if c]
        q = f"SELECT {proj} FROM {keyspace}.{table}"
        if conds:
            q += " WHERE " + " AND ".join(conds) + " ALLOW FILTERING"
        return q

    def _batches(it):
        import pandas as pd

        for pdf in it:
            data: dict[str, list] = {c: [] for c in cols}
            for sid in pdf["slice_id"]:
                with CqlWire(host, port) as w:
                    for row in w.rows(
                        _cql_for(preds[int(sid)]),
                        consistency=consistency, page_size=page_size,
                    ):
                        for c, v in zip(cols, row):
                            data[c].append(v)
            yield pd.DataFrame(data, columns=cols)

    return slices.mapInPandas(_batches, target)


# --------------------------------------------------------------------------
# writer: batched bound-statement inserts
# --------------------------------------------------------------------------


def cassandra_write(
    df: DataFrame,
    host: str,
    port: int,
    keyspace: str,
    table: str,
    batch_size: int = 100,
    consistency: str = "ONE",
    logged: bool = True,
) -> dict[str, int]:
    """CassandraHelper.insertBatch's wire form: per Arrow batch, BATCH
    frames of ``INSERT INTO ks.t (cols) VALUES (?, ...)`` bound
    statements, values encoded from the DataFrame's own column types.
    Inserts in Cassandra are upserts by primary key — replays converge,
    the same idempotence the reference leans on for task retry."""
    cols = df.columns
    tids = []
    for f in df.schema.fields:
        name = f.dataType.simpleString()
        if name not in SPARK_TO_CQL:
            raise ValueError(f"cassandrawriter: unsupported column type "
                             f"{name} for {f.name}")
        tids.append(SPARK_TO_CQL[name])
    insert = (
        f"INSERT INTO {keyspace}.{table} ({', '.join(cols)}) "
        f"VALUES ({', '.join('?' for _ in cols)})"
    )

    def _batches(it):
        import pandas as pd

        written = 0
        for pdf in it:
            recs = pdf.to_dict("records")
            with CqlWire(host, port) as w:
                for i in range(0, len(recs), batch_size):
                    stmts = []
                    for rec in recs[i : i + batch_size]:
                        vals = []
                        for c, tid in zip(cols, tids):
                            v = rec[c]
                            if v is None or (isinstance(v, float) and v != v):
                                vals.append((tid, None))
                            elif hasattr(v, "item"):
                                vals.append((tid, v.item()))
                            else:
                                vals.append((tid, v))
                        stmts.append((insert, vals))
                    w.batch(stmts, consistency=consistency, logged=logged)
                    written += len(stmts)
        yield pd.DataFrame({"written": [written]})

    out = df.mapInPandas(_batches, "written long").groupBy().sum()
    return {"written": int(out.collect()[0][0] or 0)}
