"""Live Cassandra reader/writer (sources/cassandra_live.py) against an
in-process socket server speaking the real CQL v4 frame grammar — the
Cassandra twin of the Derby/ES/FTP/Mongo proofs: the client's bytes are
what a real node accepts; the backend is a fixture because no cassandra
ships in this image."""

from __future__ import annotations

import re
import socketserver
import struct
import threading

import pytest

from datax_spark.sources.cassandra_live import (
    CONSISTENCY,
    OP_BATCH,
    OP_ERROR,
    OP_QUERY,
    OP_READY,
    OP_RESULT,
    OP_STARTUP,
    T_BIGINT,
    T_BOOLEAN,
    T_DOUBLE,
    T_VARCHAR,
    CqlWire,
    CqlWireError,
    cassandra_read,
    cassandra_split_ranges,
    cassandra_write,
    decode_value,
    encode_value,
    _bytes,
    _read_bytes,
    _read_string,
    _string,
)


# --------------------------------------------------------------------------
# fixture server
# --------------------------------------------------------------------------


class _Store:
    def __init__(self):
        # table -> ({col: type_id}, [row dicts])
        self.tables: dict[str, tuple[dict, list[dict]]] = {}
        self.batches = 0
        self.paged_queries = 0


_COND = re.compile(r"(\w+)\s*(>=|<=|<|>|=)\s*(-?\d+)")


def _apply_where(rows: list[dict], where: str) -> list[dict]:
    out = rows
    for col, op, lit in _COND.findall(where):
        v = int(lit)
        ops = {
            ">=": lambda x: x is not None and x >= v,
            "<=": lambda x: x is not None and x <= v,
            "<": lambda x: x is not None and x < v,
            ">": lambda x: x is not None and x > v,
            "=": lambda x: x == v,
        }[op]
        out = [r for r in out if ops(r.get(col))]
    return out


def _rows_frame(columns, rows, paging_state=None) -> bytes:
    flags = 0x0001 | (0x0002 if paging_state is not None else 0)
    body = struct.pack(">iii", 0x0002, flags, len(columns))
    if paging_state is not None:
        body += _bytes(paging_state)
    body += _string("ks") + _string("t")
    for name, tid in columns:
        body += _string(name) + struct.pack(">H", tid)
    body += struct.pack(">i", len(rows))
    for row in rows:
        for (_, tid), v in zip(columns, row):
            body += _bytes(encode_value(tid, v))
    return body


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        while True:
            try:
                hdr = self._recv(9)
            except ConnectionError:
                return
            if hdr is None:
                return
            ver, _fl, stream, opcode, length = struct.unpack(">BBhBi", hdr)
            assert ver == 0x04
            body = self._recv(length) if length else b""
            if opcode == OP_STARTUP:
                self._reply(stream, OP_READY, b"")
            elif opcode == OP_QUERY:
                self._reply(stream, *self._query(body))
            elif opcode == OP_BATCH:
                self._reply(stream, *self._batch(body))
            else:
                self._reply(stream, OP_ERROR,
                            struct.pack(">i", 0x000A) + _string("bad op"))

    def _recv(self, n):
        data = b""
        while len(data) < n:
            c = self.request.recv(n - len(data))
            if not c:
                return None
            data += c
        return data

    def _reply(self, stream, opcode, body):
        self.request.sendall(
            struct.pack(">BBhBi", 0x84, 0, stream, opcode, len(body)) + body
        )

    def _query(self, body):
        st: _Store = self.server.store
        (n,) = struct.unpack_from(">i", body, 0)
        cql = body[4 : 4 + n].decode()
        off = 4 + n
        (_cons,) = struct.unpack_from(">H", body, off)
        off += 2
        flags = body[off]
        off += 1
        assert not flags & 0x01, "fixture: QUERY VALUES unsupported"
        page_size = None
        paging_state = None
        if flags & 0x04:
            (page_size,) = struct.unpack_from(">i", body, off)
            off += 4
        if flags & 0x08:
            paging_state, off = _read_bytes(body, off)

        m = re.match(
            r"SELECT min\((\w+)\), max\((\w+)\) FROM \w+\.(\w+)$", cql
        )
        if m:
            pk, _, table = m.groups()
            schema, rows = st.tables[table]
            vals = [r[pk] for r in rows if r.get(pk) is not None]
            lo = min(vals) if vals else None
            hi = max(vals) if vals else None
            return OP_RESULT, _rows_frame(
                [(f"system.min({pk})", schema[pk]),
                 (f"system.max({pk})", schema[pk])],
                [(lo, hi)],
            )
        m = re.match(
            r"SELECT (.+) FROM \w+\.(\w+)"
            r"(?: WHERE (.+?))?(?: ALLOW FILTERING)?$",
            cql,
        )
        if not m:
            return OP_ERROR, struct.pack(">i", 0x2000) + _string(
                f"fixture cannot parse: {cql}"
            )
        proj, table, where = m.groups()
        schema, rows = st.tables[table]
        if where:
            rows = _apply_where(rows, where)
        cols = [c.strip() for c in proj.split(",")]
        columns = [(c, schema[c]) for c in cols]
        start = 0
        if paging_state is not None:
            (start,) = struct.unpack(">i", paging_state)
            st.paged_queries += 1
        end = len(rows) if page_size is None else min(
            len(rows), start + page_size
        )
        out = [tuple(r.get(c) for c in cols) for r in rows[start:end]]
        next_state = struct.pack(">i", end) if end < len(rows) else None
        return OP_RESULT, _rows_frame(columns, out, next_state)

    def _batch(self, body):
        st: _Store = self.server.store
        st.batches += 1
        btype = body[0]
        assert btype in (0, 1)
        (n,) = struct.unpack_from(">H", body, 1)
        off = 3
        for _ in range(n):
            kind = body[off]
            off += 1
            assert kind == 0, "fixture: prepared ids unsupported"
            (qn,) = struct.unpack_from(">i", body, off)
            cql = body[off + 4 : off + 4 + qn].decode()
            off += 4 + qn
            (nv,) = struct.unpack_from(">H", body, off)
            off += 2
            m = re.match(
                r"INSERT INTO \w+\.(\w+) \(([^)]+)\) VALUES", cql
            )
            assert m, cql
            table, collist = m.groups()
            cols = [c.strip() for c in collist.split(",")]
            schema, rows = st.tables.setdefault(table, ({}, []))
            raws = []
            for _ in range(nv):
                raw, off = _read_bytes(body, off)
                raws.append(raw)
            doc = {}
            for c, raw in zip(cols, raws):
                tid = schema.get(c, T_VARCHAR)
                doc[c] = decode_value(tid, raw)
            # cassandra INSERT is an upsert on the primary key (first col
            # by fixture convention)
            pk = cols[0]
            rows[:] = [r for r in rows if r.get(pk) != doc[pk]]
            rows.append(doc)
        # Void result
        return OP_RESULT, struct.pack(">i", 0x0001)


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


@pytest.fixture()
def cass():
    srv = _Server(("127.0.0.1", 0), _Handler)
    srv.store = _Store()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _seed(store: _Store, n: int = 53):
    schema = {"id": T_BIGINT, "name": T_VARCHAR, "score": T_DOUBLE,
              "ok": T_BOOLEAN}
    rows = [
        {"id": i, "name": f"row-{i % 5}", "score": i / 8.0, "ok": i % 3 == 0}
        for i in range(n)
    ]
    store.tables["events"] = (schema, rows)


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


def test_handshake_and_error(cass):
    host, port = cass.server_address
    with CqlWire(host, port) as w:
        with pytest.raises(CqlWireError, match="cannot parse"):
            w.query("DROP TABLE ks.events")


def test_value_codec_roundtrip():
    for tid, v in [
        (T_BIGINT, -(2**40)), (T_VARCHAR, "héllo"), (T_DOUBLE, 3.25),
        (T_BOOLEAN, True), (T_BOOLEAN, False),
    ]:
        assert decode_value(tid, encode_value(tid, v)) == v
    assert encode_value(T_BIGINT, None) is None
    assert decode_value(T_VARCHAR, None) is None


def test_paging_walks_all_rows(cass):
    _seed(cass.store, 25)
    host, port = cass.server_address
    with CqlWire(host, port) as w:
        got = list(w.rows("SELECT id, name FROM ks.events", page_size=7))
    assert [r[0] for r in got] == list(range(25))
    # 25 rows at page 7 = 3 follow-up pages carrying paging state
    assert cass.store.paged_queries == 3


def test_split_ranges_disjoint_and_closed(cass):
    _seed(cass.store, 53)
    host, port = cass.server_address
    preds = cassandra_split_ranges(host, port, "ks", "events", "id", 4)
    assert len(preds) == 4
    assert preds[-1].endswith("<= 52")
    hits = [
        sum(bool(_apply_where([{"id": i}], p)) for p in preds)
        for i in range(53)
    ]
    assert set(hits) == {1}


def test_cassandra_read_parallel(spark, cass):
    _seed(cass.store, 53)
    host, port = cass.server_address
    df = cassandra_read(
        spark, host, port, "ks", "events",
        schema="id long, name string, score double, ok boolean",
        split_pk="id", num_slices=4, page_size=10,
    )
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 53
    assert rows[8]["name"] == "row-3"
    assert rows[8]["score"] == 1.0
    assert rows[9]["ok"] is True
    # every slice paged (53 rows / 4 slices > page 10 only for first; at
    # least one continuation happened)
    assert cass.store.paged_queries >= 1


def test_cassandra_read_where_pushdown(spark, cass):
    _seed(cass.store, 30)
    host, port = cass.server_address
    df = cassandra_read(
        spark, host, port, "ks", "events",
        schema="id long", split_pk="id", num_slices=2,
        where="id >= 10",
    )
    assert sorted(r["id"] for r in df.collect()) == list(range(10, 30))


def test_cassandra_write_batches_and_upserts(spark, cass):
    host, port = cass.server_address
    cass.store.tables["sink"] = (
        {"id": T_BIGINT, "v": T_VARCHAR, "x": T_DOUBLE}, []
    )
    df = spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(20)],
        "id long, v string, x double",
    ).repartition(2)
    res = cassandra_write(df, host, port, "ks", "sink", batch_size=6)
    assert res == {"written": 20}
    assert len(cass.store.tables["sink"][1]) == 20
    # INSERT is an upsert by pk: a rewrite converges, never duplicates
    df2 = spark.createDataFrame([(3, "V3", 0.0)], "id long, v string, x double")
    cassandra_write(df2, host, port, "ks", "sink")
    rows = {r["id"]: r for r in cass.store.tables["sink"][1]}
    assert len(rows) == 20 and rows[3]["v"] == "V3"


def test_cassandra_write_rejects_unsupported_type(spark):
    df = spark.createDataFrame([([1, 2],)], "a array<int>")
    with pytest.raises(ValueError, match="unsupported column type"):
        cassandra_write(df, "h", 1, "ks", "t")


def test_run_job_cassandra_roundtrip(spark, cass):
    """Full DataX job.json: cassandrareader (live wire, splitPk slices,
    where) -> cassandrawriter (LOGGED batches). Parameter names are the
    reference's own (connection.host/port, keySpace, table, column,
    splitPk, where; writer keyspace{name}, batchSize)."""
    from datax_spark.plans.job import run_job

    _seed(cass.store, 24)
    cass.store.tables["sink"] = (
        {"id": T_BIGINT, "name": T_VARCHAR, "score": T_DOUBLE}, []
    )
    host, port = cass.server_address
    conn = {"host": host, "port": port}
    job = {"job": {"setting": {"speed": {"channel": 3}}, "content": [{
        "reader": {"name": "cassandrareader", "parameter": {
            "connection": conn, "keySpace": "ks", "table": "events",
            "column": [
                {"name": "id", "type": "bigint"},
                {"name": "name", "type": "text"},
                {"name": "score", "type": "double"},
            ],
            "splitPk": "id",
            "where": "id >= 4",
        }},
        "writer": {"name": "cassandrawriter", "parameter": {
            "connection": conn, "keyspace": {"name": "ks"},
            "table": "sink", "batchSize": 5,
        }},
    }]}}
    res = run_job(spark, job)
    assert res == {"written": 20}
    rows = {r["id"]: r for r in cass.store.tables["sink"][1]}
    assert sorted(rows) == list(range(4, 24))
    assert rows[8]["name"] == "row-3" and rows[8]["score"] == 1.0
    # idempotent replay (inserts are pk upserts)
    run_job(spark, job)
    assert sorted(r["id"] for r in cass.store.tables["sink"][1]) == sorted(rows)


def test_cassandrareader_requires_splitpk(spark):
    from datax_spark.plans.job import compile_reader

    with pytest.raises(ValueError, match="splitPk"):
        compile_reader(spark, {"name": "cassandrareader", "parameter": {
            "connection": {"host": "h", "port": 1}, "keySpace": "ks",
            "table": "t", "column": ["id:bigint"]}})
