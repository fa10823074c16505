"""Live HBase reader/writer (sources/hbase_live.py) against an
in-process HTTP fixture implementing the REST gateway's endpoints
(multi-row PUT envelope, stateful scanner lifecycle)."""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from datax_spark.sources.hbase_live import (
    HbaseRest,
    HbaseRestError,
    hbase_bytes,
    hbase_decode,
    hbase_read,
    hbase_write,
)


class _State:
    def __init__(self):
        # table -> {rowkey bytes: {col: bytes}}
        self.tables: dict[str, dict[bytes, dict[str, bytes]]] = {}
        # scanner id -> (rows list, batch, pos)
        self.scanners: dict[str, list] = {}
        self.next_id = 0
        self.put_requests = 0


class _Handler(BaseHTTPRequestHandler):
    state: _State = None

    def log_message(self, *a):
        pass

    def _send(self, status, body=None, location=None):
        data = json.dumps(body).encode() if body is not None else b""
        self.send_response(status)
        if location:
            self.send_header("Location", location)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _read(self):
        n = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(n)) if n else None

    def do_PUT(self):
        st = self.state
        st.put_requests += 1
        table = self.path.strip("/").split("/")[0]
        body = self._read()
        t = st.tables.setdefault(table, {})
        for row in body["Row"]:
            rk = base64.b64decode(row["key"])
            cells = t.setdefault(rk, {})
            for c in row["Cell"]:
                col = base64.b64decode(c["column"]).decode()
                cells[col] = base64.b64decode(c["$"])
        self._send(200, {})

    def do_POST(self):
        st = self.state
        parts = self.path.strip("/").split("/")
        assert parts[1] == "scanner", self.path
        table = parts[0]
        spec = self._read() or {}
        start = base64.b64decode(spec["startRow"]) if "startRow" in spec else None
        end = base64.b64decode(spec["endRow"]) if "endRow" in spec else None
        batch = int(spec.get("batch", 1000))
        rows = sorted(st.tables.get(table, {}).items())
        if start is not None:
            rows = [r for r in rows if r[0] >= start]
        if end is not None:
            rows = [r for r in rows if r[0] < end]
        sid = str(st.next_id)
        st.next_id += 1
        st.scanners[sid] = [rows, batch, 0]
        self._send(
            201, {},
            location=f"http://{self.headers['Host']}/{table}/scanner/{sid}",
        )

    def do_GET(self):
        st = self.state
        sid = self.path.strip("/").split("/")[-1]
        if sid not in st.scanners:
            self._send(404, {"error": "no scanner"})
            return
        rows, batch, pos = st.scanners[sid]
        if pos >= len(rows):
            self._send(204)
            return
        page = rows[pos : pos + batch]
        st.scanners[sid][2] = pos + len(page)
        self._send(200, {"Row": [
            {"key": base64.b64encode(rk).decode(),
             "Cell": [
                 {"column": base64.b64encode(col.encode()).decode(),
                  "$": base64.b64encode(val).decode()}
                 for col, val in cells.items()
             ]}
            for rk, cells in page
        ]})

    def do_DELETE(self):
        sid = self.path.strip("/").split("/")[-1]
        self.state.scanners.pop(sid, None)
        self._send(200, {})


@pytest.fixture()
def gateway():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.RequestHandlerClass.state = _State()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _endpoint(srv):
    h, p = srv.server_address
    return f"http://{h}:{p}"


def test_bytes_codec_roundtrip():
    for t, v in [("long", -(2**40)), ("int", 123), ("short", -5),
                 ("double", 2.5), ("float", 1.5), ("boolean", True),
                 ("boolean", False), ("string", "héllo"),
                 ("bytes", b"\x00\xff")]:
        assert hbase_decode(t, hbase_bytes(t, v)) == v
    assert hbase_bytes("long", None) is None
    # HBase Bytes.toBytes(boolean): true = 0xFF, not 0x01
    assert hbase_bytes("boolean", True) == b"\xff"


def test_scanner_lifecycle_pages(gateway):
    st = gateway.RequestHandlerClass.state
    st.tables["t"] = {
        f"r{i:02d}".encode(): {"cf:v": str(i).encode()} for i in range(25)
    }
    client = HbaseRest(_endpoint(gateway))
    got = list(client.scan("t", b"r05", b"r20", batch=6))
    assert [rk.decode() for rk, _ in got] == [f"r{i:02d}" for i in range(5, 20)]
    assert st.scanners == {}  # deleted after exhaustion


def test_hbase_write_then_read_roundtrip(spark, gateway):
    ep = _endpoint(gateway)
    df = spark.createDataFrame(
        [(i, f"name-{i}", float(i) / 2, i % 2 == 0) for i in range(40)],
        "id long, name string, score double, ok boolean",
    ).repartition(3)
    res = hbase_write(
        df, ep, "users",
        rowkey_column=[{"index": -1, "type": "string", "value": "u_"},
                       {"index": 1, "type": "string"}],
        column=[{"index": 0, "name": "cf:id", "type": "long"},
                {"index": 2, "name": "cf:score", "type": "double"},
                {"index": 3, "name": "cf:ok", "type": "boolean"}],
        batch_size=7,
    )
    assert res == {"written": 40}
    st = gateway.RequestHandlerClass.state
    assert len(st.tables["users"]) == 40
    assert hbase_decode("long", st.tables["users"][b"u_name-9"]["cf:id"]) == 9

    back = hbase_read(
        spark, ep, "users",
        columns=[{"name": "rowkey", "type": "string"},
                 {"name": "cf:id", "type": "long"},
                 {"name": "cf:score", "type": "double"},
                 {"name": "cf:ok", "type": "boolean"}],
        split_rowkeys=[b"u_name-2", b"u_name-6"],  # 3 parallel scanners
        batch=10,
    )
    rows = {r["cf_id"]: r for r in back.collect()}
    assert len(rows) == 40
    assert rows[9]["rowkey"] == "u_name-9"
    assert rows[9]["cf_score"] == 4.5
    assert rows[8]["cf_ok"] is True


def test_hbase_write_null_modes(spark, gateway):
    ep = _endpoint(gateway)
    df = spark.createDataFrame([(1, None)], "id long, v string")
    hbase_write(
        df, ep, "t_skip",
        rowkey_column=[{"index": 0, "type": "long"}],
        column=[{"index": 1, "name": "cf:v", "type": "string"}],
        null_mode="skip",
    )
    st = gateway.RequestHandlerClass.state
    assert st.tables["t_skip"][hbase_bytes("long", 1)] == {}
    hbase_write(
        df, ep, "t_empty",
        rowkey_column=[{"index": 0, "type": "long"}],
        column=[{"index": 1, "name": "cf:v", "type": "string"}],
        null_mode="empty",
    )
    assert st.tables["t_empty"][hbase_bytes("long", 1)] == {"cf:v": b""}


def test_hbase_write_version_column(spark, gateway):
    ep = _endpoint(gateway)
    df = spark.createDataFrame([(1, "x", 1700000000000)],
                               "id long, v string, ts long")
    hbase_write(
        df, ep, "t_ver",
        rowkey_column=[{"index": 0, "type": "long"}],
        column=[{"index": 1, "name": "cf:v", "type": "string"}],
        version_column={"index": 2},
    )
    # fixture stores latest value; the envelope carried the timestamp
    st = gateway.RequestHandlerClass.state
    assert st.tables["t_ver"][hbase_bytes("long", 1)]["cf:v"] == b"x"


def test_hbase_write_index_out_of_range(spark):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError, match="out of range"):
        hbase_write(df, "http://h", "t",
                    rowkey_column=[{"index": 0, "type": "long"}],
                    column=[{"index": 5, "name": "cf:v", "type": "string"}])


def test_run_job_hbase_roundtrip(spark, gateway):
    """Full DataX job.json: hbase11xreader -> hbase11xwriter over the
    gateway, using the reference's own parameter names (table, column
    name cf:q + type, range start/end, rowkeyColumn with a constant
    part, nullMode)."""
    from datax_spark.plans.job import run_job

    ep = _endpoint(gateway)
    st = gateway.RequestHandlerClass.state
    st.tables["src"] = {
        f"k{i:02d}".encode(): {
            "cf:n": hbase_bytes("long", i),
            "cf:s": hbase_bytes("string", f"v{i}"),
        }
        for i in range(12)
    }
    job = {"job": {"content": [{
        "reader": {"name": "hbase11xreader", "parameter": {
            "restEndpoint": ep, "table": "src", "mode": "normal",
            "column": [{"name": "rowkey", "type": "string"},
                       {"name": "cf:n", "type": "long"},
                       {"name": "cf:s", "type": "string"}],
            "range": {"startRowkey": "k03", "endRowkey": "k10"},
        }},
        "writer": {"name": "hbase11xwriter", "parameter": {
            "restEndpoint": ep, "table": "dst", "mode": "normal",
            "rowkeyColumn": [{"index": -1, "type": "string", "value": "c_"},
                             {"index": 0, "type": "string"}],
            "column": [{"index": 1, "name": "cf:n", "type": "long"},
                       {"index": 2, "name": "cf:s", "type": "string"}],
        }},
    }]}}
    res = run_job(spark, job)
    assert res == {"written": 7}
    assert sorted(st.tables["dst"]) == [
        f"c_k{i:02d}".encode() for i in range(3, 10)
    ]
    assert hbase_decode("long", st.tables["dst"][b"c_k05"]["cf:n"]) == 5
