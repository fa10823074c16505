"""Live ADS writer (sources/ads_live.py) against an in-process socket
server speaking the real MySQL client protocol — HandshakeV10, verified
mysql_native_password scramble, COM_QUERY with OK/ERR/resultset framing.
The load-mode test chains the LIVE ODPS tunnel fixture for the staging
leg, reproducing the reference's ODPS-intermediate pipeline."""

from __future__ import annotations

import re
import socketserver
import struct
import threading

import pytest

from datax_spark.sources.ads_live import (
    MySqlError,
    MySqlWire,
    _lenenc,
    ads_insert,
    ads_load,
    native_password_scramble,
    sql_literal,
)

USER = "adsuser"
PASSWORD = "adspass"
SCHEMA = "adsdb"


class _Store:
    def __init__(self):
        self.tables: dict[str, list[tuple]] = {}
        self.jobs: dict[str, list[str]] = {}
        self.next_job = 0
        self.poison: str | None = None
        self.queries: list[str] = []
        self.odps_rows = None  # callable (project, table) -> rows


def _split_tuples(values: str) -> list[list]:
    """Parse `(a,'b',NULL),(...)` respecting quotes and escapes."""
    tuples, cur, field = [], [], []
    i, n = 0, len(values)
    depth = 0
    in_str = False
    while i < n:
        c = values[i]
        if in_str:
            if c == "\\":
                field.append(values[i + 1])
                i += 2
                continue
            if c == "'":
                in_str = False
                field.append(c)
            else:
                field.append(c)
        elif c == "'":
            in_str = True
            field.append(c)
        elif c == "(":
            depth += 1
            if depth == 1:
                cur, field = [], []
        elif c in ",)" and depth == 1:
            tok = "".join(field).strip()
            if tok:
                if tok.upper() == "NULL":
                    cur.append(None)
                elif tok.startswith("'"):
                    cur.append(tok[1:-1])
                elif "." in tok or "e" in tok or "E" in tok:
                    cur.append(float(tok))
                else:
                    cur.append(int(tok))
            field = []
            if c == ")":
                depth = 0
                tuples.append(cur)
        else:
            field.append(c)
        i += 1
    return tuples


class _Handler(socketserver.BaseRequestHandler):
    def _send(self, payload: bytes):
        hdr = struct.pack("<I", len(payload))[:3] + bytes([self._seq])
        self.request.sendall(hdr + payload)
        self._seq = (self._seq + 1) & 0xFF

    def _recv(self):
        hdr = b""
        while len(hdr) < 4:
            c = self.request.recv(4 - len(hdr))
            if not c:
                return None
            hdr += c
        ln = hdr[0] | hdr[1] << 8 | hdr[2] << 16
        self._seq = (hdr[3] + 1) & 0xFF
        buf = b""
        while len(buf) < ln:
            buf += self.request.recv(ln - len(buf))
        return buf

    def _ok(self, affected=0):
        self._send(b"\x00" + _lenenc(affected) + _lenenc(0)
                   + struct.pack("<HH", 2, 0))

    def _error(self, code, msg):
        self._send(b"\xff" + struct.pack("<H", code) + b"#HY000"
                   + msg.encode())

    def _resultset(self, names, rows):
        self._send(_lenenc(len(names)))
        for nm in names:
            b = b""
            for s in ("def", "", "", "", nm, nm):
                e = s.encode()
                b += _lenenc(len(e)) + e
            b += b"\x0c" + struct.pack("<HIBHBH", 33, 255, 0xFD, 0, 0, 0)
            self._send(b)
        self._send(b"\xfe" + struct.pack("<HH", 0, 2))
        for row in rows:
            b = b""
            for v in row:
                if v is None:
                    b += b"\xfb"
                else:
                    e = str(v).encode()
                    b += _lenenc(len(e)) + e
            self._send(b)
        self._send(b"\xfe" + struct.pack("<HH", 0, 2))

    def handle(self):
        st = self.server.store
        self._seq = 0
        salt = b"0123456789abcdefghij"  # 20 bytes
        hs = (b"\x0a" + b"5.7.fixture\x00" + struct.pack("<I", 1)
              + salt[:8] + b"\x00"
              + struct.pack("<H", 0x0200 | 0x8000)  # cap low
              + b"\x21" + struct.pack("<H", 2)
              + struct.pack("<H", 0x80000 >> 16)  # cap high
              + bytes([21]) + b"\x00" * 10
              + salt[8:] + b"\x00" + b"mysql_native_password\x00")
        self._send(hs)
        resp = self._recv()
        if resp is None:
            return
        i = 4 + 4 + 1 + 23
        end = resp.index(b"\x00", i)
        user = resp[i:end].decode()
        i = end + 1
        alen = resp[i]
        i += 1
        scramble = resp[i : i + alen]
        want = native_password_scramble(PASSWORD, salt)
        if user != USER or scramble != want:
            self._error(1045, f"Access denied for user '{user}'")
            return
        self._ok()
        while True:
            pkt = self._recv()
            if pkt is None or pkt[0] == 0x01:  # COM_QUIT
                return
            if pkt[0] != 0x03:
                self._error(1064, f"unsupported command {pkt[0]}")
                continue
            sql = pkt[1:].decode()
            st.queries.append(sql)
            self._dispatch(st, sql)

    def _dispatch(self, st, sql):
        s = sql.strip()
        m = re.match(r"insert into `(\w+)`\.`(\w+)` \(([^)]*)\) "
                     r"values (.+)$", s, re.I | re.S)
        if m:
            tuples = _split_tuples(m.group(4))
            if st.poison is not None and any(
                    st.poison in [v for v in t] for t in tuples):
                return self._error(1062, "poisoned row")
            st.tables.setdefault(m.group(2), []).extend(
                tuple(t) for t in tuples)
            return self._ok(len(tuples))
        m = re.match(r"LOAD DATA FROM 'odps://(\w+)/(\w+)'"
                     r"( OVERWRITE)? INTO TABLE (\w+)\.(\w+)", s)
        if m:
            proj, src, over, schema, table = m.groups()
            rows = st.odps_rows(proj, src) if st.odps_rows else []
            dst = st.tables.setdefault(table, [])
            if over:
                dst.clear()
            dst.extend(tuple(r) for r in rows)
            st.next_job += 1
            jid = f"job{st.next_job}"
            st.jobs[jid] = ["RUNNING", "SUCCEEDED"]
            return self._resultset(["job_id"], [[jid]])
        m = re.match(r"select state from information_schema.job_instances"
                     r" where job_id like '(\w+)'", s)
        if m:
            states = st.jobs.get(m.group(1))
            if not states:
                return self._resultset(["state"], [])
            state = states.pop(0) if len(states) > 1 else states[0]
            return self._resultset(["state"], [[state]])
        return self._error(1064, f"syntax error near {s[:40]!r}")


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


@pytest.fixture()
def adsd():
    srv = _Server(("127.0.0.1", 0), _Handler)
    srv.store = _Store()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def test_scramble_and_literals():
    # the documented double-SHA1 construction, spot values
    assert native_password_scramble("", b"x" * 20) == b""
    s = native_password_scramble("pw", b"s" * 20)
    assert len(s) == 20 and s != native_password_scramble("pw2", b"s" * 20)
    assert sql_literal(None) == "NULL"
    assert sql_literal(1.5) == "1.5"
    assert sql_literal("a'b\\c") == "'a\\'b\\\\c'"
    assert sql_literal(True) == "1"


def test_wire_auth_query_and_err(adsd):
    host, port = adsd.server_address
    conn = MySqlWire(host, port, USER, PASSWORD, SCHEMA)
    assert conn.query("insert into `adsdb`.`t` (`a`,`b`) values "
                      "(1,'x'),(2,NULL)") == []
    assert adsd.store.tables["t"] == [(1, "x"), (2, None)]
    with pytest.raises(MySqlError) as ei:
        conn.query("select bogus")
    assert ei.value.code == 1064
    conn.close()
    with pytest.raises(MySqlError) as ei2:
        MySqlWire(host, port, USER, "wrongpass", SCHEMA)
    assert ei2.value.code == 1045


def test_ads_insert_batches_and_dirty_fallback(spark, adsd):
    host, port = adsd.server_address
    df = spark.createDataFrame(
        [(i, f"n{i}", None if i % 4 == 0 else i / 2) for i in range(40)],
        "id long, name string, score double").repartition(2)
    res = ads_insert(df, host, port, USER, PASSWORD, SCHEMA, "out",
                     batch_size=8)
    assert res == {"written": 40, "errors": 0}
    assert sorted(t[0] for t in adsd.store.tables["out"]) == list(range(40))
    assert any(t[2] is None for t in adsd.store.tables["out"])
    # poison a value: the whole batch ERRs, singles isolate the dirty row
    adsd.store.poison = "BAD"
    bad = spark.createDataFrame(
        [(100, "ok", 1.0), (101, "BAD", 2.0), (102, "ok2", 3.0)],
        "id long, name string, score double").coalesce(1)
    res2 = ads_insert(bad, host, port, USER, PASSWORD, SCHEMA, "out",
                      batch_size=8)
    assert res2 == {"written": 2, "errors": 1}


def test_ads_load_via_live_odps_staging(spark, adsd):
    """The full load pipeline: DF -> LIVE ODPS tunnel write -> LOAD DATA
    submit over the MySQL wire -> job poll until SUCCEEDED."""
    from http.server import ThreadingHTTPServer

    from test_odps_live import _Handler as OdpsHandler
    from test_odps_live import _Store as OdpsStore
    from test_odps_live import ACCESS_ID, ACCESS_KEY, PROJECT

    osrv = ThreadingHTTPServer(("127.0.0.1", 0), OdpsHandler)
    osrv.store = OdpsStore()
    OdpsHandler.store = osrv.store
    threading.Thread(target=osrv.serve_forever, daemon=True).start()
    osrv.store.create("transfer", [("id", "bigint"), ("name", "string")])
    adsd.store.odps_rows = lambda proj, tbl: osrv.store.rows(tbl)

    ohost, oport = osrv.server_address
    host, port = adsd.server_address
    df = spark.createDataFrame([(i, f"r{i}") for i in range(25)],
                               "id long, name string")
    res = ads_load(
        df, host, port, USER, PASSWORD, SCHEMA, "loaded",
        odps={"endpoint": f"http://{ohost}:{oport}", "project": PROJECT,
              "accessId": ACCESS_ID, "accessKey": ACCESS_KEY,
              "table": "transfer"},
        poll_interval=0.01)
    assert res["state"] == "SUCCEEDED" and res["staged_rows"] == 25
    assert sorted(t[0] for t in adsd.store.tables["loaded"]) == list(
        range(25))
    # the poll loop really polled (RUNNING first, then SUCCEEDED)
    polls = [q for q in adsd.store.queries if "job_instances" in q]
    assert len(polls) >= 2
    osrv.shutdown()
    osrv.server_close()


def test_job_compiler_wiring(spark, adsd):
    from datax_spark.plans.job import compile_writer

    host, port = adsd.server_address
    df = spark.createDataFrame([(1, "a"), (2, "b")],
                               "id long, name string")
    res = compile_writer(df, {
        "name": "adswriter",
        "parameter": {"url": f"{host}:{port}", "schema": SCHEMA,
                      "table": "wired", "username": USER,
                      "password": PASSWORD, "writeMode": "insert",
                      "batchSize": 16},
    })
    assert res == {"written": 2, "errors": 0}
    assert sorted(adsd.store.tables["wired"]) == [(1, "a"), (2, "b")]
