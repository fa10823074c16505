"""Live ODPS tunnel reader/writer (sources/odps_live.py) against an
in-process HTTP fixture implementing the session/rowrange/block/commit
grammar with REAL signature verification and REAL checksum validation
(the fixture decodes uploaded blocks with the shared framing, so a
corrupted block fails loudly on either side)."""

from __future__ import annotations

import json
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from datax_spark.sources.odps_live import (
    OdpsError,
    OdpsTunnel,
    crc32c,
    decode_records,
    encode_records,
    odps_read,
    odps_write,
    sign_odps,
)

ACCESS_ID = "odpsid"
ACCESS_KEY = "odpskey"
PROJECT = "proj"


class _Store:
    def __init__(self):
        # table -> {"schema": [(n, t)], "parts": {part|None: [rows]}}
        self.tables: dict[str, dict] = {}
        self.downloads: dict[str, tuple] = {}
        self.uploads: dict[str, dict] = {}
        self.next_id = 0
        self.sql: list[str] = []
        self.data_gets = 0
        self.block_puts = 0

    def create(self, table, schema):
        self.tables[table] = {"schema": list(schema), "parts": {}}

    def rows(self, table, part=None):
        return self.tables[table]["parts"].setdefault(part, [])


def _canonical(path: str, params: dict) -> str:
    if not params:
        return path
    return path + "?" + "&".join(sorted(
        k if v in (None, "") else f"{k}={v}" for k, v in params.items()))


class _Handler(BaseHTTPRequestHandler):
    store: _Store = None

    def log_message(self, *a):
        pass

    def _fail(self, status, code, msg=""):
        body = json.dumps({"Code": code, "Message": msg}).encode()
        self.send_response(status)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _ok(self, body=b""):
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _handle(self, verb):
        st = self.store
        parsed = urllib.parse.urlparse(self.path)
        params = dict(urllib.parse.parse_qsl(parsed.query,
                                             keep_blank_values=True))
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n) if n else b""
        date = self.headers.get("Date", "")
        want = sign_odps(ACCESS_KEY, verb, date,
                         _canonical(parsed.path, params))
        if self.headers.get("Authorization") != f"ODPS {ACCESS_ID}:{want}":
            return self._fail(403, "AuthorizationFailed")

        if parsed.path == f"/projects/{PROJECT}/instances":
            sql = body.decode().strip().lower()
            st.sql.append(sql)
            m = re.match(r"truncate table (\w+);", sql)
            if m:
                st.tables[m.group(1)]["parts"] = {}
                return self._ok(b"{}")
            m = re.match(
                r"alter table (\w+) drop if exists partition \((.+)\);", sql)
            if m:
                st.tables[m.group(1)]["parts"].pop(m.group(2), None)
                return self._ok(b"{}")
            m = re.match(
                r"alter table (\w+) add if not exists partition \((.+)\);",
                sql)
            if m:
                st.tables[m.group(1)]["parts"].setdefault(m.group(2), [])
                return self._ok(b"{}")
            return self._fail(400, "InvalidSQL", sql)

        m = re.match(rf"/projects/{PROJECT}/tables/(\w+)$", parsed.path)
        if not m:
            return self._fail(404, "NoSuchObject", parsed.path)
        table = m.group(1)
        if table not in st.tables:
            return self._fail(404, "NoSuchTable", table)
        meta = st.tables[table]
        part = params.get("partition") or None
        types = [t for _, t in meta["schema"]]
        schema_json = {"columns": [{"name": n_, "type": t_}
                                   for n_, t_ in meta["schema"]]}

        if verb == "POST" and "downloads" in params:
            st.next_id += 1
            did = f"dl{st.next_id}"
            snapshot = list(st.rows(table, part))
            st.downloads[did] = (table, part, snapshot)
            return self._ok(json.dumps(
                {"DownloadID": did, "RecordCount": len(snapshot),
                 "Schema": schema_json}).encode())

        if verb == "GET" and "data" in params:
            st.data_gets += 1
            did = params["downloadid"]
            if did not in st.downloads:
                return self._fail(404, "NoSuchDownload", did)
            _, _, snapshot = st.downloads[did]
            s, c = re.match(r"\((\d+),(\d+)\)",
                            params["rowrange"]).groups()
            page = snapshot[int(s): int(s) + int(c)]
            return self._ok(encode_records(page, types))

        if verb == "POST" and "uploads" in params:
            st.next_id += 1
            uid = f"up{st.next_id}"
            st.uploads[uid] = {"table": table, "part": part, "blocks": {}}
            return self._ok(json.dumps(
                {"UploadID": uid, "Schema": schema_json}).encode())

        if verb == "PUT" and "uploadid" in params:
            st.block_puts += 1
            up = st.uploads.get(params["uploadid"])
            if up is None:
                return self._fail(404, "NoSuchUpload")
            try:
                rows = decode_records(body, types)
            except OdpsError as e:
                return self._fail(400, e.code, e.message)
            up["blocks"][int(params["blockid"])] = rows
            return self._ok(b"{}")

        if verb == "POST" and "uploadid" in params:
            up = st.uploads.pop(params["uploadid"], None)
            if up is None:
                return self._fail(404, "NoSuchUpload")
            want = json.loads(body)["blocks"]
            have = sorted(up["blocks"])
            if sorted(want) != have:
                return self._fail(400, "InvalidBlockList",
                                  f"{want} != {have}")
            dst = st.rows(table, up["part"])
            for b in sorted(up["blocks"]):
                dst.extend(up["blocks"][b])
            return self._ok(b"{}")

        return self._fail(400, "NotImplemented", f"{verb} {self.path}")

    def do_GET(self):
        self._handle("GET")

    def do_PUT(self):
        self._handle("PUT")

    def do_POST(self):
        self._handle("POST")


@pytest.fixture()
def odpsd():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.store = _Store()
    _Handler.store = srv.store
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _client(srv):
    host, port = srv.server_address
    return OdpsTunnel(f"http://{host}:{port}", PROJECT, ACCESS_ID,
                      ACCESS_KEY)


def _endpoint(srv):
    host, port = srv.server_address
    return f"http://{host}:{port}"


SCHEMA = [("id", "bigint"), ("name", "string"), ("score", "double"),
          ("ok", "boolean")]


def _seed(store, n=57, table="t"):
    store.create(table, SCHEMA)
    rows = store.rows(table)
    for i in range(n):
        rows.append((i, f"n{i}", i / 2, i % 2 == 0))
    return table


def test_crc32c_known_vector():
    # the canonical Castagnoli check value
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_record_framing_roundtrip_and_corruption():
    types = ["bigint", "string", "double", "boolean"]
    rows = [(1, "a", 1.5, True),
            (-(1 << 62), "héllo", -0.25, False),
            (None, None, None, None),
            (7, "", 0.0, True)]
    blob = encode_records(rows, types)
    assert decode_records(blob, types) == rows
    # flip one payload byte: a checksum must trip
    bad = bytearray(blob)
    bad[6] ^= 0xFF
    with pytest.raises(OdpsError):
        decode_records(bytes(bad), types)


def test_session_auth_and_rowrange(odpsd):
    table = _seed(odpsd.store, n=10)
    cl = _client(odpsd)
    sess = cl.create_download(table)
    assert sess["count"] == 10 and sess["schema"] == SCHEMA
    rows = cl.read_rows(table, sess["id"], 3, 4,
                        [t for _, t in SCHEMA])
    assert [r[0] for r in rows] == [3, 4, 5, 6]
    bad = OdpsTunnel(cl.endpoint, PROJECT, ACCESS_ID, "wrong")
    with pytest.raises(OdpsError) as ei:
        bad.create_download(table)
    assert ei.value.code == "AuthorizationFailed"


def test_odps_read_split_and_projection(spark, odpsd):
    table = _seed(odpsd.store, n=57)
    df = odps_read(spark, _endpoint(odpsd), PROJECT, ACCESS_ID,
                   ACCESS_KEY, table, columns=["name", "id"],
                   num_slices=4)
    assert df.columns == ["name", "id"]  # projection + reorder
    got = sorted((r.id, r.name) for r in df.collect())
    assert got == [(i, f"n{i}") for i in range(57)]
    assert odpsd.store.data_gets >= 4  # one rowrange GET per slice


def test_odps_write_blocks_commit_and_truncate(spark, odpsd):
    table = _seed(odpsd.store, n=3)  # pre-existing rows
    df = spark.createDataFrame(
        [(i, f"w{i}", float(i), i % 3 == 0) for i in range(40)],
        "id long, name string, score double, ok boolean",
    ).repartition(2)
    res = odps_write(df, _endpoint(odpsd), PROJECT, ACCESS_ID,
                     ACCESS_KEY, table, truncate=True, block_rows=8)
    assert res["rows"] == 40
    assert res["blocks"] >= 4  # block_rows=8 over 2 tasks
    got = sorted(r[0] for r in odpsd.store.rows(table))
    assert got == list(range(40))  # truncate dropped the 3 seed rows
    assert any("truncate table" in s for s in odpsd.store.sql)
    # disjoint per-task blockId ranges (start + stride scheme)
    # second write WITHOUT truncate appends
    odps_write(df.limit(5), _endpoint(odpsd), PROJECT, ACCESS_ID,
               ACCESS_KEY, table, truncate=False, block_rows=8)
    assert len(odpsd.store.rows(table)) == 45


def test_odps_write_partitioned(spark, odpsd):
    table = _seed(odpsd.store, n=0)
    df = spark.createDataFrame(
        [(1, "a", 1.0, True)], "id long, name string, score double, "
                               "ok boolean")
    odps_write(df, _endpoint(odpsd), PROJECT, ACCESS_ID, ACCESS_KEY,
               table, partition="pt='x'", truncate=True)
    assert odpsd.store.rows(table, "pt='x'") == [(1, "a", 1.0, True)]
    assert any("add if not exists partition" in s
               for s in odpsd.store.sql)
    # partitioned read sees only its partition
    got = odps_read(spark, _endpoint(odpsd), PROJECT, ACCESS_ID,
                    ACCESS_KEY, table, partition="pt='x'").collect()
    assert [(r.id, r.name) for r in got] == [(1, "a")]


def test_job_compiler_wiring(spark, odpsd):
    from datax_spark.plans.job import compile_reader, compile_writer

    table = _seed(odpsd.store, n=23)
    odpsd.store.create("out", SCHEMA)
    common = {"odpsServer": _endpoint(odpsd), "project": PROJECT,
              "accessId": ACCESS_ID, "accessKey": ACCESS_KEY}
    df = compile_reader(spark, {
        "name": "odpsreader",
        "parameter": {**common, "table": table,
                      "column": ["id", "name", "score", "ok"]},
    }, channel=3)
    assert df.count() == 23
    res = compile_writer(df, {
        "name": "odpswriter",
        "parameter": {**common, "table": "out", "truncate": True},
    })
    assert res["rows"] == 23
    assert sorted(r[0] for r in odpsd.store.rows("out")) == list(range(23))
