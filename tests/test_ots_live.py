"""Live Tablestore reader/writer (sources/ots_live.py) against an
in-process HTTP fixture speaking the same OTS 2014-08-08 protobuf
grammar — including REAL signature verification (the fixture recomputes
the HMAC-SHA1 over the canonical x-ots-* headers with the shared secret
and rejects mismatches), so the auth handshake is exercised end to end.
"""

from __future__ import annotations

import base64
import hashlib
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from datax_spark.sources.ots_live import (
    INF_MAX,
    INF_MIN,
    OtsClient,
    OtsError,
    _column,
    _columns,
    _ld,
    _vi,
    decode_column,
    decode_row,
    decode_value,
    encode_value,
    ots_plan_ranges,
    ots_read,
    ots_write,
    pb_fields,
    sign_request,
)

ACCESS_ID = "testid"
ACCESS_KEY = "sekrit"


# --------------------------------------------------------------------------
# fixture server: protobuf dispatch over HTTP + signature verification
# --------------------------------------------------------------------------


def _cmp_key(v):
    # INF_MIN < any value < INF_MAX; within a pk column values share a type
    if v is INF_MIN:
        return (0,)
    if v is INF_MAX:
        return (2,)
    return (1, v)


def _pk_key(pk_cols):
    return tuple(_cmp_key(v) for _, v in pk_cols)


class _Store:
    def __init__(self):
        # table -> (pk_schema [(name, 'INTEGER'|'STRING')], rows
        #           {pk value tuple: {attr: value}})
        self.tables: dict[str, tuple[list, dict]] = {}
        self.get_range_calls = 0
        self.batch_write_calls = 0
        self.reject_pk_prefix: str | None = None
        # change-stream state: table -> stream_id; stream_id ->
        # [(shard_id, parent|None)]; shard_id -> [(action, pk_cols,
        # attrs, ts, idx, epoch)]; closed shards return no next iterator
        # once drained
        self.streams: dict[str, str] = {}
        self.shards: dict[str, list] = {}
        self.shard_recs: dict[str, list] = {}
        self.closed: set[str] = set()
        self.get_iterator_calls = 0
        self.stream_record_calls = 0

    def create(self, table, pk_schema):
        self.tables[table] = (pk_schema, {})

    def create_stream(self, table, shards):
        sid = f"stream_{table}"
        self.streams[table] = sid
        self.shards[sid] = list(shards)
        for s, _ in shards:
            self.shard_recs.setdefault(s, [])
        return sid

    def stream_put(self, shard, pk_cols, attrs, action="PUT",
                   ts=0, epoch=0):
        recs = self.shard_recs[shard]
        recs.append((action, list(pk_cols), list(attrs), ts, len(recs),
                     epoch))

    def rows_sorted(self, table):
        _, rows = self.tables[table]
        return sorted(rows.items(), key=lambda kv: tuple(
            _cmp_key(v) for v in kv[0]))


def _error(code, msg=""):
    return _ld(1, code.encode()) + _ld(2, msg.encode())


def _dispatch(store: _Store, action: str, body: bytes) -> bytes:
    if action == "DescribeTable":
        table = next(v.decode() for f, w, v in pb_fields(body) if f == 1)
        pk_schema, _ = store.tables[table]
        meta = _ld(1, table.encode())
        tnum = {"INTEGER": 1, "STRING": 2, "BINARY": 3}
        for n, t in pk_schema:
            meta += _ld(2, _ld(1, n.encode()) + _vi(2, tnum[t]))
        return _ld(1, meta)

    if action == "GetRange":
        store.get_range_calls += 1
        table, direction, limit = "", 0, None
        columns, start, end = [], [], []
        for f, w, v in pb_fields(body):
            if f == 1:
                table = v.decode()
            elif f == 2:
                direction = v
            elif f == 3:
                columns.append(v.decode())
            elif f == 4:
                limit = v
            elif f == 5:
                start.append(decode_column(v))
            elif f == 6:
                end.append(decode_column(v))
        skey, ekey = _pk_key(start), _pk_key(end)
        pk_schema, _ = store.tables[table]
        items = store.rows_sorted(table)
        if direction == 0:  # FORWARD: start <= pk < end
            sel = [kv for kv in items
                   if skey <= tuple(_cmp_key(x) for x in kv[0]) < ekey]
        else:  # BACKWARD: end < pk <= start, descending
            sel = [kv for kv in reversed(items)
                   if ekey < tuple(_cmp_key(x) for x in kv[0]) <= skey]
        out = b""
        n = limit if limit is not None else 5000
        for pkvals, attrs in sel[:n]:
            pk_cols = [(nm, v) for (nm, _), v in zip(pk_schema, pkvals)]
            # full pk always comes back in field 1 (the real service
            # returns it); attr projection honors columns_to_get
            acols = [(k, v) for k, v in attrs.items()
                     if not columns or k in columns]
            out += _ld(3, _columns(1, pk_cols) + _columns(2, acols))
        resp = _ld(1, _ld(1, _vi(1, 1)))  # consumed.capacity_unit.read=1
        if len(sel) > n:
            nxt_pk, _ = sel[n]
            for (nm, _t), v in zip(pk_schema, nxt_pk):
                resp += _ld(2, _column(nm, v))
        return resp + out

    if action in ("PutRow", "UpdateRow"):
        table, pk, puts, dels = "", [], [], []
        for f, w, v in pb_fields(body):
            if f == 1:
                table = v.decode()
            elif f == 3:
                pk.append(decode_column(v))
            elif f == 4:
                if action == "PutRow":
                    puts.append(decode_column(v))
                else:
                    op, nm, val = 1, "", None
                    for f2, w2, v2 in pb_fields(v):
                        if f2 == 1:
                            op = v2
                        elif f2 == 2:
                            nm = v2.decode()
                        elif f2 == 3:
                            val = decode_value(v2)
                    (puts if op == 1 else dels).append((nm, val))
        _, rows = store.tables[table]
        key = tuple(v for _, v in pk)
        if action == "PutRow":
            rows[key] = dict(puts)
        else:
            cur = rows.setdefault(key, {})
            cur.update(dict(puts))
            for nm, _ in dels:
                cur.pop(nm, None)
        return _ld(1, _ld(1, _vi(2, 1)))

    if action == "BatchWriteRow":
        store.batch_write_calls += 1
        out_tables = b""
        for f, w, tval in pb_fields(body):
            if f != 1:
                continue
            table = ""
            statuses = {2: b"", 3: b"", 4: b""}
            ops = []  # (field, pk, puts, dels)
            for f2, w2, v2 in pb_fields(tval):
                if f2 == 1:
                    table = v2.decode()
                elif f2 in (2, 3, 4):
                    pk, puts, dels = [], [], []
                    for f3, w3, v3 in pb_fields(v2):
                        if f3 == 2:
                            pk.append(decode_column(v3))
                        elif f3 == 3:
                            if f2 == 2:
                                puts.append(decode_column(v3))
                            else:
                                op, nm, val = 1, "", None
                                for f4, w4, v4 in pb_fields(v3):
                                    if f4 == 1:
                                        op = v4
                                    elif f4 == 2:
                                        nm = v4.decode()
                                    elif f4 == 3:
                                        val = decode_value(v4)
                                (puts if op == 1 else dels).append((nm, val))
                    ops.append((f2, pk, puts, dels))
            _, rows = store.tables[table]
            for fld, pk, puts, dels in ops:
                key = tuple(v for _, v in pk)
                rej = store.reject_pk_prefix
                if rej and any(isinstance(v, str) and v.startswith(rej)
                               for v in key):
                    status = _vi(1, 0) + _ld(2, _error("OTSInvalidPK"))
                else:
                    if fld == 2:
                        rows[key] = dict(puts)
                    elif fld == 3:
                        cur = rows.setdefault(key, {})
                        cur.update(dict(puts))
                        for nm, _ in dels:
                            cur.pop(nm, None)
                    else:
                        rows.pop(key, None)
                    status = _vi(1, 1)
                statuses[fld] += _ld(fld, status)
            tout = _ld(1, table.encode())
            tout += statuses[2] + statuses[3] + statuses[4]
            out_tables += _ld(1, tout)
        return out_tables

    if action == "ListStream":
        table = next(v.decode() for f, w, v in pb_fields(body) if f == 1)
        sid = store.streams.get(table)
        if sid is None:
            return b""
        return _ld(1, _ld(1, sid.encode()) + _ld(2, table.encode()))

    if action == "DescribeStream":
        sid = next(v.decode() for f, w, v in pb_fields(body) if f == 1)
        out = b""
        for shard, parent in store.shards[sid]:
            s = _ld(1, shard.encode())
            if parent:
                s += _ld(2, parent.encode())
            out += _ld(4, s)
        return out

    if action == "GetShardIterator":
        store.get_iterator_calls += 1
        shard = next(v.decode() for f, w, v in pb_fields(body) if f == 2)
        return _ld(1, f"{shard}|0".encode())

    if action == "GetStreamRecords":
        store.stream_record_calls += 1
        it, limit = "", 1000
        for f, w, v in pb_fields(body):
            if f == 1:
                it = v.decode()
            elif f == 2:
                limit = v
        shard, off = it.rsplit("|", 1)
        off = int(off)
        recs = store.shard_recs[shard]
        page = recs[off : off + limit]
        out = b""
        anum = {"PUT": 1, "UPDATE": 2, "DELETE": 3}
        from datax_spark.sources.ots_live import encode_row

        for act, pk, attrs, ts, idx, epoch in page:
            rec = _vi(1, anum[act]) + _ld(2, encode_row(pk, attrs))
            rec += _vi(3, ts) + _vi(4, idx) + _vi(5, epoch)
            out += _ld(1, rec)
        end = off + len(page)
        if end >= len(recs) and shard in store.closed:
            return out  # no next iterator: closed shard fully drained
        return out + _ld(2, f"{shard}|{end}".encode())

    raise OtsError("OTSParameterInvalid", f"no such action {action}")


class _Handler(BaseHTTPRequestHandler):
    store: _Store = None

    def log_message(self, *a):
        pass

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        action = self.path.strip("/")
        # REAL auth check: recompute the HMAC over the canonical headers
        hdrs = {k.lower(): v for k, v in self.headers.items()
                if k.lower().startswith("x-ots-")}
        want = sign_request(ACCESS_KEY, action, hdrs)
        md5 = base64.b64encode(hashlib.md5(body).digest()).decode()
        if (hdrs.get("x-ots-signature") != want
                or hdrs.get("x-ots-contentmd5") != md5
                or hdrs.get("x-ots-accesskeyid") != ACCESS_ID):
            payload = _error("OTSAuthFailed", "signature mismatch")
            self.send_response(403)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)
            return
        try:
            payload = _dispatch(self.store, action, body)
            status = 200
        except OtsError as e:
            payload = _error(e.code, e.message)
            status = 400
        except KeyError as e:
            payload = _error("OTSObjectNotExist", str(e))
            status = 404
        self.send_response(status)
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture()
def otsd():
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
    return OtsClient(f"http://{host}:{port}", ACCESS_ID, ACCESS_KEY, "inst")


def _seed(store, table="t", n=57):
    store.create(table, [("uid", "INTEGER"), ("name", "STRING")])
    _, rows = store.tables[table]
    for i in range(n):
        rows[(i, f"k{i:03d}")] = {"val": f"v{i}", "score": float(i) / 2}
    return table


# --------------------------------------------------------------------------
# codec
# --------------------------------------------------------------------------


def test_value_codec_roundtrip():
    for v in (0, 1, -1, 42, -(1 << 62), (1 << 62), "", "héllo", True,
              False, 3.5, -0.25, b"", b"\x00\xffbin"):
        assert decode_value(encode_value(v)) == v
        assert type(decode_value(encode_value(v))) is type(v)
    assert decode_value(encode_value(INF_MIN)) is INF_MIN
    assert decode_value(encode_value(INF_MAX)) is INF_MAX


def test_column_and_row_roundtrip():
    pk = [("uid", 7), ("name", "a")]
    attrs = [("val", "x"), ("score", 1.5), ("ok", True)]
    buf = _columns(1, pk) + _columns(2, attrs)
    got_pk, got_attrs = decode_row(buf)
    assert got_pk == pk and got_attrs == attrs
    assert decode_column(_column("c", -9)) == ("c", -9)


# --------------------------------------------------------------------------
# client against the fixture
# --------------------------------------------------------------------------


def test_describe_and_auth_rejection(otsd):
    _seed(otsd.store)
    cl = _client(otsd)
    assert cl.describe_table("t") == [("uid", "INTEGER"),
                                      ("name", "STRING")]
    bad = OtsClient(cl.endpoint, ACCESS_ID, "wrongkey", "inst")
    with pytest.raises(OtsError) as ei:
        bad.describe_table("t")
    assert ei.value.code == "OTSAuthFailed"


def test_get_range_pagination_and_projection(otsd):
    _seed(otsd.store, n=10)
    cl = _client(otsd)
    start = [("uid", INF_MIN), ("name", INF_MIN)]
    end = [("uid", INF_MAX), ("name", INF_MAX)]
    rows = list(cl.scan_range("t", start, end, columns=["uid", "val"],
                              page_limit=3))
    assert len(rows) == 10
    assert otsd.store.get_range_calls >= 4  # 3+3+3+1 pages
    # projection: only requested attrs come back
    assert all(dict(attrs).keys() == {"val"} for _, attrs in rows)
    # backward direction: end < pk <= start, descending
    back, _ = cl.get_range("t", end, start, limit=2, direction="BACKWARD")
    assert [dict(pk)["uid"] for pk, _ in back] == [9, 8]


def test_put_update_delete_row_semantics(otsd):
    otsd.store.create("t", [("uid", "INTEGER")])
    cl = _client(otsd)
    cl.put_row("t", [("uid", 1)], [("a", "x"), ("b", 2)])
    assert otsd.store.tables["t"][1][(1,)] == {"a": "x", "b": 2}
    # UpdateRow: PUT one attr, DELETE another (null-attr contract)
    cl.update_row("t", [("uid", 1)], puts=[("a", "y")], deletes=["b"])
    assert otsd.store.tables["t"][1][(1,)] == {"a": "y"}


def test_plan_ranges_probe_split_and_user_points(otsd):
    table = _seed(otsd.store, n=40)
    cl = _client(otsd)
    begin = [INF_MIN, INF_MIN]
    end = [INF_MAX, INF_MAX]
    ranges = ots_plan_ranges(cl, table, begin, end, 4)
    assert len(ranges) == 4
    # outer bounds preserved; interior bounds stitched at (point, INF_MIN)
    assert ranges[0][0][0] == ("uid", INF_MIN)
    assert ranges[-1][1][0] == ("uid", INF_MAX)
    for (s, e), (s2, e2) in zip(ranges, ranges[1:]):
        assert e == s2 and e[1] == ("name", INF_MIN)
    user = ots_plan_ranges(cl, table, begin, end, 99,
                           split_points=[10, 30])
    assert len(user) == 3
    assert user[1][0][0] == ("uid", 10) and user[1][1][0] == ("uid", 30)
    # empty table -> probe finds nothing -> single range
    otsd.store.create("empty", [("uid", "INTEGER")])
    assert len(ots_plan_ranges(cl, "empty", [INF_MIN], [INF_MAX], 8)) == 1


def test_ots_read_end_to_end(spark, otsd):
    table = _seed(otsd.store, n=57)
    host, port = otsd.server_address
    df = ots_read(
        spark, f"http://{host}:{port}", ACCESS_ID, ACCESS_KEY, "inst",
        table, schema="uid long, name string, val string, score double",
        num_slices=4, page_limit=20,
    )
    got = sorted((r.uid, r.name, r.val, r.score) for r in df.collect())
    want = sorted((i, f"k{i:03d}", f"v{i}", i / 2) for i in range(57))
    assert got == want
    # the probe (2) + >=4 slice scans all hit the server
    assert otsd.store.get_range_calls >= 6


def test_ots_write_putrow_and_null_semantics(spark, otsd):
    otsd.store.create("w", [("uid", "INTEGER"), ("name", "STRING")])
    host, port = otsd.server_address
    df = spark.createDataFrame(
        [(1, "a", "x", 1.0), (2, "b", None, 2.0), (None, "c", "z", 3.0)],
        "uid long, name string, val string, score double",
    )
    res = ots_write(df, f"http://{host}:{port}", ACCESS_ID, ACCESS_KEY,
                    "inst", "w", primary_key=["uid", "name"],
                    write_mode="PutRow", batch_size=2)
    assert res == {"written": 2, "errors": 1}  # null pk is dirty
    _, rows = otsd.store.tables["w"]
    assert rows[(1, "a")] == {"val": "x", "score": 1.0}
    assert rows[(2, "b")] == {"score": 2.0}  # PutRow SKIPS null attrs


def test_ots_write_updaterow_deletes_null_attrs(spark, otsd):
    otsd.store.create("w", [("uid", "INTEGER")])
    _, rows = otsd.store.tables["w"]
    rows[(1,)] = {"val": "old", "score": 9.0}
    host, port = otsd.server_address
    df = spark.createDataFrame([(1, None, 5.0)],
                               "uid long, val string, score double")
    res = ots_write(df, f"http://{host}:{port}", ACCESS_ID, ACCESS_KEY,
                    "inst", "w", primary_key=["uid"],
                    write_mode="UpdateRow")
    assert res == {"written": 1, "errors": 0}
    assert rows[(1,)] == {"score": 5.0}  # UpdateRow DELETES attr on null


def test_ots_write_deleterow_and_rejects_are_dirty(spark, otsd):
    otsd.store.create("w", [("name", "STRING")])
    _, rows = otsd.store.tables["w"]
    rows[("keep",)] = {"v": 1}
    rows[("drop",)] = {"v": 2}
    otsd.store.reject_pk_prefix = "bad"
    host, port = otsd.server_address
    df = spark.createDataFrame([("drop",), ("bad1",)], "name string")
    res = ots_write(df, f"http://{host}:{port}", ACCESS_ID, ACCESS_KEY,
                    "inst", "w", primary_key=["name"],
                    write_mode="DeleteRow")
    assert res == {"written": 1, "errors": 1}
    assert set(rows) == {("keep",)}


def test_job_compiler_wiring(spark, otsd, tmp_path):
    """otsreader -> otswriter job.json round trip through run_job's
    compile path, gated on accessId (legacy option-builder specs
    without credentials keep compiling via sources/connectors.py)."""
    from datax_spark.plans.job import compile_reader, compile_writer

    table = _seed(otsd.store, n=23)
    otsd.store.create("out", [("uid", "INTEGER"), ("name", "STRING")])
    host, port = otsd.server_address
    ep = f"http://{host}:{port}"
    common = {"endpoint": ep, "accessId": ACCESS_ID,
              "accessKey": ACCESS_KEY, "instanceName": "inst"}
    df = compile_reader(spark, {
        "name": "otsreader",
        "parameter": {**common, "table": table,
                      "column": [{"name": "uid", "type": "int"},
                                 {"name": "name", "type": "string"},
                                 {"name": "val", "type": "string"}],
                      "range": {"begin": [{"type": "INF_MIN"},
                                          {"type": "INF_MIN"}],
                                "end": [{"type": "INF_MAX"},
                                        {"type": "INF_MAX"}]}},
    }, channel=3)
    res = compile_writer(df, {
        "name": "otswriter",
        "parameter": {**common, "table": "out",
                      "primaryKey": [{"name": "uid", "type": "int"},
                                     {"name": "name", "type": "string"}],
                      "column": [{"name": "val", "type": "string"}],
                      "writeMode": "PutRow"},
    })
    assert res == {"written": 23, "errors": 0}
    _, rows = otsd.store.tables["out"]
    assert rows[(5, "k005")] == {"val": "v5"}
    assert len(rows) == 23
