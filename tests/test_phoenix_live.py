"""Live Phoenix writer (sources/phoenix_live.py) against an in-process
Avatica JSON fixture: upsert-by-pk store, transactional buffering
(autoCommit=false + commit/rollback), and a poison-row mode that makes
a whole executeBatch fail — exercising the reference's batch->single
fallback with dirty accounting."""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from datax_spark.sources.phoenix_live import (
    AvaticaClient,
    AvaticaError,
    phoenix_write,
    upsert_sql_template,
)


class _Store:
    def __init__(self):
        # table -> {pk value: row dict}; first column is the pk
        self.tables: dict[str, dict] = {"T": {}}
        self.poison: str | None = None  # any bound value == poison fails
        self.batch_calls = 0
        self.commits = 0


class _Conn:
    def __init__(self):
        self.auto_commit = True
        self.statements: dict[int, str] = {}
        self.pending: list = []  # (table, cols, row values)


def _err(msg):
    return {"response": "error", "errorMessage": msg}


class _Handler(BaseHTTPRequestHandler):
    store: _Store = None
    conns: dict = None

    def log_message(self, *a):
        pass

    def _apply(self, table, cols, vals):
        pk = vals[0]
        row = self.store.tables[table].setdefault(pk, {})
        row.update(dict(zip(cols, vals)))

    def do_POST(self):
        st = self.store
        n = int(self.headers.get("Content-Length", 0))
        req = json.loads(self.rfile.read(n))
        kind = req.get("request")
        cid = req.get("connectionId")
        out: dict = {"response": kind}
        if kind == "openConnection":
            self.conns[cid] = _Conn()
        elif kind == "connectionSync":
            self.conns[cid].auto_commit = bool(
                req["connProps"].get("autoCommit"))
            out["connProps"] = req["connProps"]
        elif kind == "prepare":
            c = self.conns[cid]
            sid = len(c.statements) + 1
            c.statements[sid] = req["sql"]
            out["statement"] = {"connectionId": cid, "id": sid}
        elif kind in ("executeBatch", "prepareAndExecute"):
            c = self.conns[cid]
            if kind == "prepareAndExecute":
                sql = req["sql"]
                m = re.match(r'delete from "(\w+)"', sql)
                if m:
                    st.tables[m.group(1)].clear()
                    out["updateCount"] = 0
                else:
                    return self._send(_err(f"unsupported sql {sql!r}"))
            else:
                st.batch_calls += 1
                sql = c.statements[req["statementId"]]
                m = re.match(
                    r'upsert into "(\w+)" \(([^)]+) \) values', sql)
                table, colpart = m.group(1), m.group(2)
                cols = [x.strip().strip('"') for x in colpart.split(",")]
                staged = []
                for row in req["parameterValues"]:
                    vals = [tv["value"] for tv in row]
                    if st.poison is not None and st.poison in vals:
                        return self._send(_err(
                            f"constraint violation on {st.poison!r}"))
                    staged.append((table, cols, vals))
                if c.auto_commit:
                    for t, cs, vs in staged:
                        self._apply(t, cs, vs)
                else:
                    c.pending.extend(staged)
                out["updateCounts"] = [1] * len(staged or [1])
        elif kind == "commit":
            c = self.conns[cid]
            st.commits += 1
            for t, cs, vs in c.pending:
                self._apply(t, cs, vs)
            c.pending.clear()
        elif kind == "rollback":
            self.conns[cid].pending.clear()
        elif kind in ("closeStatement", "closeConnection"):
            pass
        else:
            out = _err(f"unknown request {kind!r}")
        self._send(out)

    def _send(self, obj):
        body = json.dumps(obj).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def pqs():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.store = _Store()
    _Handler.store = srv.store
    _Handler.conns = {}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _url(srv):
    host, port = srv.server_address
    return f"http://{host}:{port}"


def test_upsert_sql_template_matches_reference_shape():
    assert upsert_sql_template("T", ["pk", "a b"]) == (
        'upsert into "T" ("pk","a b" ) values (?,?)')


def test_client_transactional_buffering(pqs):
    cl = AvaticaClient(_url(pqs))
    cl.open(auto_commit=False)
    stmt = cl.prepare(upsert_sql_template("T", ["pk", "v"]))
    cl.execute_batch(stmt, [[{"type": "STRING", "value": "k1"},
                             {"type": "LONG", "value": 1}]])
    assert pqs.store.tables["T"] == {}  # buffered until commit
    cl.commit()
    assert pqs.store.tables["T"] == {"k1": {"pk": "k1", "v": 1}}
    # rollback drops staged rows
    cl.execute_batch(stmt, [[{"type": "STRING", "value": "k2"},
                             {"type": "LONG", "value": 2}]])
    cl.rollback()
    cl.commit()
    assert "k2" not in pqs.store.tables["T"]
    cl.close()


def test_phoenix_write_upsert_and_nullmodes(spark, pqs):
    df = spark.createDataFrame(
        [("k1", "x", 1.5), ("k2", None, 2.0), ("k1", "y", None)],
        "pk string, name string, score double")
    res = phoenix_write(df.coalesce(1), _url(pqs), "T", batch_size=2)
    assert res == {"written": 3, "errors": 0}
    t = pqs.store.tables["T"]
    # latest upsert per pk wins within the partition order
    assert t["k1"]["name"] == "y" and t["k1"]["score"] is None
    assert t["k2"]["name"] is None  # nullMode=skip binds NULL
    res2 = phoenix_write(
        spark.createDataFrame([("k3", None, None)],
                              "pk string, name string, score double"),
        _url(pqs), "T", null_mode="empty")
    assert pqs.store.tables["T"]["k3"]["name"] == ""  # empty arm


def test_batch_failure_falls_back_row_by_row(pqs, spark):
    pqs.store.poison = "BAD"
    df = spark.createDataFrame(
        [("a", "ok1"), ("b", "BAD"), ("c", "ok2"), ("d", "BAD")],
        "pk string, v string").coalesce(1)
    res = phoenix_write(df, _url(pqs), "T", batch_size=4)
    assert res == {"written": 2, "errors": 2}  # dirty rows isolated
    assert set(pqs.store.tables["T"]) == {"a", "c"}
    # the fallback really did split: 1 failed batch + 4 single retries
    assert pqs.store.batch_calls >= 5


def test_truncate_and_job_compiler_wiring(spark, pqs):
    from datax_spark.plans.job import compile_writer

    pqs.store.tables["T"] = {"old": {"pk": "old", "v": 0}}
    df = spark.createDataFrame([("n1", "a"), ("n2", "b")],
                               "pk string, v string")
    res = compile_writer(df, {
        "name": "hbase11xsqlwriter",
        "parameter": {"queryServerAddress": _url(pqs), "table": "T",
                      "column": ["pk", "v"], "truncate": "true",
                      "batchSize": 16},
    })
    assert res == {"written": 2, "errors": 0}
    assert set(pqs.store.tables["T"]) == {"n1", "n2"}  # old row gone
