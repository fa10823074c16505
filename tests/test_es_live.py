"""Live Elasticsearch writer (sources/es_live.py) against an in-process
HTTP fixture implementing the real endpoints (_bulk NDJSON, index
lifecycle, atomic _aliases) — the ES twin of the embedded-Derby JDBC
proof: the bytes on the wire are what a real cluster accepts."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from datax_spark.sources.es_live import (
    EsHttpError,
    es_alias_swap,
    es_bulk_write,
    es_create_index,
    run_es_writer,
)


class _EsState:
    def __init__(self):
        self.indices: dict[str, dict] = {}  # index -> {"docs": {_id: doc}}
        self.aliases: dict[str, set[str]] = {}
        self.bulk_requests = 0
        self.auto_id = 0
        self.fail_next_bulk = 0  # request-level 503s to serve (retry test)


class _Handler(BaseHTTPRequestHandler):
    state: _EsState = None  # set per server

    def log_message(self, *a):  # silence
        pass

    def _send(self, status: int, body: dict):
        data = json.dumps(body).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _read(self) -> bytes:
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n)

    def do_PUT(self):
        idx = self.path.strip("/")
        st = self.state
        if idx in st.indices:
            self._send(400, {"error": {"type": "resource_already_exists_exception"}})
            return
        body = self._read()
        spec = json.loads(body) if body else {}
        st.indices[idx] = {"docs": {}, "spec": spec}
        self._send(200, {"acknowledged": True})

    def do_DELETE(self):
        idx = self.path.strip("/")
        if self.state.indices.pop(idx, None) is None:
            self._send(404, {"error": "index_not_found"})
        else:
            self._send(200, {"acknowledged": True})

    def do_POST(self):
        st = self.state
        body = self._read()
        if self.path == "/_bulk":
            st.bulk_requests += 1
            if st.fail_next_bulk > 0:
                st.fail_next_bulk -= 1
                self._send(503, {"error": "unavailable"})
                return
            lines = [ln for ln in body.split(b"\n") if ln.strip()]
            items = []
            i = 0
            while i < len(lines):
                act = json.loads(lines[i])
                kind, meta = next(iter(act.items()))
                i += 1
                src = {}
                if kind != "delete":  # delete carries no source line
                    src = json.loads(lines[i])
                    i += 1
                idx = meta["_index"]
                _id = meta.get("_id")
                if _id is None:
                    st.auto_id += 1
                    _id = f"auto-{st.auto_id}"
                if idx not in st.indices:
                    items.append({kind: {"status": 404, "_id": _id}})
                    continue
                if kind == "delete":
                    existed = st.indices[idx]["docs"].pop(_id, None)
                    items.append({kind: {
                        "status": 200 if existed is not None else 404,
                        "_id": _id,
                    }})
                    continue
                # fixture rule: a doc with reject=True fails item-level
                doc = src.get("doc", src) if kind == "update" else src
                if doc.get("reject"):
                    items.append({kind: {"status": 400, "_id": _id,
                                         "error": "mapper_parsing"}})
                    continue
                docs = st.indices[idx]["docs"]
                if kind == "update":
                    docs[_id] = {**docs.get(_id, {}), **doc}
                else:
                    docs[_id] = doc
                items.append({kind: {"status": 201, "_id": _id}})
            self._send(200, {"errors": any(
                next(iter(x.values()))["status"] >= 300 for x in items
            ), "items": items})
            return
        if self.path == "/_aliases":
            spec = json.loads(body)
            for action in spec["actions"]:
                kind, a = next(iter(action.items()))
                alias = a["alias"]
                if kind == "add":
                    st.aliases.setdefault(alias, set()).add(a["index"])
                elif kind == "remove":
                    if a["index"] == "*":
                        st.aliases[alias] = set()
                    else:
                        st.aliases.get(alias, set()).discard(a["index"])
            self._send(200, {"acknowledged": True})
            return
        self._send(404, {"error": "unknown"})


@pytest.fixture()
def es_server():
    state = _EsState()
    handler = type("H", (_Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", state
    finally:
        srv.shutdown()


def test_index_lifecycle_and_bulk_by_id(spark, es_server):
    endpoint, state = es_server
    es_create_index(endpoint, "docs_v1", mappings={"properties": {}})
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, body string"
    ).repartition(2)
    out = es_bulk_write(df, endpoint, "docs_v1", id_cols=["id"], batch_entries=2)
    assert out == {"indexed": 3, "errors": 0}
    docs = state.indices["docs_v1"]["docs"]
    assert docs["2"]["body"] == "b" and len(docs) == 3
    # idempotent re-run: same _ids overwrite, no duplicates
    out2 = es_bulk_write(df, endpoint, "docs_v1", id_cols=["id"])
    assert out2["indexed"] == 3 and len(state.indices["docs_v1"]["docs"]) == 3
    # cleanup=True drops and recreates
    es_create_index(endpoint, "docs_v1", cleanup=True)
    assert state.indices["docs_v1"]["docs"] == {}


def test_item_level_rejection_counts_as_error_not_failure(spark, es_server):
    endpoint, state = es_server
    es_create_index(endpoint, "q")
    df = spark.createDataFrame(
        [(1, False), (2, True), (3, False)], "id long, reject boolean"
    )
    out = es_bulk_write(df, endpoint, "q", id_cols=["id"])
    assert out == {"indexed": 2, "errors": 1}  # dirty record, job survives


def test_request_level_retry_then_success(spark, es_server):
    endpoint, state = es_server
    es_create_index(endpoint, "r")
    state.fail_next_bulk = 2  # two 503s, third attempt lands
    df = spark.createDataFrame([(1, "x")], "id long, body string").coalesce(1)
    out = es_bulk_write(
        df, endpoint, "r", id_cols=["id"], try_size=3, retry_sleep_sec=0.01
    )
    assert out == {"indexed": 1, "errors": 0}
    assert state.bulk_requests == 3


def test_update_doc_as_upsert_merges(spark, es_server):
    endpoint, state = es_server
    es_create_index(endpoint, "u")
    base = spark.createDataFrame([(1, "v1", "keep")], "id long, a string, b string")
    es_bulk_write(base, endpoint, "u", id_cols=["id"])
    patch = spark.createDataFrame([(1, "v2")], "id long, a string")
    out = es_bulk_write(patch, endpoint, "u", id_cols=["id"], action="update")
    assert out["indexed"] == 1
    assert state.indices["u"]["docs"]["1"] == {"id": 1, "a": "v2", "b": "keep"}


def test_alias_swap_atomic_cutover(es_server):
    endpoint, state = es_server
    es_create_index(endpoint, "t_v1")
    es_create_index(endpoint, "t_v2")
    es_alias_swap(endpoint, "t", "t_v1")
    assert state.aliases["t"] == {"t_v1"}
    es_alias_swap(endpoint, "t", "t_v2", clean=True)
    assert state.aliases["t"] == {"t_v2"}  # one atomic request moved it


def test_full_job_spec_through_run_job(spark, es_server, tmp_path):
    """job.json end-to-end: csv reader -> elasticsearchwriter with
    cleanup, id column, batch size, and alias cutover."""
    from datax_spark.plans.job import run_job

    endpoint, state = es_server
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id long, body string"
    ).write.option("header", True).csv(src)
    spec = {
        "job": {
            "content": [
                {
                    "reader": {
                        "name": "txtfilereader",
                        "parameter": {"path": src, "fileType": "csv",
                                      "header": True},
                    },
                    "writer": {
                        "name": "elasticsearchwriter",
                        "parameter": {
                            "endpoint": endpoint,
                            "index": "corpus_v7",
                            "cleanup": True,
                            "batchSize": 1,
                            "alias": "corpus",
                            "needCleanAlias": True,
                            "column": [
                                {"name": "id", "type": "id"},
                                {"name": "body", "type": "text"},
                            ],
                        },
                    },
                }
            ]
        }
    }
    result = run_job(spark, spec)
    assert result == {"indexed": 2, "errors": 0}
    assert set(state.indices["corpus_v7"]["docs"]) == {"1", "2"}
    assert state.aliases["corpus"] == {"corpus_v7"}


def test_transport_failure_raises_after_retries(spark):
    """A dead endpoint exhausts try_size and FAILS the job (contrast
    item-level rejections, which only count as dirty records)."""
    df = spark.createDataFrame([(1,)], "id long").coalesce(1)
    with pytest.raises(Exception, match="EsHttpError|_bulk|bulk"):
        es_bulk_write(
            df, "http://127.0.0.1:9", "x", id_cols=["id"],
            try_size=2, retry_sleep_sec=0.01,
        )


def test_cdc_deletes_in_bulk(spark, es_server):
    endpoint, state = es_server
    es_create_index(endpoint, "cdc")
    base = spark.createDataFrame(
        [(1, "a", "insert"), (2, "b", "insert")],
        "id long, body string, op string",
    )
    out = es_bulk_write(base, endpoint, "cdc", id_cols=["id"], op_col="op")
    assert out == {"indexed": 2, "errors": 0}
    # the op column never enters the stored doc
    assert state.indices["cdc"]["docs"]["1"] == {"id": 1, "body": "a"}
    ch = spark.createDataFrame(
        [(1, None, "delete"), (2, "b2", "update"), (3, None, "delete")],
        "id long, body string, op string",
    )
    out2 = es_bulk_write(ch, endpoint, "cdc", id_cols=["id"], op_col="op")
    # delete-of-missing id=3 is idempotent success
    assert out2 == {"indexed": 3, "errors": 0}
    assert set(state.indices["cdc"]["docs"]) == {"2"}
    assert state.indices["cdc"]["docs"]["2"]["body"] == "b2"


def test_tail_to_es_stream_materializes_index(spark, es_server, tmp_path):
    """Structured-Streaming CDC tail keeps the search index in sync:
    latest-wins per batch, deletes drop docs, and a checkpoint replay
    (fresh checkpoint over the same log) converges to the same state —
    idempotence by _id, no fence needed."""
    from pyspark.sql.types import StringType, StructField, StructType

    from datax_spark.sources.changelog import generate_changelog, write_segments
    from datax_spark.sources.es_live import tail_to_es

    endpoint, state = es_server
    es_create_index(endpoint, "code")
    logdir = str(tmp_path / "log")
    log = generate_changelog(
        spark, n_events=2000, n_keys=250, events_per_segment=500
    )
    write_segments(log, logdir)
    schema = StructType(
        [StructField(c, StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
        + [StructField("op", StringType())]
    )
    # actual segment schema comes from the parquet; reuse the lake tail's
    full_schema = spark.read.parquet(logdir + "/seg=0").schema
    keys = ["repo", "path", "commit"]
    tail_to_es(
        spark, logdir, str(tmp_path / "ckpt"), full_schema,
        endpoint, "code", keys, timeout_sec=120,
    )
    # oracle: latest-wins state of the clean log (ES drops deleted keys)
    from datax_spark.operators.dedup import dedup_latest
    from datax_spark.quality.quarantine import split_dirty

    clean, _ = split_dirty(spark.read.parquet(logdir + "/seg=*"))
    # the stream applies per-segment latest-wins in seq order; final =
    # global latest-wins with deletes removed
    final = dedup_latest(clean, keys).filter("op != 'delete'")
    want = {
        ":".join(str(r[k]) for k in keys): r["content"]
        for r in final.collect()
    }
    got = {
        _id: d.get("content")
        for _id, d in state.indices["code"]["docs"].items()
    }
    assert got == want
    # replay from a FRESH checkpoint: same final state (idempotent)
    tail_to_es(
        spark, logdir, str(tmp_path / "ckpt2"), full_schema,
        endpoint, "code", keys, timeout_sec=120,
    )
    got2 = {
        _id: d.get("content")
        for _id, d in state.indices["code"]["docs"].items()
    }
    assert got2 == want
