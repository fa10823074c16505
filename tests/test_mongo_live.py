"""Live MongoDB reader/writer (sources/mongo_live.py) against an
in-process socket server speaking the real OP_MSG/BSON wire grammar —
the mongo twin of the embedded-Derby, mock-ES and in-process-FTP
proofs: the client's bytes are what a real mongod accepts; the backend
is a fixture because no mongod ships in this image."""

from __future__ import annotations

import socketserver
import struct
import threading

import pytest

from datax_spark.sources.mongo_live import (
    OP_MSG,
    MongoWire,
    MongoWireError,
    decode_doc,
    encode_doc,
    mongo_read,
    mongo_split_ranges,
    mongo_write,
)


# --------------------------------------------------------------------------
# fixture server: OP_MSG framing + a dict-backed command dispatcher
# --------------------------------------------------------------------------


class _Store:
    def __init__(self):
        self.colls: dict[str, list[dict]] = {}
        self.cursors: dict[int, list[dict]] = {}
        self.next_cursor = 1
        self.commands: list[str] = []  # audit trail


def _match(doc: dict, flt: dict) -> bool:
    for k, cond in flt.items():
        v = doc.get(k)
        if isinstance(cond, dict):
            for op, rhs in cond.items():
                if op == "$gte" and not (v is not None and v >= rhs):
                    return False
                elif op == "$gt" and not (v is not None and v > rhs):
                    return False
                elif op == "$lt" and not (v is not None and v < rhs):
                    return False
                elif op == "$lte" and not (v is not None and v <= rhs):
                    return False
                elif op not in ("$gte", "$gt", "$lt", "$lte"):
                    raise ValueError(f"fixture: unsupported op {op}")
        elif v != cond:
            return False
    return True


def _serve_find(store: _Store, cmd: dict) -> dict:
    docs = [d for d in store.colls.get(cmd["find"], [])
            if _match(d, cmd.get("filter", {}))]
    for field, direction in (cmd.get("sort") or {}).items():
        docs.sort(key=lambda d: d.get(field), reverse=direction < 0)
    if cmd.get("skip"):
        docs = docs[int(cmd["skip"]):]
    if cmd.get("limit"):
        docs = docs[: int(cmd["limit"])]
    proj = cmd.get("projection")
    if proj:
        docs = [{k: d.get(k) for k in proj if k in d} for d in docs]
    batch = int(cmd.get("batchSize", 101))
    first, rest = docs[:batch], docs[batch:]
    cursor_id = 0
    if rest:
        cursor_id = store.next_cursor
        store.next_cursor += 1
        store.cursors[cursor_id] = rest
    return {
        "cursor": {"firstBatch": first, "id": cursor_id,
                   "ns": f"db.{cmd['find']}"},
        "ok": 1.0,
    }


def _dispatch(store: _Store, cmd: dict) -> dict:
    name = next(iter(cmd))
    store.commands.append(name)
    if name == "count":
        return {"n": len(store.colls.get(cmd["count"], [])), "ok": 1.0}
    if name == "find":
        return _serve_find(store, cmd)
    if name == "getMore":
        left = store.cursors.pop(cmd["getMore"], [])
        batch = int(cmd.get("batchSize", 101))
        out, rest = left[:batch], left[batch:]
        cid = 0
        if rest:
            cid = cmd["getMore"]
            store.cursors[cid] = rest
        return {"cursor": {"nextBatch": out, "id": cid,
                           "ns": f"db.{cmd['collection']}"}, "ok": 1.0}
    if name == "insert":
        coll = store.colls.setdefault(cmd["insert"], [])
        errors = []
        for i, d in enumerate(cmd["documents"]):
            if d.get("_id") is not None and any(
                x.get("_id") == d["_id"] for x in coll
            ):
                errors.append({"index": i, "code": 11000,
                               "errmsg": "duplicate key"})
            else:
                coll.append(d)
        out = {"n": len(cmd["documents"]) - len(errors), "ok": 1.0}
        if errors:
            out["writeErrors"] = errors
        return out
    if name == "update":
        coll = store.colls.setdefault(cmd["update"], [])
        n = 0
        for u in cmd["updates"]:
            hit = [i for i, d in enumerate(coll) if _match(d, u["q"])]
            if hit:
                coll[hit[0]] = dict(u["u"])
                n += 1
            elif u.get("upsert"):
                coll.append(dict(u["u"]))
                n += 1
        return {"n": n, "ok": 1.0}
    if name == "delete":
        coll = store.colls.setdefault(cmd["delete"], [])
        n = 0
        for d in cmd["deletes"]:
            hit = [i for i, doc in enumerate(coll) if _match(doc, d["q"])]
            lim = int(d.get("limit", 0)) or len(hit)
            for i in sorted(hit[:lim], reverse=True):
                coll.pop(i)
                n += 1
        return {"n": n, "ok": 1.0}
    return {"ok": 0.0, "code": 59, "errmsg": f"no such command: {name}"}


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        while True:
            head = b""
            while len(head) < 4:
                c = self.request.recv(4 - len(head))
                if not c:
                    return
                head += c
            (length,) = struct.unpack("<i", head)
            body = b""
            while len(body) < length - 4:
                c = self.request.recv(length - 4 - len(body))
                if not c:
                    return
                body += c
            req_id, _resp, opcode = struct.unpack_from("<iii", body, 0)
            assert opcode == OP_MSG
            assert body[16] == 0  # section kind 0
            cmd, _ = decode_doc(body, 17)
            cmd.pop("$db", None)
            reply = _dispatch(self.server.store, cmd)
            payload = struct.pack("<i", 0) + b"\x00" + encode_doc(reply)
            hdr = struct.pack("<iiii", 16 + len(payload), 0, req_id, OP_MSG)
            self.request.sendall(hdr + payload)


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


@pytest.fixture()
def mongod():
    srv = _Server(("127.0.0.1", 0), _Handler)
    srv.store = _Store()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _seed(store: _Store, n: int = 57):
    store.colls["events"] = [
        {"_id": i, "name": f"user-{i % 7}", "qty": i * 3,
         "ratio": i / 4.0, "flag": i % 2 == 0,
         "tags": [f"t{i % 3}", f"t{i % 5}"]}
        for i in range(n)
    ]


# --------------------------------------------------------------------------
# BSON codec round-trip
# --------------------------------------------------------------------------


def test_bson_roundtrip_all_types():
    doc = {
        "s": "héllo",
        "i32": 42,
        "i64": 2**40,
        "neg": -(2**35),
        "f": 3.25,
        "b_t": True,
        "b_f": False,
        "z": None,
        "bin": b"\x00\x01\xffbytes",
        "sub": {"k": "v", "n": 7},
        "arr": [1, "two", 3.0, None, {"deep": True}],
    }
    out, off = decode_doc(encode_doc(doc))
    assert out == doc
    assert off == len(encode_doc(doc))


def test_bson_int_width_boundaries():
    enc = encode_doc({"a": 2**31 - 1, "b": 2**31, "c": -(2**31), "d": -(2**31) - 1})
    dec, _ = decode_doc(enc)
    assert dec == {"a": 2**31 - 1, "b": 2**31, "c": -(2**31), "d": -(2**31) - 1}
    # width markers: a,c fit int32 (0x10), b,d need int64 (0x12)
    assert enc.count(b"\x10") >= 2 and enc.count(b"\x12") >= 2


# --------------------------------------------------------------------------
# wire client against the fixture
# --------------------------------------------------------------------------


def test_command_error_raises(mongod):
    host, port = mongod.server_address
    with MongoWire(host, port) as w:
        with pytest.raises(MongoWireError, match="no such command"):
            w.command("db", {"frobnicate": 1})


def test_find_paginates_with_getmore(mongod):
    _seed(mongod.store, 25)
    host, port = mongod.server_address
    with MongoWire(host, port) as w:
        got = list(w.find_all("db", "events", batch_size=7))
    assert [d["_id"] for d in got] == list(range(25))
    # 25 docs at batchSize 7 = 1 find + 3 getMore
    assert mongod.store.commands.count("getMore") == 3


def test_split_ranges_cover_disjointly(mongod):
    _seed(mongod.store, 57)
    host, port = mongod.server_address
    ranges = mongo_split_ranges(host, port, "db", "events", 4)
    assert len(ranges) >= 2
    assert ranges[0][0] is None and ranges[-1][1] is None
    # interior bounds strictly increase; each doc falls in exactly one slice
    interior = [r[0] for r in ranges[1:]]
    assert interior == sorted(interior)
    hits = [
        sum(
            (lo is None or i >= lo) and (hi is None or i < hi)
            for lo, hi in ranges
        )
        for i in range(57)
    ]
    assert set(hits) == {1}


def test_mongo_read_parallel_slices(spark, mongod):
    _seed(mongod.store, 57)
    host, port = mongod.server_address
    df = mongo_read(
        spark, host, port, "db", "events",
        schema="_id long, name string, qty long, ratio double, flag boolean",
        num_slices=4,
    )
    rows = {r["_id"]: r for r in df.collect()}
    assert len(rows) == 57
    assert rows[10]["name"] == "user-3"
    assert rows[10]["qty"] == 30
    assert rows[10]["ratio"] == 2.5
    assert rows[10]["flag"] is True


def test_mongo_read_filter_pushdown(spark, mongod):
    _seed(mongod.store, 30)
    host, port = mongod.server_address
    df = mongo_read(
        spark, host, port, "db", "events",
        schema="_id long, qty long", num_slices=2,
        filter={"flag": True},
    )
    ids = sorted(r["_id"] for r in df.collect())
    assert ids == [i for i in range(30) if i % 2 == 0]


def test_mongo_write_insert_and_errors(spark, mongod):
    host, port = mongod.server_address
    mongod.store.colls["out"] = [{"_id": 3, "name": "pre"}]
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(10)],
        "_id long, name string, score double",
    ).repartition(3)
    res = mongo_write(df, host, port, "db", "out", write_mode="insert")
    # _id=3 collides with the pre-seeded doc -> one writeError, dirty not fatal
    assert res == {"written": 9, "errors": 1}
    assert len(mongod.store.colls["out"]) == 10
    assert {d["name"] for d in mongod.store.colls["out"] if d["_id"] == 3} == {"pre"}


def test_mongo_write_replace_upserts_idempotently(spark, mongod):
    host, port = mongod.server_address
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    )
    res = mongo_write(df, host, port, "db", "kv",
                      write_mode="replace", unique_key="k")
    assert res == {"written": 2, "errors": 0}
    df2 = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    mongo_write(df2, host, port, "db", "kv",
                write_mode="replace", unique_key="k")
    final = {d["k"]: d["v"] for d in mongod.store.colls["kv"]}
    assert final == {1: "a", 2: "B", 3: "c"}


def test_mongo_write_replace_requires_key(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="unique_key"):
        mongo_write(df, "h", 1, "db", "c", write_mode="replace")


def test_run_job_mongo_roundtrip(spark, mongod):
    """Full DataX job.json: mongodbreader (live wire read, query filter,
    typed column list) -> dx transform -> mongodbwriter replace-upsert.
    The job-compiler wiring (plans/job.py) maps the reference's own
    parameter names (address/dbName/collectionName/column, writeMode
    isReplace/replaceKey)."""
    from datax_spark.plans.job import run_job

    _seed(mongod.store, 20)
    host, port = mongod.server_address
    addr = [f"{host}:{port}"]
    job = {
        "job": {
            "setting": {"speed": {"channel": 2}},
            "content": [{
                "reader": {
                    "name": "mongodbreader",
                    "parameter": {
                        "address": addr,
                        "dbName": "db",
                        "collectionName": "events",
                        "column": [
                            {"name": "_id", "type": "long"},
                            {"name": "name", "type": "string"},
                            {"name": "qty", "type": "long"},
                        ],
                        "query": '{"flag": true}',
                    },
                },
                "writer": {
                    "name": "mongodbwriter",
                    "parameter": {
                        "address": addr,
                        "dbName": "db",
                        "collectionName": "sink",
                        "writeMode": {"isReplace": "true",
                                      "replaceKey": "_id"},
                    },
                },
            }],
        }
    }
    res = run_job(spark, job)
    assert res["errors"] == 0
    got = {d["_id"]: d for d in mongod.store.colls["sink"]}
    assert sorted(got) == [i for i in range(20) if i % 2 == 0]
    assert got[4]["qty"] == 12 and got[4]["name"] == "user-4"
    # idempotence: re-running the replace job converges to the same state
    run_job(spark, job)
    assert sorted(d["_id"] for d in mongod.store.colls["sink"]) == sorted(got)


def test_mongodbwriter_replace_requires_key(spark):
    from datax_spark.plans.job import compile_writer

    with pytest.raises(ValueError, match="replaceKey"):
        compile_writer(
            spark.range(1),
            {"name": "mongodbwriter",
             "parameter": {"address": ["h:1"], "dbName": "d",
                           "collectionName": "c",
                           "writeMode": {"isReplace": "true"}}},
        )


def test_mongo_apply_cdc_ops_and_idempotence(spark, mongod):
    from datax_spark.sources.mongo_live import mongo_apply_cdc

    host, port = mongod.server_address
    # the sink contract takes a key-DEDUPED batch (one image per key —
    # duplicate keys would race across partitions); r2:p1 pre-exists so
    # the delete arm actually deletes
    mongod.store.colls["state"] = [{"_id": "r2:p1", "content": "old"}]
    batch = spark.createDataFrame(
        [("r1", "p1", "v1b", "update"),
         ("r1", "p2", "v2", "insert"),
         ("r2", "p1", "x", "delete")],
        "repo string, path string, content string, op string",
    )
    res = mongo_apply_cdc(batch, host, port, "db", "state",
                          key_cols=["repo", "path"])
    assert res == {"upserted": 2, "deleted": 1}
    state = {d["_id"]: d["content"] for d in mongod.store.colls["state"]}
    assert state == {"r1:p1": "v1b", "r1:p2": "v2"}
    # replay converges (upsert + delete-of-missing are idempotent)
    mongo_apply_cdc(batch, host, port, "db", "state",
                    key_cols=["repo", "path"])
    state2 = {d["_id"]: d["content"] for d in mongod.store.colls["state"]}
    assert state2 == state


def test_tail_to_mongo_stream_materializes_collection(spark, mongod, tmp_path):
    """Structured-Streaming CDC tail keeps an operational mongo
    collection in sync: latest-wins per batch, deletes drop docs, and a
    fresh-checkpoint replay converges — idempotence by _id, no fence."""
    from datax_spark.operators.dedup import dedup_latest
    from datax_spark.quality.quarantine import split_dirty
    from datax_spark.sources.changelog import generate_changelog, write_segments
    from datax_spark.sources.mongo_live import tail_to_mongo

    host, port = mongod.server_address
    logdir = str(tmp_path / "log")
    log = generate_changelog(
        spark, n_events=2000, n_keys=250, events_per_segment=500
    )
    write_segments(log, logdir)
    full_schema = spark.read.parquet(logdir + "/seg=0").schema
    keys = ["repo", "path", "commit"]
    tail_to_mongo(
        spark, logdir, str(tmp_path / "ckpt"), full_schema,
        host, port, "db", "state", keys, timeout_sec=120,
    )
    clean, _ = split_dirty(spark.read.parquet(logdir + "/seg=*"))
    final = dedup_latest(clean, keys).filter("op != 'delete'")
    want = {
        ":".join(str(r[k]) for k in keys): r["content"]
        for r in final.collect()
    }
    got = {d["_id"]: d.get("content") for d in mongod.store.colls["state"]}
    assert got == want
    tail_to_mongo(
        spark, logdir, str(tmp_path / "ckpt2"), full_schema,
        host, port, "db", "state", keys, timeout_sec=120,
    )
    got2 = {d["_id"]: d.get("content") for d in mongod.store.colls["state"]}
    assert got2 == want
