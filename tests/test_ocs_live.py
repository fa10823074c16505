"""Live OCS/memcached writer (sources/ocs_live.py) against an
in-process socket server speaking the real binary protocol."""

from __future__ import annotations

import socketserver
import struct
import threading

import pytest

from datax_spark.sources.ocs_live import (
    MAGIC_REQ,
    MAGIC_RES,
    OPS,
    ST_EXISTS,
    ST_NOT_FOUND,
    ST_OK,
    McBinary,
    ocs_write,
)

_OP_BY_CODE = {v: k for k, v in OPS.items()}


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        store: dict[str, bytes] = self.server.kv
        while True:
            hdr = self._recv(24)
            if hdr is None:
                return
            magic, opcode, klen, xlen, _dt, _vb, blen, opaque, _cas = (
                struct.unpack(">BBHBBHIIQ", hdr)
            )
            assert magic == MAGIC_REQ
            body = self._recv(blen) if blen else b""
            key = body[xlen : xlen + klen].decode()
            value = body[xlen + klen :]
            op = _OP_BY_CODE[opcode]
            status, rbody = ST_OK, b""
            if op == "set":
                store[key] = value
            elif op == "add":
                if key in store:
                    status = ST_EXISTS
                else:
                    store[key] = value
            elif op == "replace":
                if key not in store:
                    status = ST_NOT_FOUND
                else:
                    store[key] = value
            elif op == "append":
                if key not in store:
                    status = ST_NOT_FOUND
                else:
                    store[key] += value
            elif op == "prepend":
                if key not in store:
                    status = ST_NOT_FOUND
                else:
                    store[key] = value + store[key]
            elif op == "get":
                if key in store:
                    rbody = struct.pack(">I", 0) + store[key]  # 4B flags extras
                    xl = 4
                else:
                    status = ST_NOT_FOUND
            elif op == "delete":
                if store.pop(key, None) is None:
                    status = ST_NOT_FOUND
            xl = 4 if (op == "get" and status == ST_OK) else 0
            self.request.sendall(
                struct.pack(">BBHBBHIIQ", MAGIC_RES, opcode, 0, xl, 0,
                            status, len(rbody), opaque, 0) + rbody
            )

    def _recv(self, n):
        data = b""
        while len(data) < n:
            c = self.request.recv(n - len(data))
            if not c:
                return None
            data += c
        return data


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


@pytest.fixture()
def memcached():
    srv = _Server(("127.0.0.1", 0), _Handler)
    srv.kv = {}
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()
    srv.server_close()


def test_client_primitives(memcached):
    host, port = memcached.server_address
    with McBinary(host, port) as mc:
        assert mc.store("set", "k1", b"v1") == ST_OK
        assert mc.get("k1") == b"v1"
        assert mc.store("add", "k1", b"other") == ST_EXISTS
        assert mc.get("k1") == b"v1"
        assert mc.store("replace", "missing", b"x") == ST_NOT_FOUND
        assert mc.store("append", "k1", b"+tail") == ST_OK
        assert mc.get("k1") == b"v1+tail"
        assert mc.delete("k1") is True
        assert mc.get("k1") is None


def test_ocs_write_set_composite_key(spark, memcached):
    host, port = memcached.server_address
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, score double"
    )
    res = ocs_write(df, host, port, write_mode="set",
                    indexes=[0, 1], field_delimiter="")
    assert res == {"written": 2, "errors": 0}
    assert memcached.kv["1a"] == "1a1.5".encode()


def test_ocs_write_add_counts_existing_as_dirty(spark, memcached):
    host, port = memcached.server_address
    memcached.kv["2"] = b"pre"
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    res = ocs_write(df, host, port, write_mode="add",
                    field_delimiter=",")
    assert res == {"written": 1, "errors": 1}
    assert memcached.kv["2"] == b"pre"  # add never clobbers (idempotent rerun)
    assert memcached.kv["1"] == b"1,x"


def test_ocs_write_validates_config(spark):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError, match="writeMode"):
        ocs_write(df, "h", 1, write_mode="upsert")
    with pytest.raises(ValueError, match="out of range"):
        ocs_write(df, "h", 1, indexes=[3])


def test_run_job_ocswriter(spark, memcached):
    """job.json ocswriter path: the reference's own parameter names
    (proxy/port/writeMode/indexes/fieldDelimiter/expireTime)."""
    from datax_spark.plans.job import compile_writer

    host, port = memcached.server_address
    df = spark.createDataFrame([(7, "z")], "id long, v string")
    res = compile_writer(df, {"name": "ocswriter", "parameter": {
        "proxy": host, "port": port, "writeMode": "set",
        "indexes": "0", "fieldDelimiter": "|"}})
    assert res == {"written": 1, "errors": 0}
    assert memcached.kv["7"] == b"7|z"
