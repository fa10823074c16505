"""Live OCS (memcached) writer over the REAL binary wire protocol.

Round 4 session 3 upgrades ocswriter from an option-dict builder
(sources/connectors.py) to an executable implementation of the
reference's actual write path (ocswriter/.../OcsWriter.java): the
reference drives spymemcached with ``Protocol.BINARY``
(OcsWriter.java:117), so this speaks the memcached BINARY protocol
(24-byte header, opcodes set/add/replace/append/prepend/delete) over
stdlib sockets — the bytes are what a real memcached/OCS proxy accepts.

Record mapping is the reference's exactly (OcsWriter.java:82-180):

- key   = the columns at ``indexes`` (default ``[0]``) joined by
  ``fieldDelimiter``;
- value = ALL columns joined by ``fieldDelimiter`` (writeFormat=text);
- writeMode ``set`` (unconditional), ``add`` (fail if present —
  idempotent re-run safe), ``replace`` (fail if absent),
  ``append``/``prepend`` (NOT idempotent — the reference's own
  warning at OcsWriter.java:170);
- ``expireTime`` rides the set/add/replace extras.

Per-item protocol failures (EXISTS for add, NOT_FOUND for replace)
count as dirty records against the error budget, not job failures —
the reference's record-level collector semantics. Tests drive the
client against an in-process binary-protocol server
(tests/test_ocs_live.py), same epistemic status as the Derby/ES/FTP/
Mongo/Cassandra proofs.

Scale shape: writes run inside ``mapInPandas`` — each Arrow batch holds
one connection and pipelines its items; the driver sees O(partitions)
count rows.
"""

from __future__ import annotations

import socket
import struct
from typing import Any

from pyspark.sql import DataFrame

MAGIC_REQ, MAGIC_RES = 0x80, 0x81
OPS = {"get": 0x00, "set": 0x01, "add": 0x02, "replace": 0x03,
       "delete": 0x04, "append": 0x0E, "prepend": 0x0F}
# response status codes (protocol §3.2)
ST_OK, ST_NOT_FOUND, ST_EXISTS, ST_NOT_STORED = 0x0000, 0x0001, 0x0002, 0x0005


class OcsWireError(RuntimeError):
    """Transport-level failure or malformed frame."""


class McBinary:
    """Minimal memcached binary-protocol client (request/response)."""

    def __init__(self, host: str, port: int = 11211, timeout: float = 30.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self) -> "McBinary":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _recv_exact(self, n: int) -> bytes:
        out = []
        while n:
            c = self._sock.recv(n)
            if not c:
                raise OcsWireError("connection closed mid-frame")
            out.append(c)
            n -= len(c)
        return b"".join(out)

    def request(
        self, op: str, key: str, value: bytes = b"", extras: bytes = b""
    ) -> tuple[int, bytes]:
        """One binary frame out, one back. Returns (status, body)."""
        k = key.encode()
        body = extras + k + value
        hdr = struct.pack(
            ">BBHBBHIIQ",
            MAGIC_REQ, OPS[op], len(k), len(extras), 0, 0, len(body), 0, 0,
        )
        self._sock.sendall(hdr + body)
        rhdr = self._recv_exact(24)
        magic, _op, klen, xlen, _dt, status, blen, _opq, _cas = struct.unpack(
            ">BBHBBHIIQ", rhdr
        )
        if magic != MAGIC_RES:
            raise OcsWireError(f"bad response magic 0x{magic:02x}")
        rbody = self._recv_exact(blen) if blen else b""
        return status, rbody[xlen + klen :]

    def store(self, op: str, key: str, value: bytes, expire: int = 0) -> int:
        """set/add/replace carry 8-byte extras (flags + expiry);
        append/prepend carry none (protocol §4.2/4.6)."""
        if op in ("set", "add", "replace"):
            extras = struct.pack(">II", 0, expire)
        elif op in ("append", "prepend"):
            extras = b""
        else:
            raise ValueError(f"not a store op: {op}")
        status, _ = self.request(op, key, value, extras)
        return status

    def get(self, key: str) -> bytes | None:
        status, body = self.request("get", key)
        if status == ST_NOT_FOUND:
            return None
        if status != ST_OK:
            raise OcsWireError(f"get {key!r}: status 0x{status:04x}")
        return body

    def delete(self, key: str) -> bool:
        status, _ = self.request("delete", key)
        return status == ST_OK


def ocs_write(
    df: DataFrame,
    proxy: str,
    port: int = 11211,
    write_mode: str = "set",
    indexes: list[int] | None = None,
    field_delimiter: str = "",
    expire_time: int = 0,
) -> dict[str, int]:
    """Executor-parallel KV write, OcsWriter.java:125-180 semantics.
    Returns {"written": n, "errors": m} with per-item status failures
    (add-on-existing, replace-on-missing) as dirty counts."""
    if write_mode not in ("set", "add", "replace", "append", "prepend"):
        raise ValueError(f"ocswriter: bad writeMode {write_mode!r} "
                         "(ConfigurationChecker.WRITE_MODE)")
    idx = list(indexes) if indexes else [0]
    cols = df.columns
    for i in idx:
        if not 0 <= i < len(cols):
            raise ValueError(f"ocswriter: index {i} out of range for "
                             f"{len(cols)} columns")

    def _fmt(v: Any) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    def _batches(it):
        import pandas as pd

        written = errors = 0
        for pdf in it:
            with McBinary(proxy, port) as mc:
                for rec in pdf.itertuples(index=False):
                    vals = [_fmt(v) for v in rec]
                    key = field_delimiter.join(vals[i] for i in idx)
                    value = field_delimiter.join(vals).encode()
                    status = mc.store(write_mode, key, value, expire_time)
                    if status == ST_OK:
                        written += 1
                    else:
                        errors += 1
        yield pd.DataFrame({"written": [written], "errors": [errors]})

    out = df.mapInPandas(_batches, "written long, errors long").groupBy().sum()
    row = out.collect()[0]
    return {"written": int(row[0] or 0), "errors": int(row[1] or 0)}
