"""Live HBase reader/writer over the REST gateway wire protocol.

Round 4 session 3 upgrades the hbase11x normal-mode reader/writer from
catalog/option builders (sources/connectors.py; the multi-version cell
explode already executes) to an executable path speaking HBase's
standard REST gateway protocol (the `hbase rest` server every distro
ships): JSON row envelopes with base64 row/column/value, multi-row
``PUT /table/fakerow`` batches, and the stateful scanner lifecycle
(``POST /table/scanner`` -> Location -> ``GET`` pages until 204 ->
``DELETE``). Everything is stdlib ``urllib``; the bytes are what a real
gateway accepts. Tests drive an in-process HTTP fixture implementing
the same endpoints (tests/test_hbase_live.py) — same epistemic status
as the Derby/ES/FTP/Mongo/Cassandra/OCS proofs.

Record mapping is the reference's exactly:

- writer (hbase11xwriter/.../NormalTask.java:30-110): rowkey = concat
  of ``rowkeyColumn`` parts (``index: -1`` means a constant ``value``),
  each cell from ``column`` [{index, name "cf:q", type}] encoded with
  the Bytes.toBytes layout (long/int/short big-endian, double/float
  IEEE BE, boolean 1 byte 0/0xFF, string utf8); optional
  ``versionColumn`` stamps cell timestamps; ``nullMode`` skip|empty
  (HbaseAbstractTask.getColumnByte null arm).
- reader (hbase11xreader normal mode): ``column`` list with the same
  names/types (plus the ``rowkey`` pseudo-column), rowkey range
  [startRowkey, endRowkey), decoded with the same layout.

Scale shape: reads take a caller-supplied list of split rowkeys (the
region-boundary analog of the reference's one-task-per-region split) —
each slice runs its own scanner inside ``mapInPandas``; writes batch
multi-row PUTs per Arrow batch. The driver only plans slices.
"""

from __future__ import annotations

import base64
import json
import struct
import urllib.error
import urllib.request
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class HbaseRestError(RuntimeError):
    """Gateway-reported failure or protocol violation."""


# --------------------------------------------------------------------------
# Bytes.toBytes typed codec (HbaseAbstractTask.getColumnByte)
# --------------------------------------------------------------------------


def hbase_bytes(ctype: str, v: Any) -> bytes | None:
    if v is None:
        return None
    t = ctype.lower()
    if t == "long":
        return struct.pack(">q", int(v))
    if t == "int":
        return struct.pack(">i", int(v))
    if t == "short":
        return struct.pack(">h", int(v))
    if t == "double":
        return struct.pack(">d", float(v))
    if t == "float":
        return struct.pack(">f", float(v))
    if t == "boolean":
        return b"\xff" if v else b"\x00"  # Bytes.toBytes(boolean)
    if t == "string":
        return str(v).encode()
    if t in ("bytes", "binary"):
        return bytes(v)
    raise HbaseRestError(f"unsupported hbase column type {ctype!r}")


def hbase_decode(ctype: str, b: bytes | None) -> Any:
    if b is None:
        return None
    t = ctype.lower()
    if t == "long":
        return struct.unpack(">q", b)[0]
    if t == "int":
        return struct.unpack(">i", b)[0]
    if t == "short":
        return struct.unpack(">h", b)[0]
    if t == "double":
        return struct.unpack(">d", b)[0]
    if t == "float":
        return struct.unpack(">f", b)[0]
    if t == "boolean":
        return b != b"\x00"
    if t == "string":
        return b.decode()
    if t in ("bytes", "binary"):
        return bytes(b)
    raise HbaseRestError(f"unsupported hbase column type {ctype!r}")


def _b64(b: bytes) -> str:
    return base64.b64encode(b).decode()


def _unb64(s: str) -> bytes:
    return base64.b64decode(s)


# --------------------------------------------------------------------------
# REST gateway client
# --------------------------------------------------------------------------


class HbaseRest:
    def __init__(self, endpoint: str, timeout: float = 60.0):
        self.endpoint = endpoint.rstrip("/")
        self.timeout = timeout

    def _req(self, method: str, path: str, body: dict | None = None,
             absolute: bool = False):
        url = path if absolute else self.endpoint + path
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            url, data=data, method=method,
            headers={"Accept": "application/json",
                     "Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                raw = resp.read()
                loc = resp.headers.get("Location")
                return resp.status, (json.loads(raw) if raw else None), loc
        except urllib.error.HTTPError as e:
            raise HbaseRestError(
                f"{method} {path}: {e.code} {e.read()[:200]!r}"
            ) from e
        except urllib.error.URLError as e:
            raise HbaseRestError(f"{method} {path}: {e}") from e

    def put_rows(
        self, table: str,
        rows: list[tuple[bytes, list[tuple[str, int | None, bytes]]]],
    ) -> None:
        """Multi-row batch PUT — the gateway's bulk write envelope
        (row in the URL is a placeholder; keys ride the body)."""
        payload = {"Row": [
            {
                "key": _b64(rk),
                "Cell": [
                    {"column": _b64(col.encode()), "$": _b64(val),
                     **({"timestamp": ts} if ts is not None else {})}
                    for col, ts, val in cells
                ],
            }
            for rk, cells in rows
        ]}
        status, _, _ = self._req("PUT", f"/{table}/fakerow", payload)
        if status not in (200, 201):
            raise HbaseRestError(f"put_rows {table}: HTTP {status}")

    def scan(
        self, table: str,
        start_row: bytes | None = None,
        end_row: bytes | None = None,
        batch: int = 1000,
    ):
        """Stateful scanner: create -> page GETs until 204 -> delete.
        Yields (row_key_bytes, {column: value_bytes})."""
        spec: dict[str, Any] = {"batch": batch}
        if start_row:
            spec["startRow"] = _b64(start_row)
        if end_row:
            spec["endRow"] = _b64(end_row)
        status, _, loc = self._req("POST", f"/{table}/scanner", spec)
        if status != 201 or not loc:
            raise HbaseRestError(f"scanner create {table}: HTTP {status}")
        try:
            while True:
                status, body, _ = self._req("GET", loc, absolute=True)
                if status == 204 or not body:
                    return
                for row in body.get("Row", []):
                    rk = _unb64(row["key"])
                    cells = {
                        _unb64(c["column"]).decode(): _unb64(c["$"])
                        for c in row.get("Cell", [])
                    }
                    yield rk, cells
        finally:
            try:
                self._req("DELETE", loc, absolute=True)
            except HbaseRestError:
                pass


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------


def hbase_read(
    spark: SparkSession,
    endpoint: str,
    table: str,
    columns: list[dict[str, str]],
    start_rowkey: bytes | str | None = None,
    end_rowkey: bytes | str | None = None,
    split_rowkeys: list[bytes | str] | None = None,
    rowkey_type: str = "string",
    batch: int = 1000,
) -> DataFrame:
    """hbase11xreader normal mode over the gateway. ``columns`` is the
    reference's list [{name: "cf:q" | "rowkey", type}]; the optional
    ``split_rowkeys`` are interior slice boundaries (the region-split
    analog) — N boundaries give N+1 parallel scanner tasks."""
    def _as_bytes(x):
        if x is None:
            return None
        return x.encode() if isinstance(x, str) else bytes(x)

    bounds = [_as_bytes(start_rowkey)] + [
        _as_bytes(s) for s in (split_rowkeys or [])
    ] + [_as_bytes(end_rowkey)]
    slices = list(zip(bounds[:-1], bounds[1:]))
    ddl_types = {"long": "long", "int": "int", "short": "int",
                 "double": "double", "float": "float",
                 "boolean": "boolean", "string": "string",
                 "bytes": "binary", "binary": "binary"}
    names, out_ddl = [], []
    for c in columns:
        nm = c["name"]
        alias = "rowkey" if nm == "rowkey" else nm.replace(":", "_")
        names.append((nm, alias, c.get("type", "string")))
        out_ddl.append(f"{alias} {ddl_types[c.get('type', 'string').lower()]}")
    schema = ", ".join(out_ddl)

    sl = spark.createDataFrame(
        [(i,) for i in range(len(slices))], "slice_id int"
    ).repartition(len(slices))

    def _batches(it):
        import pandas as pd

        for pdf in it:
            data: dict[str, list] = {a: [] for _, a, _ in names}
            client = HbaseRest(endpoint)
            for sid in pdf["slice_id"]:
                lo, hi = slices[int(sid)]
                for rk, cells in client.scan(table, lo, hi, batch=batch):
                    for nm, alias, ctype in names:
                        raw = rk if nm == "rowkey" else cells.get(nm)
                        data[alias].append(hbase_decode(ctype, raw))
            yield pd.DataFrame(data, columns=[a for _, a, _ in names])

    return sl.mapInPandas(_batches, schema)


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------


def hbase_write(
    df: DataFrame,
    endpoint: str,
    table: str,
    rowkey_column: list[dict[str, Any]],
    column: list[dict[str, Any]],
    version_column: dict[str, Any] | None = None,
    null_mode: str = "skip",
    batch_size: int = 256,
) -> dict[str, int]:
    """hbase11xwriter NormalTask over the gateway. ``rowkey_column`` =
    [{index, type[, value]}] (index -1 = the constant ``value``),
    ``column`` = [{index, name "cf:q", type}], ``version_column`` =
    {index} or {index: -1, value: ms}; ``nullMode`` skip|empty
    (NormalTask.java:30-110)."""
    if null_mode not in ("skip", "empty"):
        raise ValueError(f"hbasewriter: bad nullMode {null_mode!r}")
    ncols = len(df.columns)
    for spec in list(rowkey_column) + list(column):
        i = int(spec.get("index", -1))
        if i >= ncols:
            raise ValueError(
                f"hbasewriter: column index {i} out of range "
                f"(record has {ncols} columns) — NormalTask ILLEGAL_VALUE"
            )

    def _batches(it):
        import pandas as pd

        written = 0
        client = HbaseRest(endpoint)
        for pdf in it:
            recs = list(pdf.itertuples(index=False))
            for off in range(0, len(recs), batch_size):
                rows = []
                for rec in recs[off : off + batch_size]:
                    parts = []
                    for rk in rowkey_column:
                        i = int(rk.get("index", -1))
                        if i == -1:
                            parts.append(str(rk["value"]).encode())
                        else:
                            parts.append(
                                hbase_bytes(rk.get("type", "string"), rec[i])
                                or b""
                            )
                    rowkey = b"".join(parts)
                    ts = None
                    if version_column is not None:
                        vi = int(version_column.get("index", -1))
                        ts = int(
                            version_column["value"] if vi == -1 else rec[vi]
                        )
                    cells = []
                    for c in column:
                        v = rec[int(c["index"])]
                        if v is not None and isinstance(v, float) and v != v:
                            v = None
                        raw = hbase_bytes(c.get("type", "string"), v)
                        if raw is None:
                            if null_mode == "skip":
                                continue
                            raw = b""
                        cells.append((c["name"], ts, raw))
                    rows.append((rowkey, cells))
                if rows:
                    client.put_rows(table, rows)
                    written += len(rows)
        yield pd.DataFrame({"written": [written]})

    out = df.mapInPandas(_batches, "written long").groupBy().sum()
    return {"written": int(out.collect()[0][0] or 0)}
