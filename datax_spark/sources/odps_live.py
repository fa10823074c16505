"""Live ODPS (MaxCompute) reader/writer over the public Tunnel protocol.

Upgrades odpsreader/odpswriter from the in-engine partition-expansion
analogs to an executable path speaking the public ODPS REST + Tunnel
surface the reference's SDK (`com.aliyun.odps`) wraps:

- session lifecycle: ``POST ...?downloads`` / ``?uploads`` returning a
  JSON session (DownloadID + RecordCount + Schema — the record count
  the reference's split relies on, OdpsReader.java:329-334);
- data plane: ``GET ...?data&downloadid=&rowrange=(start,count)``
  streaming protobuf-framed records, ``PUT ...?uploadid=&blockid=N``
  uploading protobuf blocks, ``POST ...?uploadid=`` committing the
  block list (OdpsUtil.masterCompleteBlocks:371-382);
- record framing: the tunnel's protobuf shape — column i as protobuf
  field i+1 (zigzag varint for BIGINT/DATETIME/BOOLEAN, fixed64 for
  DOUBLE, length-delimited for STRING), per-record CRC32C written under
  the END_RECORD meta field, then a global record-count and stream
  checksum under the META_COUNT / META_CHECKSUM fields (the
  ProtobufRecordStreamWriter layout); CRC32C is implemented in pure
  Python (Castagnoli table);
- auth: ``Authorization: ODPS id:hmac-sha1(...)`` canonical-string
  signing, VERIFIED by the test fixture with the shared secret.

Reference semantics reproduced:

- reader (odpsreader/.../OdpsReader.java:318-371 + ReaderProxy.java:39-74):
  one download session per (table, partition); record-count ranges split
  evenly over tasks (splitMode=record); each task reads exactly its
  ``(start, count)`` rowrange — re-expressed as one Spark slice per
  range inside ``mapInPandas``.
- writer (odpswriter/.../OdpsWriter.java:140-175,299-334 +
  OdpsWriterProxy.java:39-101): ``dealTruncate`` up front (truncate
  table / drop+add partition via a SQLTask-analog instances POST), ONE
  shared upload session, per-task disjoint blockId ranges (task start +
  stride — here partitionId * stride + k), buffered blocks of
  ``blockSizeInMB``, and a single driver-side commit of every uploaded
  block. Re-PUT of the same blockId overwrites (the tunnel contract the
  reference's failover leans on), so Spark task retries stay idempotent.

Caveat, stated plainly: with no real MaxCompute reachable from this
sandbox the bytes are proven against the fixture; the framing constants
follow the public sdk's layout but byte parity vs Alibaba Cloud is
explicitly not claimed (same epistemic status as the OTS/OSS proofs).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import io
import json
import struct
import urllib.error
import urllib.parse
import urllib.request
from email.utils import formatdate
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession


class OdpsError(RuntimeError):
    def __init__(self, code: str, message: str = ""):
        super().__init__(f"{code}: {message}")
        self.code = code
        self.message = message


# --------------------------------------------------------------------------
# CRC32C (Castagnoli) — pure python, table-driven
# --------------------------------------------------------------------------

_CRC32C_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


# --------------------------------------------------------------------------
# tunnel record framing (ProtobufRecordStreamWriter layout)
# --------------------------------------------------------------------------

# meta field numbers of the public tunnel stream (ProtoWireConstant)
TUNNEL_END_RECORD = 33553408
TUNNEL_META_COUNT = 33554430
TUNNEL_META_CHECKSUM = 33553920


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def encode_records(rows: list[tuple], types: list[str]) -> bytes:
    """Rows -> one tunnel-framed block: per-record column fields +
    END_RECORD crc, closed by META_COUNT and the global META_CHECKSUM."""
    buf = bytearray()
    global_crc = 0
    for row in rows:
        rec_crc = 0
        for i, (v, t) in enumerate(zip(row, types)):
            if v is None or (isinstance(v, float) and v != v):
                continue  # null column: field absent (tunnel contract)
            field = i + 1
            rec_crc = crc32c(struct.pack("<I", field), rec_crc)
            if t in ("bigint", "datetime"):
                iv = int(v)
                buf += _varint(field << 3 | 0) + _varint(
                    _zigzag(iv) & 0xFFFFFFFFFFFFFFFF)
                rec_crc = crc32c(struct.pack("<q", iv), rec_crc)
            elif t == "boolean":
                bv = 1 if v else 0
                buf += _varint(field << 3 | 0) + _varint(bv)
                rec_crc = crc32c(bytes([bv]), rec_crc)
            elif t == "double":
                fv = float(v)
                buf += _varint(field << 3 | 1) + struct.pack("<d", fv)
                rec_crc = crc32c(struct.pack("<d", fv), rec_crc)
            else:  # string / decimal-as-string
                sv = str(v).encode()
                buf += _varint(field << 3 | 2) + _varint(len(sv)) + sv
                rec_crc = crc32c(sv, rec_crc)
        buf += _varint(TUNNEL_END_RECORD << 3 | 0) + _varint(rec_crc)
        global_crc = crc32c(struct.pack("<I", rec_crc), global_crc)
    buf += _varint(TUNNEL_META_COUNT << 3 | 0) + _varint(
        _zigzag(len(rows)) & 0xFFFFFFFFFFFFFFFF)
    buf += _varint(TUNNEL_META_CHECKSUM << 3 | 0) + _varint(global_crc)
    return bytes(buf)


def decode_records(data: bytes, types: list[str]) -> list[tuple]:
    """Inverse of encode_records; VERIFIES every per-record crc, the
    record count and the global checksum (a corrupted block raises)."""
    i, n = 0, len(data)
    ncols = len(types)

    def rd_varint():
        nonlocal i
        v = shift = 0
        while True:
            b = data[i]
            i += 1
            v |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                return v

    rows: list[tuple] = []
    cur: list = [None] * ncols
    rec_crc = 0
    global_crc = 0
    count = None
    stream_crc = None
    while i < n:
        key = rd_varint()
        field, wire = key >> 3, key & 7
        if field == TUNNEL_END_RECORD:
            got = rd_varint()
            if got != rec_crc:
                raise OdpsError("ChecksumError",
                                f"record crc {got} != {rec_crc}")
            global_crc = crc32c(struct.pack("<I", rec_crc), global_crc)
            rows.append(tuple(cur))
            cur = [None] * ncols
            rec_crc = 0
            continue
        if field == TUNNEL_META_COUNT:
            count = _unzigzag(rd_varint())
            continue
        if field == TUNNEL_META_CHECKSUM:
            stream_crc = rd_varint()
            continue
        idx = field - 1
        t = types[idx]
        rec_crc = crc32c(struct.pack("<I", field), rec_crc)
        if wire == 0 and t in ("bigint", "datetime"):
            v = _unzigzag(rd_varint() & 0xFFFFFFFFFFFFFFFF)
            # zigzag already round-trips sign; mask keeps 64-bit width
            cur[idx] = v
            rec_crc = crc32c(struct.pack("<q", v), rec_crc)
        elif wire == 0:  # boolean
            bv = rd_varint()
            cur[idx] = bool(bv)
            rec_crc = crc32c(bytes([bv & 1]), rec_crc)
        elif wire == 1:
            (fv,) = struct.unpack_from("<d", data, i)
            i += 8
            cur[idx] = fv
            rec_crc = crc32c(struct.pack("<d", fv), rec_crc)
        elif wire == 2:
            ln = rd_varint()
            sv = data[i : i + ln]
            i += ln
            cur[idx] = sv.decode()
            rec_crc = crc32c(sv, rec_crc)
        else:
            raise OdpsError("MalformedData", f"wire {wire}")
    if count is not None and count != len(rows):
        raise OdpsError("ChecksumError",
                        f"record count {count} != {len(rows)}")
    if stream_crc is not None and stream_crc != global_crc:
        raise OdpsError("ChecksumError", "stream checksum mismatch")
    return rows


# --------------------------------------------------------------------------
# signed REST client
# --------------------------------------------------------------------------


def sign_odps(access_key: str, verb: str, date: str, resource: str) -> str:
    msg = f"{verb}\n\n\n{date}\n{resource}"
    mac = hmac.new(access_key.encode(), msg.encode(), hashlib.sha1)
    return base64.b64encode(mac.digest()).decode()


class OdpsTunnel:
    def __init__(self, endpoint: str, project: str, access_id: str,
                 access_key: str, timeout: float = 60.0):
        self.endpoint = endpoint.rstrip("/")
        self.project = project
        self.access_id = access_id
        self.access_key = access_key
        self.timeout = timeout

    def _request(self, verb: str, path: str, params: dict | None = None,
                 data: bytes | None = None):
        params = dict(params or {})
        q = urllib.parse.urlencode(
            {k: ("" if v is None else v) for k, v in params.items()})
        date = formatdate(usegmt=True)
        resource = path + (("?" + "&".join(sorted(
            k if v in (None, "") else f"{k}={v}"
            for k, v in params.items()))) if params else "")
        sig = sign_odps(self.access_key, verb, date, resource)
        url = self.endpoint + path + (("?" + q) if q else "")
        hdrs = {"Date": date,
                "Authorization": f"ODPS {self.access_id}:{sig}"}
        req = urllib.request.Request(url, data=data, headers=hdrs,
                                     method=verb)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                return r.read()
        except urllib.error.HTTPError as e:
            raw = e.read()
            try:
                err = json.loads(raw)
                raise OdpsError(err.get("Code", f"HTTP{e.code}"),
                                err.get("Message", "")) from None
            except (ValueError, KeyError):
                raise OdpsError(f"HTTP{e.code}", raw.decode(
                    "utf-8", "replace")) from None

    def _table_path(self, table: str) -> str:
        return f"/projects/{self.project}/tables/{table}"

    def create_download(self, table: str,
                        partition: str | None = None) -> dict:
        """-> {"id", "count", "schema": [(name, type)]}."""
        params: dict[str, Any] = {"downloads": None}
        if partition:
            params["partition"] = partition
        raw = self._request("POST", self._table_path(table), params)
        d = json.loads(raw)
        return {"id": d["DownloadID"], "count": int(d["RecordCount"]),
                "schema": [(c["name"], c["type"])
                           for c in d["Schema"]["columns"]]}

    def read_rows(self, table: str, download_id: str, start: int,
                  count: int, types: list[str],
                  partition: str | None = None) -> list[tuple]:
        params: dict[str, Any] = {
            "data": None, "downloadid": download_id,
            "rowrange": f"({start},{count})",
        }
        if partition:
            params["partition"] = partition
        raw = self._request("GET", self._table_path(table), params)
        return decode_records(raw, types)

    def create_upload(self, table: str,
                      partition: str | None = None) -> dict:
        params: dict[str, Any] = {"uploads": None}
        if partition:
            params["partition"] = partition
        raw = self._request("POST", self._table_path(table), params)
        d = json.loads(raw)
        return {"id": d["UploadID"],
                "schema": [(c["name"], c["type"])
                           for c in d["Schema"]["columns"]]}

    def write_block(self, table: str, upload_id: str, block_id: int,
                    rows: list[tuple], types: list[str],
                    partition: str | None = None) -> None:
        params: dict[str, Any] = {"uploadid": upload_id,
                                  "blockid": block_id}
        if partition:
            params["partition"] = partition
        self._request("PUT", self._table_path(table), params,
                      data=encode_records(rows, types))

    def commit_upload(self, table: str, upload_id: str,
                      blocks: list[int],
                      partition: str | None = None) -> None:
        params: dict[str, Any] = {"uploadid": upload_id}
        if partition:
            params["partition"] = partition
        self._request("POST", self._table_path(table), params,
                      data=json.dumps({"blocks": sorted(blocks)}).encode())

    def run_sql(self, sql: str) -> None:
        """SQLTask analog (adswriter/odpswriter's dealTruncate path)."""
        self._request("POST", f"/projects/{self.project}/instances",
                      data=sql.encode())


_SPARK_TYPES = {"bigint": "long", "datetime": "long", "double": "double",
                "boolean": "boolean", "string": "string",
                "decimal": "string"}


def odps_read(
    spark: SparkSession,
    endpoint: str,
    project: str,
    access_id: str,
    access_key: str,
    table: str,
    columns: list[str] | None = None,
    partition: str | None = None,
    num_slices: int = 4,
) -> DataFrame:
    """Executor-parallel tunnel download: ONE session, the known
    RecordCount split into even (start,count) rowranges (splitMode=
    record), one Spark slice per range — rows never pass through the
    driver. ``columns`` projects (and reorders) the table schema."""
    client = OdpsTunnel(endpoint, project, access_id, access_key)
    sess = client.create_download(table, partition)
    schema = sess["schema"]
    by_name = {n: t for n, t in schema}
    names = columns or [n for n, _ in schema]
    missing = [c for c in names if c not in by_name]
    if missing:
        raise OdpsError("NoSuchColumn", ",".join(missing))
    types = [by_name[c] for c in names]
    positions = [[n for n, _ in schema].index(c) for c in names]
    total = sess["count"]
    n = max(1, min(num_slices, total)) if total else 1
    base, rem = divmod(total, n)
    ranges = []
    start = 0
    for i in range(n):
        cnt = base + (1 if i < rem else 0)
        ranges.append((start, cnt))
        start += cnt
    ddl = ", ".join(f"{c} {_SPARK_TYPES.get(t, 'string')}"
                    for c, t in zip(names, types))
    slices = spark.createDataFrame(
        [(i,) for i in range(len(ranges))], "slice_id int"
    ).repartition(len(ranges))
    all_types = [t for _, t in schema]

    def _batches(it):
        import pandas as pd

        cl = OdpsTunnel(endpoint, project, access_id, access_key)
        for pdf in it:
            out: dict[str, list] = {c: [] for c in names}
            for sid in pdf["slice_id"]:
                s, c = ranges[int(sid)]
                if not c:
                    continue
                for row in cl.read_rows(table, sess["id"], s, c,
                                        all_types, partition):
                    for cname, pos in zip(names, positions):
                        out[cname].append(row[pos])
            yield pd.DataFrame(out, columns=names)

    return slices.mapInPandas(_batches, ddl)


# blockId stride per task: disjoint ranges without coordination
# (OdpsWriter.java:158-161's start + INTERVAL_STEP scheme)
_BLOCK_STRIDE = 100_000


def odps_write(
    df: DataFrame,
    endpoint: str,
    project: str,
    access_id: str,
    access_key: str,
    table: str,
    partition: str | None = None,
    truncate: bool = False,
    block_rows: int = 100_000,
) -> dict[str, int]:
    """Executor-parallel block upload + ONE driver commit: dealTruncate
    first (truncate table, or drop+add partition for partitioned
    targets — OdpsUtil.dealTruncate), a shared upload session, disjoint
    per-task blockId ranges, and commit of every uploaded block at the
    end (masterCompleteBlocks). Task retries re-PUT the same blockIds —
    idempotent by the tunnel's overwrite contract."""
    client = OdpsTunnel(endpoint, project, access_id, access_key)
    if truncate:
        if partition:
            client.run_sql(f"alter table {table} drop if exists "
                           f"partition ({partition});")
        else:
            client.run_sql(f"truncate table {table};")
    if partition:
        client.run_sql(f"alter table {table} add if not exists "
                       f"partition ({partition});")
    sess = client.create_upload(table, partition)
    schema = sess["schema"]
    names = [n for n, _ in schema]
    types = [t for _, t in schema]
    cols = df.columns
    missing = [c for c in names if c not in cols]
    if missing:
        raise OdpsError("NoSuchColumn",
                        f"DataFrame lacks table columns {missing}")

    def _partition(it):
        import pandas as pd
        from pyspark import TaskContext

        cl = OdpsTunnel(endpoint, project, access_id, access_key)
        task = TaskContext.get().partitionId()
        next_block = task * _BLOCK_STRIDE
        blocks: list[int] = []
        pending: list[tuple] = []
        written = 0

        def _clean(v):
            if v is None or (isinstance(v, float) and v != v):
                return None
            return v.item() if hasattr(v, "item") else v

        def flush():
            nonlocal next_block, written
            if not pending:
                return
            cl.write_block(table, sess["id"], next_block, pending, types,
                           partition)
            blocks.append(next_block)
            next_block += 1
            written += len(pending)
            pending.clear()

        for pdf in it:
            for rec in pdf.to_dict("records"):
                pending.append(tuple(_clean(rec[c]) for c in names))
                if len(pending) >= block_rows:
                    flush()
        flush()
        yield pd.DataFrame({"block": blocks,
                            "rows": [written] + [0] * (len(blocks) - 1)}
                           if blocks else {"block": [], "rows": []})

    out = df.mapInPandas(_partition, "block long, rows long").collect()
    blocks = [int(r.block) for r in out]
    client.commit_upload(table, sess["id"], blocks, partition)
    return {"blocks": len(blocks), "rows": int(sum(r.rows for r in out))}
