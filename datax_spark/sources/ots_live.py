"""Live Tablestore (OTS) reader/writer over the public protobuf wire API.

Upgrades the otsreader/otswriter pair from option/predicate builders
(sources/connectors.py `ots_read_options`) to an executable path
speaking the public OTS 2014-08-08 protocol the reference's SDK uses
(`com.aliyun.openservices.ots` — protobuf request/response bodies POSTed
to ``{endpoint}/{Action}`` with the HMAC-SHA1 ``x-ots-signature``
header scheme). Everything here is stdlib: a minimal hand-rolled
protobuf codec for exactly the messages the DataX plugins touch
(DescribeTable / GetRange / PutRow / UpdateRow / BatchWriteRow), plus
``urllib`` for transport. Tests drive an in-process HTTP fixture that
implements the same grammar AND verifies the request signature with the
shared secret, so the auth handshake is wire-real too — same epistemic
status as the Derby/ES/FTP/Mongo/Cassandra/OCS/HBase proofs (no real
Tablestore exists in the sandbox).

Reference semantics reproduced:

- reader (otsreader/.../OtsReaderMasterProxy.java:62-95,165-215 +
  OtsReaderSlaveProxy.java:93-160): DescribeTable -> pk schema; range
  begin/end with INF_MIN/INF_MAX sentinels; split = user-provided
  partition-key points (``range.split``) or the default probe-and-split
  (GetRange limit=1 forward + backward to find the REAL key bounds,
  then an even count-split over the partition-key dimension —
  RangeSplit.rangeSplitByCount); each slice pages GetRange with the
  ``next_start_primary_key`` token until exhausted; ``columns_to_get``
  pushes the projection to the server.
- writer (otswriter/.../OtsWriterSlaveProxy.java:85-135 +
  utils/Common.java:71-103): writeMode PutRow / UpdateRow / DeleteRow;
  PutRow SKIPS null attributes, UpdateRow DELETES the attribute on null
  (the reference's partial-update contract — the same semantics as this
  engine's `_patch` merge), DeleteRow carries the pk only; a null
  primary-key cell is a dirty record, never an exception; rows flush in
  BatchWriteRow batches (``batchWriteCount``) and per-row ``is_ok=false``
  statuses count as dirty (WriterCallback.onFailed -> collectDirtyRecord).

Scale shape: the driver only plans ranges (2 probe calls + arithmetic);
every slice runs its own paged scan inside ``mapInPandas``, writes
batch inside ``mapInPandas`` — no rows ever funnel through the driver.

Caveat, stated plainly: the protobuf field numbers below follow the
public ots2 protocol description; with no real Tablestore reachable
from this sandbox the end-to-end bytes are proven against the fixture,
not Alibaba Cloud.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import struct
import urllib.error
import urllib.request
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession

API_VERSION = "2014-08-08"


class OtsError(RuntimeError):
    def __init__(self, code: str, message: str = ""):
        super().__init__(f"{code}: {message}")
        self.code = code
        self.message = message


# --------------------------------------------------------------------------
# minimal protobuf codec (only what the five OTS actions need)
# --------------------------------------------------------------------------


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


def _vi(field: int, n: int) -> bytes:
    # wire type 0; int64 negatives go two's-complement like protobuf
    return _varint(field << 3 | 0) + _varint(n & 0xFFFFFFFFFFFFFFFF)


def _ld(field: int, payload: bytes) -> bytes:
    return _varint(field << 3 | 2) + _varint(len(payload)) + payload


def _f64(field: int, x: float) -> bytes:
    return _varint(field << 3 | 1) + struct.pack("<d", x)


def pb_fields(buf: bytes) -> Iterator[tuple[int, int, Any]]:
    """Walk a message: yields (field_no, wire_type, value) where value
    is an int for varint, bytes for length-delimited, 8 raw bytes for
    fixed64."""
    i, n = 0, len(buf)
    while i < n:
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            yield field, wire, v
        elif wire == 1:
            yield field, wire, buf[i : i + 8]
            i += 8
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            yield field, wire, buf[i : i + ln]
            i += ln
        else:
            raise OtsError("OTSProtocolError", f"wire type {wire}")


# --- ColumnValue {1 type, 2 v_int, 3 v_string, 4 v_bool, 5 v_double,
#                  6 v_binary}; ColumnType enum INF_MIN=0 INF_MAX=1
#     INTEGER=2 STRING=3 BOOLEAN=4 DOUBLE=5 BINARY=6


class _Inf:
    def __init__(self, name: str):
        self._name = name

    def __repr__(self):  # pragma: no cover - debug aid
        return self._name

    def __reduce__(self):
        # identity must survive cloudpickle to executors: `v is INF_MIN`
        # checks break if unpickling manufactures a fresh instance
        return (_inf_singleton, (self._name,))


def _inf_singleton(name: str) -> "_Inf":
    return INF_MIN if name == "INF_MIN" else INF_MAX


INF_MIN = _Inf("INF_MIN")
INF_MAX = _Inf("INF_MAX")


def encode_value(v: Any) -> bytes:
    if v is INF_MIN:
        return _vi(1, 0)
    if v is INF_MAX:
        return _vi(1, 1)
    if isinstance(v, bool):
        return _vi(1, 4) + _vi(4, 1 if v else 0)
    if isinstance(v, int):
        return _vi(1, 2) + _vi(2, v)
    if isinstance(v, float):
        return _vi(1, 5) + _f64(5, v)
    if isinstance(v, str):
        return _vi(1, 3) + _ld(3, v.encode())
    if isinstance(v, (bytes, bytearray)):
        return _vi(1, 6) + _ld(6, bytes(v))
    raise OtsError("OTSParameterInvalid", f"unsupported value type {type(v)!r}")


def decode_value(buf: bytes) -> Any:
    vtype = None
    raw: Any = None
    for f, w, val in pb_fields(buf):
        if f == 1:
            vtype = val
        elif f in (2, 3, 4, 5, 6):
            raw = val
    if vtype == 0:
        return INF_MIN
    if vtype == 1:
        return INF_MAX
    if vtype == 2:
        v = int(raw or 0)
        return v - (1 << 64) if v >= 1 << 63 else v
    if vtype == 3:
        return (raw or b"").decode()
    if vtype == 4:
        return bool(raw)
    if vtype == 5:
        return struct.unpack("<d", raw)[0]
    if vtype == 6:
        return bytes(raw or b"")
    raise OtsError("OTSProtocolError", f"column type {vtype}")


def _column(name: str, v: Any) -> bytes:
    # Column {1 name, 2 value}
    return _ld(1, name.encode()) + _ld(2, encode_value(v))


def _columns(field: int, pk: list[tuple[str, Any]]) -> bytes:
    return b"".join(_ld(field, _column(n, v)) for n, v in pk)


def decode_column(buf: bytes) -> tuple[str, Any]:
    name, value = "", None
    for f, w, val in pb_fields(buf):
        if f == 1:
            name = val.decode()
        elif f == 2:
            value = decode_value(val)
    return name, value


def decode_row(buf: bytes) -> tuple[list[tuple[str, Any]], list[tuple[str, Any]]]:
    # Row {1 repeated pk Column, 2 repeated attr Column}
    pk, attrs = [], []
    for f, w, val in pb_fields(buf):
        if f == 1:
            pk.append(decode_column(val))
        elif f == 2:
            attrs.append(decode_column(val))
    return pk, attrs


def encode_row(pk: list[tuple[str, Any]], attrs: list[tuple[str, Any]]) -> bytes:
    return _columns(1, pk) + _columns(2, attrs)


_IGNORE_CONDITION = _vi(1, 0)  # Condition {1 row_existence}: IGNORE


# --------------------------------------------------------------------------
# signed HTTP client
# --------------------------------------------------------------------------


def sign_request(access_key: str, action: str, headers: dict[str, str]) -> str:
    """Public OTS signing rule: base64(HMAC-SHA1(secret,
    "/Action\\nPOST\\n\\n" + sorted lowercase x-ots-* headers as
    "name:value\\n", signature header excluded))."""
    canon = "".join(
        f"{k}:{headers[k]}\n"
        for k in sorted(headers)
        if k.startswith("x-ots-") and k != "x-ots-signature"
    )
    msg = f"/{action}\nPOST\n\n{canon}"
    mac = hmac.new(access_key.encode(), msg.encode(), hashlib.sha1)
    return base64.b64encode(mac.digest()).decode()


class OtsClient:
    def __init__(self, endpoint: str, access_id: str, access_key: str,
                 instance: str, timeout: float = 60.0):
        self.endpoint = endpoint.rstrip("/")
        self.access_id = access_id
        self.access_key = access_key
        self.instance = instance
        self.timeout = timeout

    def call(self, action: str, body: bytes) -> bytes:
        headers = {
            "x-ots-date": "1970-01-01T00:00:00.000Z",
            "x-ots-apiversion": API_VERSION,
            "x-ots-accesskeyid": self.access_id,
            "x-ots-instancename": self.instance,
            "x-ots-contentmd5": base64.b64encode(
                hashlib.md5(body).digest()
            ).decode(),
        }
        import datetime

        headers["x-ots-date"] = datetime.datetime.now(
            datetime.timezone.utc
        ).strftime("%Y-%m-%dT%H:%M:%S.000Z")
        headers["x-ots-signature"] = sign_request(
            self.access_key, action, headers
        )
        req = urllib.request.Request(
            f"{self.endpoint}/{action}", data=body, headers=headers,
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                return r.read()
        except urllib.error.HTTPError as e:
            raw = e.read()
            code, msg = "OTSInternalServerError", ""
            for f, w, val in pb_fields(raw):
                if f == 1:
                    code = val.decode()
                elif f == 2:
                    msg = val.decode()
            raise OtsError(code, msg) from None

    # ---- actions -------------------------------------------------------

    def describe_table(self, table: str) -> list[tuple[str, str]]:
        """-> [(pk_name, 'INTEGER'|'STRING'|'BINARY')] in schema order."""
        resp = self.call("DescribeTable", _ld(1, table.encode()))
        names = {1: "INTEGER", 2: "STRING", 3: "BINARY"}
        pks: list[tuple[str, str]] = []
        for f, w, val in pb_fields(resp):
            if f == 1:  # TableMeta {1 table_name, 2 repeated ColumnSchema}
                for f2, w2, v2 in pb_fields(val):
                    if f2 == 2:
                        nm, ty = "", 1
                        for f3, w3, v3 in pb_fields(v2):
                            if f3 == 1:
                                nm = v3.decode()
                            elif f3 == 2:
                                ty = v3
                        pks.append((nm, names[ty]))
        return pks

    def get_range(
        self,
        table: str,
        start_pk: list[tuple[str, Any]],
        end_pk: list[tuple[str, Any]],
        columns: list[str] | None = None,
        limit: int | None = None,
        direction: str = "FORWARD",
    ):
        """One GetRange page -> (rows, next_start_pk|None); rows are
        [(pk_cols, attr_cols)]."""
        body = _ld(1, table.encode())
        body += _vi(2, 0 if direction == "FORWARD" else 1)
        for c in columns or []:
            body += _ld(3, c.encode())
        if limit is not None:
            body += _vi(4, limit)
        body += _columns(5, start_pk)
        body += _columns(6, end_pk)
        resp = self.call("GetRange", body)
        rows, nxt = [], []
        for f, w, val in pb_fields(resp):
            if f == 2:
                nxt.append(decode_column(val))
            elif f == 3:
                rows.append(decode_row(val))
        return rows, (nxt or None)

    def scan_range(self, table, start_pk, end_pk, columns=None,
                   direction="FORWARD", page_limit=None):
        """Full paged scan: follows next_start_primary_key like
        OtsReaderSlaveProxy.read's do/while token loop."""
        token = start_pk
        while token is not None:
            rows, token = self.get_range(
                table, token, end_pk, columns=columns, limit=page_limit,
                direction=direction,
            )
            yield from rows

    def put_row(self, table: str, pk, attrs) -> None:
        body = _ld(1, table.encode()) + _ld(2, _IGNORE_CONDITION)
        body += _columns(3, pk) + _columns(4, attrs)
        self.call("PutRow", body)

    def update_row(self, table: str, pk, puts, deletes) -> None:
        body = _ld(1, table.encode()) + _ld(2, _IGNORE_CONDITION)
        body += _columns(3, pk)
        for n, v in puts:
            body += _ld(4, _vi(1, 1) + _ld(2, n.encode())
                        + _ld(3, encode_value(v)))
        for n in deletes:
            body += _ld(4, _vi(1, 2) + _ld(2, n.encode()))
        self.call("UpdateRow", body)

    def batch_write(self, table: str, puts, updates, deletes) -> list[bool]:
        """One BatchWriteRow; puts = [(pk, attrs)], updates =
        [(pk, put_pairs, delete_names)], deletes = [pk]. Returns per-row
        ok flags in put+update+delete order."""
        t = _ld(1, table.encode())
        for pk, attrs in puts:
            t += _ld(2, _ld(1, _IGNORE_CONDITION) + _columns(2, pk)
                     + _columns(3, attrs))
        for pk, pairs, dels in updates:
            u = _ld(1, _IGNORE_CONDITION) + _columns(2, pk)
            for n, v in pairs:
                u += _ld(3, _vi(1, 1) + _ld(2, n.encode())
                         + _ld(3, encode_value(v)))
            for n in dels:
                u += _ld(3, _vi(1, 2) + _ld(2, n.encode()))
            t += _ld(3, u)
        for pk in deletes:
            t += _ld(4, _ld(1, _IGNORE_CONDITION) + _columns(2, pk))
        resp = self.call("BatchWriteRow", _ld(1, t))
        by_field: dict[int, list[bool]] = {2: [], 3: [], 4: []}
        for f, w, val in pb_fields(resp):
            if f == 1:  # TableInBatchWriteRowResponse
                for f2, w2, v2 in pb_fields(val):
                    if f2 in by_field:
                        ok = False
                        for f3, w3, v3 in pb_fields(v2):
                            if f3 == 1:
                                ok = bool(v3)
                        by_field[f2].append(ok)
        return by_field[2] + by_field[3] + by_field[4]


    # ---- stream actions (otsstreamreader's API surface) -----------------
    #
    # The reference tails the table's change stream with four calls
    # (otsstreamreader/.../utils/OTSHelper.java:44-55 ListStream/
    # DescribeStream; core/RecordProcessor.java:117,242-247
    # GetShardIterator/GetStreamRecord). Message layout here: the
    # real 2016+ stream API wraps each record's row in PlainBuffer;
    # this module keeps the row as the SAME protobuf Row message the
    # batch actions use (documented deviation — the shard/iterator/
    # checkpoint state machine is the faithful part, the row codec is
    # shared with the proven batch path).
    #
    # StreamRecord {1 action_type PUT=1|UPDATE=2|DELETE=3, 2 row,
    #               3 timestamp_micros, 4 row_index, 5 epoch}

    def list_stream(self, table: str) -> str | None:
        """-> stream_id for the table's change stream (or None)."""
        resp = self.call("ListStream", _ld(1, table.encode()))
        for f, w, val in pb_fields(resp):
            if f == 1:  # Stream {1 stream_id, 2 table_name}
                for f2, w2, v2 in pb_fields(val):
                    if f2 == 1:
                        return v2.decode()
        return None

    def describe_stream(self, stream_id: str) -> list[tuple[str, str | None]]:
        """-> [(shard_id, parent_id|None)] (pagination folded in, the
        getOrderedShardList loop)."""
        shards: list[tuple[str, str | None]] = []
        start: str | None = None
        while True:
            body = _ld(1, stream_id.encode())
            if start:
                body += _ld(2, start.encode())
            resp = self.call("DescribeStream", body)
            nxt = None
            for f, w, val in pb_fields(resp):
                if f == 4:  # StreamShard {1 shard_id, 2 parent_id}
                    sid, parent = "", None
                    for f2, w2, v2 in pb_fields(val):
                        if f2 == 1:
                            sid = v2.decode()
                        elif f2 == 2:
                            parent = v2.decode()
                    shards.append((sid, parent))
                elif f == 6:
                    nxt = val.decode()
            if not nxt:
                return shards
            start = nxt

    def get_shard_iterator(self, stream_id: str, shard_id: str) -> str:
        body = _ld(1, stream_id.encode()) + _ld(2, shard_id.encode())
        resp = self.call("GetShardIterator", body)
        for f, w, val in pb_fields(resp):
            if f == 1:
                return val.decode()
        raise OtsError("OTSProtocolError", "no shard iterator in response")

    def get_stream_records(self, shard_iterator: str, limit: int = 1000):
        """One page -> (records, next_iterator|None); each record is
        (action 'PUT'|'UPDATE'|'DELETE', pk_cols, attr_cols,
        (timestamp_micros, row_index, epoch))."""
        body = _ld(1, shard_iterator.encode()) + _vi(2, limit)
        resp = self.call("GetStreamRecords", body)
        records, nxt = [], None
        names = {1: "PUT", 2: "UPDATE", 3: "DELETE"}
        for f, w, val in pb_fields(resp):
            if f == 1:
                action, row, ts, idx, epoch = 1, (None, None), 0, 0, 0
                for f2, w2, v2 in pb_fields(val):
                    if f2 == 1:
                        action = v2
                    elif f2 == 2:
                        row = decode_row(v2)
                    elif f2 == 3:
                        ts = v2
                    elif f2 == 4:
                        idx = v2
                    elif f2 == 5:
                        epoch = v2
                records.append((names[action], row[0], row[1],
                                (ts, idx, epoch)))
            elif f == 2:
                nxt = val.decode()
        return records, nxt


# --------------------------------------------------------------------------
# range split (OtsReaderMasterProxy.defaultRangeSplit / userDefinedRangeSplit)
# --------------------------------------------------------------------------


def _split_points(lo: Any, hi: Any, num: int) -> list[Any]:
    """Interior split points over the partition-key dimension.
    INTEGER: RangeSplitUtil.doLongSplit arithmetic. STRING: first-order
    code-point interpolation of doAsciiStringSplit (the base-N encoding's
    leading digit, common/.../RangeSplitUtil.java:105-171)."""
    if isinstance(lo, int) and isinstance(hi, int):
        if hi - lo + 1 <= num:
            return list(range(lo + 1, hi + 1))
        span = hi - lo + 1
        base, rem = divmod(span, num)
        points, cur = [], lo
        for i in range(num - 1):
            cur += base + (1 if i < rem else 0)
            points.append(cur)
        return points
    if isinstance(lo, str) and isinstance(hi, str):
        a = ord(lo[0]) if lo else 0
        b = ord(hi[0]) if hi else 0
        if b <= a:
            return []
        return [chr(c) for c in sorted(
            {a + (b - a) * (i + 1) // num for i in range(num - 1)})
            if a < c <= b]
    return []


def ots_plan_ranges(
    client: OtsClient,
    table: str,
    begin: list[Any],
    end: list[Any],
    num_slices: int,
    split_points: list[Any] | None = None,
) -> list[tuple[list[tuple[str, Any]], list[tuple[str, Any]]]]:
    """Driver-side planning: DescribeTable for the pk schema, then the
    reference's split ladder — explicit user points win; otherwise probe
    the REAL first/last rows (GetRange limit=1, forward then backward)
    and count-split between them, keeping the user's outer bounds on the
    first and last slice (OtsReaderMasterProxy.defaultRangeSplit)."""
    pks = client.describe_table(table)
    if len(begin) != len(pks) or len(end) != len(pks):
        raise OtsError(
            "OTSParameterInvalid",
            f"range begin/end must carry {len(pks)} pk values",
        )
    begin_pk = [(n, v) for (n, _), v in zip(pks, begin)]
    end_pk = [(n, v) for (n, _), v in zip(pks, end)]
    rest_min = [(n, INF_MIN) for n, _ in pks[1:]]
    rest_max = [(n, INF_MAX) for n, _ in pks[1:]]
    pname = pks[0][0]

    points = list(split_points or [])
    if not points and num_slices > 1:
        fwd, _ = client.get_range(table, begin_pk, end_pk, limit=1)
        bwd, _ = client.get_range(
            table, end_pk, begin_pk, limit=1, direction="BACKWARD"
        )
        # a missing probe row means <=1 row in range: don't split
        # (OtsReaderMasterProxy.java:183-189)
        if fwd and bwd:
            lo = dict(fwd[0][0])[pname]
            hi = dict(bwd[0][0])[pname]
            points = _split_points(lo, hi, num_slices)
    if not points:
        return [(begin_pk, end_pk)]
    bounds = (
        [begin_pk]
        + [[(pname, p)] + rest_min for p in points]
        + [end_pk]
    )
    ranges = []
    for i in range(len(bounds) - 1):
        s = bounds[i]
        e = bounds[i + 1]
        # interior ends are exclusive at (point, INF_MIN) exactly like
        # RangeSplit.rangeSplitByPoint's begin/end stitching
        if i + 1 < len(bounds) - 1:
            e = [(pname, bounds[i + 1][0][1])] + rest_min
        ranges.append((s, e))
    return ranges


# --------------------------------------------------------------------------
# reader / writer entry points
# --------------------------------------------------------------------------


def _parse_range_value(v: Any) -> Any:
    """DataX range entries are typed dicts ({"type":"INF_MIN"} or
    {"type":"STRING","value":"a"}); accept those and plain scalars."""
    if isinstance(v, dict):
        t = str(v.get("type", "")).upper()
        if t == "INF_MIN":
            return INF_MIN
        if t == "INF_MAX":
            return INF_MAX
        val = v.get("value")
        if t in ("INT", "INTEGER"):
            return int(val)
        return val
    return v


def ots_read(
    spark: SparkSession,
    endpoint: str,
    access_id: str,
    access_key: str,
    instance: str,
    table: str,
    schema: str,
    begin: list[Any] | None = None,
    end: list[Any] | None = None,
    num_slices: int = 4,
    split_points: list[Any] | None = None,
    page_limit: int | None = None,
) -> DataFrame:
    """Executor-parallel range scan. ``schema`` is a Spark DDL string
    naming the columns to read (pk + attrs — the DataX ``column`` list);
    the projection pushes down via columns_to_get and each planned range
    is one task holding its own paged scan — rows never pass through the
    driver."""
    client = OtsClient(endpoint, access_id, access_key, instance)
    pks = client.describe_table(table)
    npk = len(pks)
    b = [_parse_range_value(v) for v in (begin or [INF_MIN] * npk)]
    e = [_parse_range_value(v) for v in (end or [INF_MAX] * npk)]
    pts = [_parse_range_value(v) for v in (split_points or [])] or None
    ranges = ots_plan_ranges(client, table, b, e, num_slices, pts)

    from pyspark.sql.types import StructType

    target: StructType = spark.createDataFrame([], schema).schema
    cols = [f.name for f in target.fields]
    slices = spark.createDataFrame(
        [(i,) for i in range(len(ranges))], "slice_id int"
    ).repartition(len(ranges))

    def _batches(it):
        import pandas as pd

        cl = OtsClient(endpoint, access_id, access_key, instance)
        for pdf in it:
            out: dict[str, list] = {c: [] for c in cols}
            for sid in pdf["slice_id"]:
                s, t = ranges[int(sid)]
                for pk, attrs in cl.scan_range(
                    table, s, t, columns=cols, page_limit=page_limit
                ):
                    d = dict(pk)
                    d.update(attrs)
                    for c in cols:
                        out[c].append(d.get(c))
            yield pd.DataFrame(out, columns=cols)

    return slices.mapInPandas(_batches, target)


def ots_write(
    df: DataFrame,
    endpoint: str,
    access_id: str,
    access_key: str,
    instance: str,
    table: str,
    primary_key: list[str],
    write_mode: str = "PutRow",
    batch_size: int = 100,
) -> dict[str, int]:
    """Batched BatchWriteRow with the reference's row semantics: PutRow
    skips null attrs, UpdateRow deletes the attr on null, DeleteRow is
    pk-only (utils/Common.java:71-103). Null pk cells and per-row
    ``is_ok=false`` statuses are dirty records, not job failures
    (OtsWriterSlaveProxy.WriterCallback). Returns {"written", "errors"}."""
    if write_mode not in ("PutRow", "UpdateRow", "DeleteRow"):
        raise ValueError(f"writeMode must be PutRow|UpdateRow|DeleteRow, "
                         f"got {write_mode!r}")
    attr_cols = [c for c in df.columns if c not in primary_key]

    def _clean(v):
        if v is None or (isinstance(v, float) and v != v):
            return None
        return v.item() if hasattr(v, "item") else v

    def _batches(it):
        import pandas as pd

        cl = OtsClient(endpoint, access_id, access_key, instance)
        written = errors = 0

        def flush(rows):
            nonlocal written, errors
            if not rows:
                return
            if write_mode == "PutRow":
                oks = cl.batch_write(table, rows, [], [])
            elif write_mode == "UpdateRow":
                oks = cl.batch_write(table, [], rows, [])
            else:
                oks = cl.batch_write(table, [], [], rows)
            written += sum(oks)
            errors += len(oks) - sum(oks)

        for pdf in it:
            batch: list = []
            for rec in pdf.to_dict("records"):
                pk = [(k, _clean(rec[k])) for k in primary_key]
                if any(v is None for _, v in pk):
                    errors += 1  # null pk -> dirty (Common.java:44)
                    continue
                if write_mode == "DeleteRow":
                    batch.append(pk)
                elif write_mode == "PutRow":
                    attrs = [(c, _clean(rec[c])) for c in attr_cols]
                    batch.append((pk, [(n, v) for n, v in attrs
                                       if v is not None]))
                else:
                    attrs = [(c, _clean(rec[c])) for c in attr_cols]
                    batch.append((
                        pk,
                        [(n, v) for n, v in attrs if v is not None],
                        [n for n, v in attrs if v is None],
                    ))
                if len(batch) >= batch_size:
                    flush(batch)
                    batch = []
            flush(batch)
        yield pd.DataFrame({"written": [written], "errors": [errors]})

    out = df.mapInPandas(_batches, "written long, errors long").groupBy().sum()
    row = out.collect()[0]
    return {"written": int(row[0] or 0), "errors": int(row[1] or 0)}
