"""Live MongoDB reader/writer over the REAL wire protocol (OP_MSG + BSON).

Round 4 session 3 upgrades mongodbreader/mongodbwriter from option-dict
builders (sources/connectors.py, for the mongo-spark connector) to an
executable implementation of the reference's actual data path:

- ``MongoWire``: a stdlib-socket client speaking MongoDB's modern wire
  protocol — OP_MSG (opCode 2013, section kind 0) framing around a
  minimal but correct BSON codec (double/string/document/array/binary/
  bool/null/int32/int64 — the types a DataX record round-trips). The
  bytes on the wire are exactly what a real ``mongod`` accepts.
- ``mongo_split_ranges``: the reader's split planning
  (mongodbreader/.../util/CollectionSplitUtil.java:65-166) — DataX asks
  ``splitVector`` when privileged and otherwise derives split points by
  count/skip sampling over ``_id``; no admin role exists in any sandbox,
  so this implements the fallback arm: count + evenly-spaced
  skip-probes, each slice a ``[lower, upper)`` range with open min/max
  edges, exactly the reference's Range{lowerBound, upperBound} list.
- ``mongo_read``: executor-parallel range reads — each slice runs a
  real ``find`` with range filter + ``getMore`` cursor pagination
  inside ``mapInPandas`` (one task per slice, the reference's
  one-reader-task-per-range split), so 1000 executors fan out to
  mongos/mongod concurrently and the driver only plans slices.
- ``mongo_write``: batched ``insert`` (MongoDBWriter.doBatchInsert,
  MongoDBWriter.java:148) or replace-upsert keyed on ``uniqueKey``
  (ReplaceOneModel + upsert=true, MongoDBWriter.java:295-303), run
  inside ``mapInPandas`` with per-item writeErrors accounted as dirty
  records against the error budget, not job failures.

Tests drive the client against an in-process socket server speaking the
same OP_MSG/BSON grammar (tests/test_mongo_live.py) — the mongo twin of
the embedded-Derby, mock-ES and in-process-FTP proofs: the CLIENT is
protocol-real, the backend is a fixture because no mongod ships in this
image.
"""

from __future__ import annotations

import socket
import struct
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession

OP_MSG = 2013


class MongoWireError(RuntimeError):
    """Server-reported command failure (ok != 1) or framing error."""


# --------------------------------------------------------------------------
# BSON codec (the subset a DataX record needs; spec: bsonspec.org)
# --------------------------------------------------------------------------


def _enc_elem(name: str, v: Any) -> bytes:
    key = name.encode() + b"\x00"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return b"\x08" + key + (b"\x01" if v else b"\x00")
    if isinstance(v, float):
        return b"\x01" + key + struct.pack("<d", v)
    if isinstance(v, str):
        s = v.encode()
        return b"\x02" + key + struct.pack("<i", len(s) + 1) + s + b"\x00"
    if isinstance(v, dict):
        return b"\x03" + key + encode_doc(v)
    if isinstance(v, (list, tuple)):
        return b"\x04" + key + encode_doc(
            {str(i): x for i, x in enumerate(v)}
        )
    if isinstance(v, (bytes, bytearray)):
        return b"\x05" + key + struct.pack("<i", len(v)) + b"\x00" + bytes(v)
    if v is None:
        return b"\x0a" + key
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return b"\x10" + key + struct.pack("<i", v)
        return b"\x12" + key + struct.pack("<q", v)
    raise TypeError(f"bson: unsupported python type {type(v).__name__}")


def encode_doc(doc: dict) -> bytes:
    body = b"".join(_enc_elem(k, v) for k, v in doc.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _dec_elem(buf: bytes, off: int) -> tuple[str, Any, int]:
    t = buf[off]
    off += 1
    end = buf.index(b"\x00", off)
    name = buf[off:end].decode()
    off = end + 1
    if t == 0x01:
        return name, struct.unpack_from("<d", buf, off)[0], off + 8
    if t == 0x02:
        (n,) = struct.unpack_from("<i", buf, off)
        s = buf[off + 4 : off + 4 + n - 1].decode()
        return name, s, off + 4 + n
    if t in (0x03, 0x04):
        doc, off2 = decode_doc(buf, off)
        if t == 0x04:
            return name, [doc[str(i)] for i in range(len(doc))], off2
        return name, doc, off2
    if t == 0x05:
        (n,) = struct.unpack_from("<i", buf, off)
        return name, bytes(buf[off + 5 : off + 5 + n]), off + 5 + n
    if t == 0x08:
        return name, buf[off] == 1, off + 1
    if t == 0x0A:
        return name, None, off
    if t == 0x10:
        return name, struct.unpack_from("<i", buf, off)[0], off + 4
    if t == 0x12:
        return name, struct.unpack_from("<q", buf, off)[0], off + 8
    raise MongoWireError(f"bson: unsupported element type 0x{t:02x}")


def decode_doc(buf: bytes, off: int = 0) -> tuple[dict, int]:
    (n,) = struct.unpack_from("<i", buf, off)
    end = off + n - 1  # points at the trailing 0x00
    off += 4
    out: dict[str, Any] = {}
    while off < end:
        k, v, off = _dec_elem(buf, off)
        out[k] = v
    return out, end + 1


# --------------------------------------------------------------------------
# OP_MSG transport
# --------------------------------------------------------------------------


class MongoWire:
    """One socket, request/response OP_MSG commands. The first key of
    ``cmd`` must be the command name (wire-protocol requirement);
    python dicts preserve insertion order so plain literals work."""

    def __init__(self, host: str, port: int = 27017, timeout: float = 30.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._req_id = 0

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self) -> "MongoWire":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _recv_exact(self, n: int) -> bytes:
        chunks = []
        while n:
            c = self._sock.recv(n)
            if not c:
                raise MongoWireError("connection closed mid-message")
            chunks.append(c)
            n -= len(c)
        return b"".join(chunks)

    def command(self, db: str, cmd: dict) -> dict:
        self._req_id += 1
        body = dict(cmd)
        body["$db"] = db
        payload = struct.pack("<i", 0) + b"\x00" + encode_doc(body)
        header = struct.pack(
            "<iiii", 16 + len(payload), self._req_id, 0, OP_MSG
        )
        self._sock.sendall(header + payload)
        (length,) = struct.unpack("<i", self._recv_exact(4))
        msg = self._recv_exact(length - 4)
        _req, _resp_to, opcode = struct.unpack_from("<iii", msg, 0)
        if opcode != OP_MSG:
            raise MongoWireError(f"unexpected reply opcode {opcode}")
        # flagBits(4) + section kind byte(1) precede the body document
        if msg[16] != 0:
            raise MongoWireError(f"unexpected section kind {msg[16]}")
        reply, _ = decode_doc(msg, 17)
        if reply.get("ok") != 1 and reply.get("ok") != 1.0:
            raise MongoWireError(
                f"{next(iter(cmd))} failed: code={reply.get('code')} "
                f"{reply.get('errmsg', reply)}"
            )
        return reply

    def find_all(
        self,
        db: str,
        coll: str,
        filter: dict | None = None,
        projection: dict | None = None,
        sort: dict | None = None,
        limit: int = 0,
        batch_size: int = 101,
    ) -> Iterable[dict]:
        """``find`` + ``getMore`` cursor pagination — the real protocol
        shape (a 100 TB slice never arrives in one reply)."""
        cmd: dict[str, Any] = {"find": coll, "batchSize": batch_size}
        if filter:
            cmd["filter"] = filter
        if projection:
            cmd["projection"] = projection
        if sort:
            cmd["sort"] = sort
        if limit:
            cmd["limit"] = limit
        reply = self.command(db, cmd)
        cur = reply["cursor"]
        yield from cur["firstBatch"]
        while cur["id"]:
            reply = self.command(
                db,
                {"getMore": cur["id"], "collection": coll,
                 "batchSize": batch_size},
            )
            cur = reply["cursor"]
            yield from cur["nextBatch"]


# --------------------------------------------------------------------------
# reader: split planning + executor-parallel range reads
# --------------------------------------------------------------------------


def mongo_split_ranges(
    host: str,
    port: int,
    db: str,
    coll: str,
    num_slices: int,
    split_pk: str = "_id",
) -> list[tuple[Any, Any]]:
    """CollectionSplitUtil.doSplitCollection's unprivileged arm
    (CollectionSplitUtil.java:130-166): count the collection, then probe
    a split point every ``count/num_slices`` docs via sorted
    skip-queries, yielding [lower, upper) ranges with None as the open
    min/max sentinel ("min"/"max" in the reference)."""
    with MongoWire(host, port) as w:
        n = int(w.command(db, {"count": coll}).get("n", 0))
        if n == 0 or num_slices <= 1:
            return [(None, None)]
        chunk = max(1, n // num_slices)
        points: list[Any] = []
        skip = chunk
        while skip < n and len(points) < num_slices - 1:
            batch = _skip_probe(w, db, coll, split_pk, skip)
            if not batch:
                break
            pt = batch[0][split_pk]
            if not points or pt != points[-1]:
                points.append(pt)
            skip += chunk
    bounds = [None, *points, None]
    return list(zip(bounds[:-1], bounds[1:]))


def _skip_probe(w: MongoWire, db: str, coll: str, pk: str, skip: int):
    reply = w.command(
        db,
        {"find": coll, "projection": {pk: 1}, "sort": {pk: 1},
         "skip": skip, "limit": 1, "batchSize": 1},
    )
    return reply["cursor"]["firstBatch"]


def _range_filter(split_pk: str, lo: Any, hi: Any, extra: dict | None) -> dict:
    f: dict[str, Any] = {}
    rng: dict[str, Any] = {}
    if lo is not None:
        rng["$gte"] = lo
    if hi is not None:
        rng["$lt"] = hi
    if rng:
        f[split_pk] = rng
    if extra:
        f.update(extra)
    return f


def mongo_read(
    spark: SparkSession,
    host: str,
    port: int,
    db: str,
    coll: str,
    schema: str,
    num_slices: int = 4,
    split_pk: str = "_id",
    filter: dict | None = None,
    batch_size: int = 1000,
) -> DataFrame:
    """Executor-parallel collection read. ``schema`` is a Spark DDL
    string naming the columns to project (the DataX column list);
    projection pushes down to the server, range filters keep slices
    disjoint, and each slice is one task holding its own connection —
    rows never funnel through the driver."""
    ranges = mongo_split_ranges(host, port, db, coll, num_slices, split_pk)
    slices = spark.createDataFrame(
        [(i,) for i in range(len(ranges))], "slice_id int"
    ).repartition(len(ranges))
    from pyspark.sql.types import StructType

    target: StructType = spark.createDataFrame([], schema).schema
    cols = [f.name for f in target.fields]
    proj = {c: 1 for c in cols}
    if split_pk not in proj:
        proj[split_pk] = 1  # range correctness beats projection width

    def _batches(it):
        import pandas as pd

        for pdf in it:
            rows: dict[str, list] = {c: [] for c in cols}
            for sid in pdf["slice_id"]:
                lo, hi = ranges[int(sid)]
                with MongoWire(host, port) as w:
                    for doc in w.find_all(
                        db, coll,
                        filter=_range_filter(split_pk, lo, hi, filter),
                        projection=proj,
                        batch_size=batch_size,
                    ):
                        for c in cols:
                            rows[c].append(doc.get(c))
            yield pd.DataFrame(rows, columns=cols)

    return slices.mapInPandas(_batches, target)


# --------------------------------------------------------------------------
# writer: batched insert / replace-upsert
# --------------------------------------------------------------------------


def mongo_write(
    df: DataFrame,
    host: str,
    port: int,
    db: str,
    coll: str,
    write_mode: str = "insert",
    unique_key: str | None = None,
    batch_size: int = 1000,
) -> dict[str, int]:
    """MongoDBWriter's two write paths: ``insert`` = batched ``insert``
    commands (doBatchInsert, MongoDBWriter.java:148); ``replace`` =
    per-key ReplaceOne-with-upsert via the ``update`` command
    (MongoDBWriter.java:295-303 — query on ``uniqueKey``, full-document
    replacement, upsert=true, idempotent by key). Item-level
    ``writeErrors`` count as dirty records, not job failures —
    the reference's record-level error accounting."""
    if write_mode not in ("insert", "replace"):
        raise ValueError(f"write_mode must be insert|replace, got {write_mode!r}")
    if write_mode == "replace" and not unique_key:
        raise ValueError("write_mode=replace requires unique_key "
                         "(MongoDBWriter uniqueKey contract)")
    cols = df.columns

    def _batches(it):
        import pandas as pd

        written = errors = 0
        for pdf in it:
            docs = []
            for rec in pdf.to_dict("records"):
                doc = {}
                for c in cols:
                    v = rec[c]
                    # Arrow->pandas NaN must become JSON/BSON null (the
                    # same cleanup the ES writer needs)
                    if v is None or (isinstance(v, float) and v != v):
                        doc[c] = None
                    elif hasattr(v, "item"):
                        doc[c] = v.item()
                    else:
                        doc[c] = v
                docs.append(doc)
            with MongoWire(host, port) as w:
                for i in range(0, len(docs), batch_size):
                    chunk = docs[i : i + batch_size]
                    if write_mode == "insert":
                        cmd: dict[str, Any] = {
                            "insert": coll, "documents": chunk,
                            "ordered": False,
                        }
                    else:
                        cmd = {
                            "update": coll,
                            "updates": [
                                {"q": {unique_key: d[unique_key]}, "u": d,
                                 "upsert": True, "multi": False}
                                for d in chunk
                            ],
                            "ordered": False,
                        }
                    reply = w.command(db, cmd)
                    bad = len(reply.get("writeErrors", []) or [])
                    errors += bad
                    written += len(chunk) - bad
        yield pd.DataFrame({"written": [written], "errors": [errors]})

    out = df.mapInPandas(_batches, "written long, errors long").groupBy().sum()
    row = out.collect()[0]
    return {"written": int(row[0] or 0), "errors": int(row[1] or 0)}


def mongo_apply_cdc(
    df: DataFrame,
    host: str,
    port: int,
    db: str,
    coll: str,
    key_cols: list[str],
    op_col: str = "op",
    batch_size: int = 1000,
) -> dict[str, int]:
    """Apply a (deduped) CDC batch to a collection: non-delete events
    upsert the full document keyed by the composite ``_id``
    (key_cols joined with ':', the same identity rule as the ES sink);
    delete events issue ``delete`` commands on that ``_id``. Both arms
    are idempotent — an upsert repeats to the same doc, a
    delete-of-missing reports n=0 — so checkpoint-replayed batches
    converge with NO fence (the lake sink's append path is the one that
    needs fencing). Returns {"upserted": n, "deleted": m}."""
    cols = [c for c in df.columns if c != op_col]

    def _batches(it):
        import pandas as pd

        up = dl = 0
        for pdf in it:
            ups, dels = [], []
            for rec in pdf.to_dict("records"):
                _id = ":".join(str(rec[k]) for k in key_cols)
                if str(rec[op_col]) == "delete":
                    dels.append({"q": {"_id": _id}, "limit": 1})
                else:
                    doc = {"_id": _id}
                    for c in cols:
                        v = rec[c]
                        if v is None or (isinstance(v, float) and v != v):
                            doc[c] = None
                        elif hasattr(v, "item"):
                            doc[c] = v.item()
                        else:
                            doc[c] = v
                    ups.append(doc)
            with MongoWire(host, port) as w:
                for i in range(0, len(ups), batch_size):
                    chunk = ups[i : i + batch_size]
                    w.command(db, {
                        "update": coll,
                        "updates": [
                            {"q": {"_id": d["_id"]}, "u": d,
                             "upsert": True, "multi": False}
                            for d in chunk
                        ],
                        "ordered": False,
                    })
                    up += len(chunk)
                for i in range(0, len(dels), batch_size):
                    chunk = dels[i : i + batch_size]
                    w.command(db, {"delete": coll, "deletes": chunk,
                                   "ordered": False})
                    dl += len(chunk)
        yield pd.DataFrame({"upserted": [up], "deleted": [dl]})

    out = df.mapInPandas(
        _batches, "upserted long, deleted long"
    ).groupBy().sum()
    row = out.collect()[0]
    return {"upserted": int(row[0] or 0), "deleted": int(row[1] or 0)}


def tail_to_mongo(
    spark: SparkSession,
    log_dir: str,
    checkpoint_dir: str,
    schema,
    host: str,
    port: int,
    db: str,
    coll: str,
    key_cols: list[str],
    timeout_sec: float = 120.0,
    max_files_per_trigger: int = 1,
    envelope: str | None = None,
    batch_size: int = 1000,
    quarantine_dir: str | None = None,
):
    """CDC tail -> OPERATIONAL-STORE materialization: Structured
    Streaming micro-batches keep a mongo collection in sync with the
    change log (the serving-cache twin of ``tail_to_es``). Per batch:
    dirty split (same taxonomy as the lake sink), latest-wins dedup on
    ``key_cols``, then ONE ``mongo_apply_cdc`` — idempotent by _id, so
    replays need no fence. Checkpoint/resume, bounded triggers and the
    envelope parse are tail_and_apply's machinery; only the sink
    differs."""
    from datax_spark.operators.dedup import dedup_latest
    from datax_spark.quality.quarantine import append_quarantine, split_dirty
    from datax_spark.streaming.pipeline import tail_and_apply

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        events = batch_df.drop("ts", "batch_file")
        clean, dirty = split_dirty(
            events,
            key_cols=key_cols,
            content_col="content" if "content" in events.columns else None,
        )
        if quarantine_dir:
            append_quarantine(dirty, quarantine_dir, batch_id)
        deduped = dedup_latest(clean, key_cols)
        mongo_apply_cdc(
            deduped, host, port, db, coll,
            key_cols=key_cols, batch_size=batch_size,
        )

    return tail_and_apply(
        spark,
        table_path="",  # unused: the custom sink replaces the lake apply
        log_dir=log_dir,
        checkpoint_dir=checkpoint_dir,
        schema=schema,
        max_files_per_trigger=max_files_per_trigger,
        timeout_sec=timeout_sec,
        sink=_sink,
        envelope=envelope,
    )
