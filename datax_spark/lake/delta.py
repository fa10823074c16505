"""Delta Lake transaction-log export / import for lake tables.

The Delta twin of ``lake/iceberg.py``: ``export_delta`` publishes a lake
snapshot as a spec-conformant **Delta Lake** commit under
``<table.path>/_delta_log/`` — referencing the table's existing parquet
data files IN PLACE (metadata-only: zero data bytes move, exactly the
property the lake's own commits and the Iceberg mirror have).
``read_delta`` is the inverse: it plans the scan purely from the Delta
log (never touching the lake's ``_manifests``) and returns the table as
a DataFrame, with time travel by Delta version or by lake version.

Everything here is built from the PUBLIC Delta Lake protocol spec
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md):

- commit files ``_delta_log/<version, 20 digits>.json`` — one JSON
  action per line: ``protocol`` (minReader 1 / minWriter 2 — the
  feature set actually used: plain adds/removes, no DVs, no column
  mapping), ``metaData`` (``schemaString`` IS Spark's StructType JSON —
  Delta's native schema encoding), ``add`` (URL-encoded relative path,
  size, modificationTime, per-file ``stats`` JSON with numRecords +
  min/max for the table's ``stats_cols`` — the data-skipping index
  real Delta readers use), ``remove`` tombstones, ``commitInfo``
  (carries ``lakeVersion``, the mirror's version mapping);
- checkpoints ``<version>.checkpoint.parquet`` + ``_last_checkpoint``
  per the spec's checkpoint schema (one struct column per action kind),
  so log replay cost is O(commits since last checkpoint), not O(all);
- log cleanup (``clean_delta_log``) deletes commits a checkpoint has
  subsumed — the ``delta.logRetentionDuration`` mechanism.

Delta versions are CONSECUTIVE integers from 0 (a spec requirement —
unlike Iceberg snapshot ids), so the mirror keeps its own version
counter and records the lake version in ``commitInfo.lakeVersion``;
commits are published with O_EXCL create (the spec's "mutual exclusion"
primitive — the same put-if-absent contract real LogStores provide).

Fidelity boundary, stated plainly: no Delta implementation exists in
this sandbox (no delta-spark jars, and DuckDB's delta extension needs a
network install — probed), so "delta-rs/delta-spark reads it" can't be
executed here. The JSON layer is pinned line-by-line against the spec's
required fields in tests, and ``read_delta`` proves the log alone
reconstructs every version of the table without the lake's manifests.

Semantics boundaries (all refuse loudly, never export wrong data):

- MOR snapshots with live deltas / equality-deletes export through the
  spec's **deletion vectors** (protocol 3/7, readerFeatures
  ``deletionVectors``): delta files ride as data files and every row
  the engine's resolved read hides — superseded base rows, non-latest
  delta rows, inline tombstones, eq-deleted rows — masks out by file
  position. Positions come from ``_metadata.row_index``; the bitmaps
  are RFC-1924-Base85 / portable-RoaringBitmap / RoaringBitmapArray
  per the spec, the 32-bit layer byte-verified against
  org.roaringbitmap on Spark's classpath. Unlike the Iceberg mirror's
  file-sequence model this handles INLINE tombstones and NULL-seq bulk
  rows too — the only MOR refusal left is patch (partial-column)
  deltas, whose column-coalescing resolution a row-removal mask cannot
  express; ``sync_delta`` skips that transient state and catches up at
  the next compacted commit. MOR mirrors expose the RESOLVED schema
  (payload only — never the private ``_seq``/``_op``/``_patch``).
- Renamed columns export through the spec's **column mapping** (mode
  ``name``): when every live file stores a renamed column under ONE
  consistent physical name (the metadata-only-rename state — nothing
  rewritten yet), the export enables ``delta.columnMapping.mode=name``
  (protocol minReader 2 / minWriter 5), stamps each schema field with
  ``delta.columnMapping.physicalName``/``.id``, and a mapping-aware
  reader resolves logical->physical exactly like real Delta. What
  REFUSES is the mixed-era state — some live files under the retired
  name, some under the current (the lake's read-time coalesce,
  ``LakeTable._read_files``, has no Delta equivalent: physical names
  are per-column, not per-file) — until ``compact()`` /
  ``rewrite_clustered()`` homogenizes the files. One footer pass, run
  only when renames exist.
- Branches refuse (same reason as Iceberg: a branch's version numbers
  are a separate namespace).

Design for scale: export cost is O(files changed since the last
export) — unchanged files need no footer reads (their stats replay
from the prior log), record counts/sizes for new files fan out to
executors above FILE_STATS_PARALLEL_THRESHOLD, and each export appends
ONE commit JSON regardless of table size. Retention couples to lake
``vacuum`` via ``delta_pinned_versions`` — the LATEST mirrored lake
version stays fully readable; older Delta versions survive exactly as
long as lake retention keeps their files, which is the documented
semantics of real Delta VACUUM (time travel beyond retention dangles).
"""

from __future__ import annotations

import json
import os
import time
import urllib.parse
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

LOG_DIR = "_delta_log"
# spec: remove tombstones stay in checkpoints until this age has passed
# (delta.deletedFileRetentionDuration default: 1 week)
TOMBSTONE_RETENTION_MS = 7 * 24 * 3600 * 1000

# ---------------------------------------------------------------------------
# Deletion vectors — encoding primitives
#
# The spec's DV stack, bottom-up (PROTOCOL.md "Deletion Vectors"):
#   RFC-1924 Base85 (UUIDs / inline DVs in pathOrInlineDv)
#   -> portable 32-bit RoaringBitmap (RoaringFormatSpec — the format
#      org.roaringbitmap serializes; the jar ships with pyspark and the
#      test suite cross-verifies these bytes against it)
#   -> RoaringBitmapArray "portable" framing (Delta's 64-bit wrapper:
#      magic 1681511377 LE, u64 bitmap count, then each 32-bit bitmap's
#      portable bytes in dense index order)
#   -> DV file: 1 version byte (=1), then per DV
#      [u32 BE size][bitmap-array bytes][u32 BE crc32 of those bytes];
#      the add action's descriptor offset points at the size field.
# ---------------------------------------------------------------------------

_B85_ALPHABET = (
    "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "abcdefghijklmnopqrstuvwxyz!#$%&()*+-;<=>?@^_`{|}~"
)
_B85_INDEX = {c: i for i, c in enumerate(_B85_ALPHABET)}
_DV_MAGIC = 1681511377  # RoaringBitmapArray portable magic
_SERIAL_COOKIE_NO_RUN = 12346  # RoaringFormatSpec
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4
_DV_DIR = "_dv"  # random-prefix slot of the 'u' storageType
CDF_DIR = "_change_data"  # spec: change data files directory


def _b85_encode(data: bytes) -> str:
    """RFC-1924 Base85 (the alphabet Delta's Base85Codec uses). Input
    length must be a multiple of 4 (UUIDs and 4-byte-aligned DV blobs)."""
    if len(data) % 4:
        raise ValueError("base85 input must be 4-byte aligned")
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            n, r = divmod(n, 85)
            chunk.append(_B85_ALPHABET[r])
        out.extend(reversed(chunk))
    return "".join(out)


def _b85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError("base85 input must be 5-char aligned")
    out = bytearray()
    for i in range(0, len(s), 5):
        n = 0
        for c in s[i : i + 5]:
            n = n * 85 + _B85_INDEX[c]
        out += n.to_bytes(4, "big")
    return bytes(out)


def serialize_roaring32(values) -> bytes:
    """Portable serialization of a 32-bit roaring bitmap holding
    ``values`` (iterable of ints in [0, 2^32)) — byte-identical to
    org.roaringbitmap's no-run-container format (writers may always
    choose array/bitmap containers; the test suite pins equality against
    the Java reference on Spark's classpath). numpy-vectorized (round
    5): container split via unique/searchsorted, bitmap containers via
    packbits — the DV mask job serializes millions of positions per
    batch and the per-value Python loop was its hottest profile line."""
    import struct

    import numpy as np

    arr = np.unique(np.asarray(list(values) if not hasattr(values, "dtype")
                               else values, dtype=np.uint32))
    n_vals = int(arr.size)
    if n_vals == 0:
        return struct.pack("<II", _SERIAL_COOKIE_NO_RUN, 0)
    hi = (arr >> np.uint32(16)).astype(np.uint32)
    lo = (arr & np.uint32(0xFFFF)).astype(np.uint16)
    keys, starts = np.unique(hi, return_index=True)
    bounds = np.append(starts, n_vals)
    n = int(keys.size)
    header = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    cards = (bounds[1:] - bounds[:-1]).astype(np.int64)
    desc = b"".join(
        struct.pack("<HH", int(keys[i]), int(cards[i]) - 1)
        for i in range(n)
    )
    blobs: list[bytes] = []
    for i in range(n):
        vals = lo[int(bounds[i]):int(bounds[i + 1])]
        if vals.size > 4096:  # bitmap container
            bits = np.zeros(65536, dtype=np.uint8)
            bits[vals] = 1
            blobs.append(np.packbits(bits, bitorder="little").tobytes())
        else:  # array container
            blobs.append(vals.astype("<u2").tobytes())
    # offset header (always present with the no-run cookie): byte offset
    # of each container from the START of the stream
    base = len(header) + len(desc) + 4 * n
    offsets = []
    at = base
    for b in blobs:
        offsets.append(at)
        at += len(b)
    off = struct.pack(f"<{n}I", *offsets) if n else b""
    return header + desc + off + b"".join(blobs)


def deserialize_roaring32(buf: bytes, pos: int = 0) -> tuple[list[int], int]:
    """Inverse of ``serialize_roaring32``; also reads the with-run
    cookie and run containers (a conforming reader must). Returns
    (sorted values, next offset)."""
    import struct

    start = pos
    cookie = struct.unpack_from("<I", buf, pos)[0]
    if (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN:
        n = (cookie >> 16) + 1
        pos += 4
        run_bits = buf[pos : pos + (n + 7) // 8]
        pos += (n + 7) // 8
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        n = struct.unpack_from("<I", buf, pos + 4)[0]
        pos += 8
        run_bits = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"not a roaring bitmap (cookie {cookie})")
    desc = [
        struct.unpack_from("<HH", buf, pos + 4 * i) for i in range(n)
    ]
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # trust sequential layout; offsets are redundant
    values: list[int] = []
    for i, (key, card_m1) in enumerate(desc):
        card = card_m1 + 1
        hi = key << 16
        if run_bits[i >> 3] & (1 << (i & 7)):  # run container
            n_runs = struct.unpack_from("<H", buf, pos)[0]
            pos += 2
            for _ in range(n_runs):
                s, ln = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(hi | v for v in range(s, s + ln + 1))
        elif card > 4096:  # bitmap container
            chunk = buf[pos : pos + 8192]
            pos += 8192
            for byte_i, byte in enumerate(chunk):
                while byte:
                    low = byte & -byte
                    values.append(hi | (byte_i << 3) | low.bit_length() - 1)
                    byte ^= low
        else:  # array container
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(hi | v for v in vals)
    del start
    return values, pos


def serialize_dv(positions) -> bytes:
    """Delta RoaringBitmapArray, portable framing: the 64-bit position
    space splits into 32-bit chunks, each a portable roaring bitmap,
    stored densely for indexes 0..max_chunk."""
    import struct

    import numpy as np

    arr = np.asarray(
        list(positions) if not hasattr(positions, "dtype") else positions,
        dtype=np.uint64,
    )
    if arr.size == 0:
        return struct.pack("<IQ", _DV_MAGIC, 0)
    chunks = (arr >> np.uint64(32)).astype(np.uint32)
    lows = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    n = int(chunks.max()) + 1
    out = bytearray(struct.pack("<IQ", _DV_MAGIC, n))
    for i in range(n):
        out += serialize_roaring32(lows[chunks == i])
    return bytes(out)


def deserialize_dv(data: bytes) -> list[int]:
    import struct

    magic, n = struct.unpack_from("<IQ", data, 0)
    if magic != _DV_MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    values: list[int] = []
    for i in range(n):
        vals, pos = deserialize_roaring32(data, pos)
        values.extend((i << 32) | v for v in vals)
    return values


def _write_dv_file(
    location: str, blobs: dict[str, bytes]
) -> tuple[str, dict[str, tuple[int, int]]]:
    """Write ONE deletion-vector file holding every (rel -> serialized
    RoaringBitmapArray) of this export, per the spec's on-disk format.
    Returns (pathOrInlineDv for the descriptors, {rel: (offset, size)}).
    """
    import struct
    import zlib

    dv_uuid = uuid.uuid4()
    os.makedirs(os.path.join(location, _DV_DIR), exist_ok=True)
    fname = f"deletion_vector_{dv_uuid}.bin"
    path = os.path.join(location, _DV_DIR, fname)
    offsets: dict[str, tuple[int, int]] = {}
    with open(path, "wb") as f:
        f.write(b"\x01")  # format version
        at = 1
        for rel in sorted(blobs):
            data = blobs[rel]
            offsets[rel] = (at, len(data))
            f.write(struct.pack(">I", len(data)))
            f.write(data)
            f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            at += 4 + len(data) + 4
    return _DV_DIR + _b85_encode(dv_uuid.bytes), offsets


def _dv_abs_path(location: str, path_or_inline: str) -> str:
    """Resolve a 'u' descriptor: the last 20 chars are the Base85 UUID,
    anything before is the random prefix (a child dir of the table)."""
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    dv_uuid = uuid.UUID(bytes=_b85_decode(enc))
    parts = [location] + ([prefix] if prefix else [])
    return os.path.join(*parts, f"deletion_vector_{dv_uuid}.bin")


def _read_dv_positions(location: str, desc: dict) -> list[int]:
    """Dead row positions from an add action's deletionVector descriptor
    (storageType 'u' file slice or 'i' inline)."""
    import struct
    import zlib

    st = desc["storageType"]
    if st == "i":
        data = _b85_decode(desc["pathOrInlineDv"])
        return deserialize_dv(data[: desc["sizeInBytes"]])
    if st in ("u", "p"):
        path = (
            desc["pathOrInlineDv"]
            if st == "p"
            else _dv_abs_path(location, desc["pathOrInlineDv"])
        )
        with open(path, "rb") as f:
            f.seek(desc["offset"])
            (size,) = struct.unpack(">I", f.read(4))
            if size != desc["sizeInBytes"]:
                raise ValueError(
                    f"DV size mismatch at {path}:{desc['offset']}: "
                    f"{size} != {desc['sizeInBytes']}"
                )
            data = f.read(size)
            (crc,) = struct.unpack(">I", f.read(4))
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(f"DV checksum mismatch at {path}")
        return deserialize_dv(data)
    raise ValueError(f"unknown DV storageType {st!r}")


class DeltaUnexportableState(ValueError):
    """The lake state is not expressible in the Delta protocol (live
    MOR deltas/eq-deletes, or live files predating a column rename).
    Transient: compaction / clustered rewrite makes the table
    exportable; ``sync_delta`` skips these and catches up later."""


def _log_dir(location: str) -> str:
    return os.path.join(location, LOG_DIR)


def _commit_path(location: str, version: int) -> str:
    return os.path.join(_log_dir(location), f"{version:020d}.json")


def _current_delta_version(location: str) -> int:
    """Latest committed Delta version, -1 when never exported."""
    ldir = _log_dir(location)
    if not os.path.isdir(ldir):
        return -1
    versions = [
        int(n[:-5])
        for n in os.listdir(ldir)
        if len(n) == 25 and n.endswith(".json") and n[:20].isdigit()
    ]
    return max(versions, default=-1)


def _last_checkpoint(location: str) -> dict | None:
    p = os.path.join(_log_dir(location), "_last_checkpoint")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _read_commit(location: str, version: int) -> list[dict]:
    with open(_commit_path(location, version)) as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def _replay(
    location: str, version: int | None = None
) -> tuple[dict, dict, dict[str, dict], list[dict], int]:
    """Reconstruct table state at ``version`` (default: latest) from the
    log: (protocol, metaData, {path: add}, remove tombstones, version).

    Starts from the newest checkpoint at-or-before the target when one
    exists (O(commits since checkpoint) JSON reads), else from commit 0.
    """
    latest = _current_delta_version(location)
    if latest < 0:
        raise FileNotFoundError(f"no Delta log under {location}")
    v = latest if version is None else int(version)
    if v < 0 or v > latest:
        raise ValueError(
            f"Delta version {v} out of range [0, {latest}] at {location}"
        )
    protocol: dict = {}
    meta: dict = {}
    adds: dict[str, dict] = {}
    removes: dict[str, dict] = {}
    start = 0
    ckpt = _last_checkpoint(location)
    if ckpt and ckpt["version"] <= v:
        cv = int(ckpt["version"])
        protocol, meta, adds, removes = _read_checkpoint(location, cv)
        start = cv + 1
    for commit_v in range(start, v + 1):
        for action in _read_commit(location, commit_v):
            if "protocol" in action:
                protocol = action["protocol"]
            elif "metaData" in action:
                meta = action["metaData"]
            elif "add" in action:
                a = action["add"]
                adds[a["path"]] = a
                removes.pop(a["path"], None)
            elif "remove" in action:
                r = action["remove"]
                adds.pop(r["path"], None)
                removes[r["path"]] = r
    if not meta or not protocol:
        raise ValueError(
            f"Delta log at {location} replayed to v{v} without a "
            f"metaData/protocol action — corrupt or truncated log"
        )
    return protocol, meta, adds, list(removes.values()), v


def _lake_version_of(location: str, delta_version: int) -> int | None:
    for action in _read_commit(location, delta_version):
        if "commitInfo" in action:
            return action["commitInfo"].get("lakeVersion")
    return None


def _exported_lake_versions(location: str) -> dict[int, int]:
    """{lake version -> delta version} for every commit in the log."""
    latest = _current_delta_version(location)
    out: dict[int, int] = {}
    for dv in range(latest + 1):
        if not os.path.exists(_commit_path(location, dv)):
            continue  # cleaned below a checkpoint
        lv = _lake_version_of(location, dv)
        if lv is not None:
            out[int(lv)] = dv
    return out


def _file_stats_json(
    nrec: int,
    rel: str,
    bucket: str,
    snap,
    stats_cols: list[str],
    phys_of: dict[str, str] | None = None,
) -> str:
    """The add action's ``stats`` JSON (spec "Per-file Statistics"):
    numRecords always; min/maxValues for the table's stats_cols when the
    lake harvested them (base files only — same source as ``scan``).
    Under column mapping the spec keys stats by PHYSICAL name —
    ``phys_of`` maps logical->physical for renamed columns."""
    stats: dict[str, Any] = {"numRecords": nrec}
    fstats = snap.file_stats.get(bucket, {}).get(rel, {})
    mins = {}
    maxs = {}
    for col in stats_cols:
        mm = fstats.get(col)
        if mm and mm[0] is not None and mm[1] is not None:
            key = (phys_of or {}).get(col, col)
            mins[key] = mm[0]
            maxs[key] = mm[1]
    if mins:
        stats["minValues"] = mins
        stats["maxValues"] = maxs
    return json.dumps(stats, sort_keys=True)


def _physical_names(table, snap, rels: list[str]) -> dict[str, str]:
    """Per-column physical name consensus over LIVE files, for columns
    with a rename chain. Returns ``{logical: physical}`` only where the
    physical name differs (the column-mapping entries the export needs);
    empty when no mapping is required. Raises DeltaUnexportableState on
    the mixed-era state — the same logical column stored under two
    different physical names across live files — which column mapping
    cannot express (physicalName is per-column, not per-file). One
    footer pass over live files, run only when the table has renames.
    A DROPPED column's retired physical name is absent from
    schemaString, so extra physical columns in files are ignored."""
    live = {f.name for f in snap.schema.fields}
    renames = {
        cur: chain
        for cur, chain in (snap.properties.get("renames") or {}).items()
        if cur in live and chain
    }
    if not renames:
        return {}
    # every name that could physically hold a renamed column's values
    watch = {
        name: cur
        for cur, chain in renames.items()
        for name in [cur, *chain]
    }
    location = os.path.abspath(table.path)

    def present(path: str) -> list[str]:
        import pyarrow.parquet as pq

        names = set(pq.ParquetFile(path).schema_arrow.names)
        return [n for n in watch if n in names]

    from datax_spark.lake.stats import FILE_STATS_PARALLEL_THRESHOLD

    paths = [os.path.join(location, rel) for rel in rels]
    if len(paths) <= FILE_STATS_PARALLEL_THRESHOLD:
        seen = {n for p in paths for n in present(p)}
    else:
        sc = table.spark.sparkContext
        n_slices = max(1, min(len(paths) // 8, sc.defaultParallelism))
        seen = set(
            sc.parallelize(paths, n_slices)
            .flatMap(present)
            .distinct()
            .collect()
        )
    mapping: dict[str, str] = {}
    for cur, chain in renames.items():
        present_names = [n for n in [cur, *chain] if n in seen]
        if len(present_names) > 1:
            raise DeltaUnexportableState(
                f"column {cur!r} is stored under {sorted(present_names)} "
                f"across live files (written on both sides of a rename) "
                f"— Delta column mapping is per-column, not per-file, so "
                f"this state is inexpressible. rewrite_clustered() or "
                f"compact() to homogenize the files, then export"
            )
        # exactly one physical era (or the column is absent everywhere —
        # additive evolution; readers surface NULL either way)
        if present_names and present_names[0] != cur:
            mapping[cur] = present_names[0]
    return mapping


def _changed_buckets(snap, prior_snap) -> list[int] | None:
    """Bucket ids whose base/delta/eq-delete file lists differ between
    two snapshots — the ONLY buckets whose masks can have changed,
    because a key's rows, deltas and deletes all hash to one bucket.
    None (= recompute everything) when there is no prior snapshot or
    the bucket counts differ (a rebucket re-keys every file)."""
    if prior_snap is None:
        return None
    if snap.properties.get("num_buckets") != prior_snap.properties.get(
        "num_buckets"
    ):
        return None
    changed = []
    for b in (
        set(snap.buckets) | set(snap.deltas) | set(snap.eq_deletes)
        | set(prior_snap.buckets) | set(prior_snap.deltas)
        | set(prior_snap.eq_deletes)
    ):
        if (
            snap.buckets.get(b) != prior_snap.buckets.get(b)
            or snap.deltas.get(b) != prior_snap.deltas.get(b)
            or snap.eq_deletes.get(b) != prior_snap.eq_deletes.get(b)
        ):
            changed.append(int(b))
    return sorted(changed)


def _dead_rows_frame(
    table, snap, buckets: list[int] | None = None, keys=None
):
    """The (file path, row position) frame of every DEAD row in a live
    MOR state — the distributed half of ``_mor_file_masks``, split out
    so its physical plan can be pinned (PLANS.md §15): one key-window
    hash exchange, a broadcast join for eq-delete max-seq, never a
    sort-merge join. Returns None when the snapshot lists no files.

    ``buckets`` restricts the scan to those bucket ids — sound because
    liveness is a per-key property and every key's base rows, delta
    rows and eq-deletes hash to ONE bucket. Incremental exports pass
    the changed-bucket set (``_changed_buckets``) so per-batch mask
    cost is O(changed buckets), not O(table).

    - a base row dies when any delta row exists for its key, when an
      equality delete covers it (delete_seq >= coalesce(seq, -inf)),
      or when it is itself a tombstone;
    - a delta row dies unless it is its key's max-seq delta row, and
      even then to an eq-delete or its own delete op (inline tombstones
      mask out IN their own file — the encoding Iceberg's file-sequence
      model cannot express, DVs can).

    The scan is key-projected (never the payload columns) and reads
    ``_metadata.row_index`` — Spark's native parquet row index, the
    positions real Delta DV readers use."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField
    from pyspark.sql.window import Window

    from datax_spark.lake.mor import DELETE_OP, OP_META, SEQ_META, eq_delete_schema

    spark = table.spark
    location = os.path.abspath(table.path)
    key_cols = snap.properties["key_cols"]
    key_fields = [f for f in snap.schema.fields if f.name in key_cols]
    scan_schema = StructType(
        list(key_fields)
        + [StructField(SEQ_META, LongType()), StructField(OP_META, StringType())]
    )

    def scan(files: list[str], side: str):
        return (
            spark.read.schema(scan_schema)
            .parquet(*files)
            .select(
                *key_cols,
                F.col(SEQ_META).alias("_s"),
                F.col(OP_META).alias("_o"),
                F.lit(side).alias("_side"),
                F.regexp_replace(
                    F.col("_metadata.file_path"), "^file:/+", "/"
                ).alias("_fp"),
                F.col("_metadata.row_index").alias("_pos"),
            )
        )

    base_files = table._abs_files(snap, buckets, "base")
    delta_files = table._abs_files(snap, buckets, "delta")
    rows = None
    if base_files:
        rows = scan(base_files, "b")
    if delta_files:
        d = scan(delta_files, "d")
        rows = d if rows is None else rows.unionByName(d)
    if rows is None:
        return None
    if keys is not None:
        # restrict liveness evaluation to these keys BEFORE the window
        # — sound because liveness is key-local (a key's base rows,
        # deltas and eq-deletes all hash to one bucket and only its own
        # rows decide). The incremental mask path passes the appended
        # files' key set: only those keys can have NEWLY-dead rows.
        rows = rows.join(
            keys.select(*key_cols), on=key_cols, how="left_semi"
        )

    eq_files = table._abs_files(snap, buckets, "eq")
    if eq_files:
        eq = spark.read.schema(
            eq_delete_schema(snap.schema, key_cols)
        ).parquet(*eq_files)
        dmax = eq.groupBy(*key_cols).agg(F.max(SEQ_META).alias("_dmax"))
        rows = rows.join(F.broadcast(dmax), on=key_cols, how="left")
    else:
        rows = rows.withColumn("_dmax", F.lit(None).cast("long"))

    w = Window.partitionBy(*key_cols)
    delta_win = F.max(
        F.when(F.col("_side") == "d", F.col("_s"))
    ).over(w)
    not_eq_killed = F.col("_dmax").isNull() | (
        F.coalesce(F.col("_s"), F.lit(-(1 << 62))) > F.col("_dmax")
    )
    not_tombstone = F.coalesce(F.col("_o") != DELETE_OP, F.lit(True))
    wins = F.when(
        F.col("_side") == "b", delta_win.isNull()
    ).otherwise(F.col("_s") == delta_win)
    alive = F.coalesce(wins & not_eq_killed & not_tombstone, F.lit(False))
    return (
        rows.withColumn("_alive", alive)
        .filter(~F.col("_alive"))
        .select("_fp", "_pos")
    )


def _mor_file_masks(
    table, snap, buckets: list[int] | None = None, keys=None
) -> dict[str, tuple[bytes, int]]:
    """Per-file DEAD row positions of a live MOR state, as
    ``{rel_path: (serialized RoaringBitmapArray, cardinality)}`` —
    exactly the rows ``MorTable.read()`` would not surface (see
    ``_dead_rows_frame`` for the liveness rules and plan shape).

    One job: the dead-rows frame, then one exchange on file path for
    the bitmap build (an Arrow-batched mapInPandas running the
    pure-Python roaring writer on executors). Output is O(live files)
    driver rows; mask volume is bounded by data superseded since the
    last compaction — the same rows a compaction would drop, which is
    what DV generation inherently costs in any engine."""
    location = os.path.abspath(table.path)
    dead = _dead_rows_frame(table, snap, buckets, keys=keys)
    if dead is None:
        return {}
    return _collect_masks(dead, location)


def _collect_masks(dead, location: str) -> dict[str, tuple[bytes, int]]:
    """Run the per-file bitmap build over a dead-rows frame and collect
    ``{rel_path: (serialized DV, cardinality)}`` (the distributed half
    shared by the full and incremental mask paths)."""

    def build(pdfs):
        # accumulate ACROSS the partition's Arrow batches before
        # serializing — one DV per file (round 5: the per-batch yield
        # produced hundreds of partial DVs per file that the driver
        # then deserialize/merge/re-serialized, the dvd apply family's
        # hottest profile line). repartition("_fp") already co-locates
        # a file's rows; the driver merge arm below stays as a
        # correctness backstop only.
        import numpy as np
        import pandas as pd

        acc: dict[str, list] = {}
        for pdf in pdfs:
            for fp, grp in pdf.groupby("_fp"):
                acc.setdefault(fp, []).append(
                    grp["_pos"].to_numpy(dtype=np.uint64)
                )
        if not acc:
            return
        rows = {"fp": [], "dv": [], "card": []}
        for fp, parts in acc.items():
            pos = np.unique(np.concatenate(parts))
            rows["fp"].append(fp)
            rows["dv"].append(serialize_dv(pos))
            rows["card"].append(int(pos.size))
        yield pd.DataFrame(rows)

    per_file = (
        dead.repartition("_fp")
        .mapInPandas(build, "fp string, dv binary, card long")
        .collect()
    )
    prefix = location + "/"
    out: dict[str, tuple[bytes, int]] = {}
    for r in per_file:
        fp = r["fp"]
        rel = fp[len(prefix):] if fp.startswith(prefix) else fp
        if rel in out:  # same file split across arrow batches: merge
            prev, _ = out[rel]
            merged = sorted(
                set(deserialize_dv(prev)) | set(deserialize_dv(r["dv"]))
            )
            out[rel] = (serialize_dv(merged), len(merged))
        else:
            out[rel] = (bytes(r["dv"]), int(r["card"]))
    return out


def _appended_keys_span(table, prior_snap, snap):
    """Key frame of every file appended between two lake versions, or
    None when the span is not eligible for incremental masking: any
    pair fails the append-only gate (a rewrite resets masks — full
    recompute is REQUIRED there), or any pair's byte gate says the
    batch is bulk-shaped (restricting would cost more than the full
    window — the same economics as the change-feed gate)."""
    from datax_spark.lake.mor import eq_delete_schema

    added_delta: list[str] = []
    added_eq: list[str] = []
    for v in range(int(prior_snap.version), int(snap.version)):
        old_s, new_s = table.snapshot(v), table.snapshot(v + 1)
        if new_s.rewrite_only:
            return None  # a rewrite swapped files: masks reset
        res = table._appended_files(old_s, new_s)
        if res is None or not res[2]:
            return None
        added_delta.extend(res[0])
        added_eq.extend(res[1])
    if not added_delta and not added_eq:
        return None
    key_cols = snap.properties["key_cols"]
    renames = snap.properties.get("renames")
    parts = []
    if added_delta:
        parts.append(
            table._read_files(
                [os.path.join(table.path, r) for r in added_delta],
                snap.schema, renames,
            ).select(*key_cols)
        )
    if added_eq:
        parts.append(
            table._read_files(
                [os.path.join(table.path, r) for r in added_eq],
                eq_delete_schema(snap.schema, key_cols),
            ).select(*key_cols)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def _mor_file_masks_incremental(
    table, snap, buckets, keys, prior_adds: dict, location: str
) -> dict[str, tuple[bytes, int]]:
    """Masks for an append-only span as prior-mask ∪ newly-dead.

    Masks are MONOTONE between rewrites (the invariant the export's
    equal-cardinality descriptor reuse already relies on): under
    append-only commits a dead row can never revive, and only keys in
    the appended files can have newly-dead rows. So the dead-rows job
    runs key-restricted (O(batch), broadcastable) and each touched
    file's mask is the set union with its prior deserialized DV —
    byte-identical to the full recompute because the serialization is
    canonical in the position set. Raises nothing: any trouble reading
    a prior DV (vacuumed early, tampered) falls back to the caller's
    full recompute via KeyError/OSError propagation."""
    import numpy as np

    dead = _dead_rows_frame(table, snap, buckets, keys=keys)
    new_masks: dict[str, tuple[bytes, int]] = {}
    if dead is not None:
        new_masks = _collect_masks(dead, location)
    prior_dv_of = {
        urllib.parse.unquote(enc): a["deletionVector"]
        for enc, a in prior_adds.items()
        if a.get("deletionVector")
    }
    out: dict[str, tuple[bytes, int]] = {}
    for rel, (dv, card) in new_masks.items():
        prior_desc = prior_dv_of.get(rel)
        if prior_desc is None:
            out[rel] = (dv, card)
            continue
        prior_pos = np.asarray(
            _read_dv_positions(location, prior_desc), dtype=np.uint64
        )
        merged = np.union1d(
            prior_pos,
            np.asarray(deserialize_dv(dv), dtype=np.uint64),
        )
        out[rel] = (serialize_dv(merged), int(merged.size))
    return out


def _mapped_schema_json(
    schema: StructType, phys_of: dict[str, str], prior_meta: dict
) -> tuple[dict, int]:
    """schemaString JSON with spec column-mapping field metadata
    (``delta.columnMapping.id`` / ``.physicalName``) on EVERY field, and
    the resulting maxColumnId. Field ids are stable across exports: a
    prior export's id is reused when its physical name matches (the
    anchor that survives a lake rename — logical changes, physical
    stays) or, failing that, its logical name (the anchor that survives
    a rewrite — physical flips to current, logical stays); genuinely
    new columns get maxColumnId+1."""
    prior_by_phys: dict[str, int] = {}
    prior_by_logical: dict[str, int] = {}
    max_id = 0
    if prior_meta and prior_meta.get("schemaString"):
        for f in json.loads(prior_meta["schemaString"]).get("fields", []):
            md = f.get("metadata") or {}
            fid = md.get("delta.columnMapping.id")
            if fid is None:
                continue
            prior_by_phys[md.get("delta.columnMapping.physicalName", f["name"])] = fid
            prior_by_logical[f["name"]] = fid
            max_id = max(max_id, int(fid))
    fields = []
    for f in schema.fields:
        phys = phys_of.get(f.name, f.name)
        fid = prior_by_phys.get(phys, prior_by_logical.get(f.name))
        if fid is None:
            max_id += 1
            fid = max_id
        else:
            max_id = max(max_id, int(fid))
        j = f.jsonValue()
        j["metadata"] = {
            **(j.get("metadata") or {}),
            "delta.columnMapping.id": int(fid),
            "delta.columnMapping.physicalName": phys,
        }
        fields.append(j)
    return {"type": "struct", "fields": fields}, max_id


def _write_cdf_files(
    table, location: str, prior_lake_v: int | None, snap, next_dv: int,
    phys_of: dict[str, str] | None = None,
) -> list[dict]:
    """Write the spec CHANGE DATA files for this export — the row-level
    changes between the last mirrored lake version and this one
    (``LakeTable.read_changes``: diffs only buckets whose manifests
    changed), as parquet under ``_change_data/`` with the table columns
    plus ``_change_type`` in (insert, delete, update_preimage,
    update_postimage) — the exact vocabulary real Delta CDF readers
    expect (the lake's own feed already speaks it). Returns the commit's
    ``cdc`` actions (one per part file; Spark-parallel write, no driver
    materialization). An export spanning several lake commits folds
    their per-commit changes into this one mirror commit's feed."""
    from pyspark.sql import functions as F

    if prior_lake_v is None:
        # masked bootstrap (a MOR first export): the resolved state IS
        # the insert set — the add-derivation fallback can't be used
        # because the adds carry deletion vectors
        changes = table.read(version=int(snap.version)).withColumn(
            "_change_type", F.lit("insert")
        )
    else:
        changes = table.read_changes(prior_lake_v, int(snap.version)).drop(
            "_commit_version"
        )
    for logical, physical in (phys_of or {}).items():
        if logical in changes.columns:
            changes = changes.withColumnRenamed(logical, physical)
    out_dir = os.path.join(location, CDF_DIR, f"cdf-{next_dv:020d}")
    changes.write.mode("overwrite").parquet(out_dir)
    del F
    actions: list[dict] = []
    for name in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, name)
        if not name.endswith(".parquet"):
            os.unlink(full)  # _SUCCESS / .crc droppings
            continue
        rel = f"{CDF_DIR}/cdf-{next_dv:020d}/{name}"
        actions.append(
            {
                "cdc": {
                    "path": urllib.parse.quote(rel, safe="/=-"),
                    "partitionValues": {},
                    "size": os.path.getsize(full),
                    "dataChange": False,
                }
            }
        )
    return actions


def export_delta(
    table,
    version: int | None = None,
    checkpoint_interval: int = 10,
    change_data: bool = False,
) -> str:
    """Publish ``table``'s snapshot as the next Delta Lake commit under
    ``<table.path>/_delta_log/`` (in-place: data files referenced where
    they already live). Repeat calls after further lake commits append
    incremental Delta versions — only files added/removed since the
    last export produce actions, and every ``checkpoint_interval``-th
    commit writes a spec checkpoint so replay stays O(recent commits).

    Renamed columns whose live files all still carry ONE retired
    physical name export through spec column mapping (mode ``name``,
    protocol 2/5) — see ``_physical_names``.

    Returns the path of the new commit JSON. Raises
    DeltaUnexportableState for live MOR deltas/eq-deletes and for a
    renamed column stored under two physical names across live files;
    ValueError for branches, an already exported lake version, or a
    lake version older than the mirror's newest (the Delta log is
    linear)."""
    if getattr(table, "branch", None) is not None:
        raise ValueError(
            "export_delta publishes MAIN versions only: a branch's "
            "version numbers are a separate namespace — publish_branch() "
            "first, then export"
        )
    snap = table.snapshot(version)
    mor_live = any(snap.deltas.values()) or any(snap.eq_deletes.values())
    if mor_live and snap.properties.get("mor_patch"):
        raise DeltaUnexportableState(
            "patch (partial-column) deltas are live: a Delta data file "
            "row is a full image and deletion vectors only REMOVE rows, "
            "so column-coalescing patch resolution is inexpressible — "
            "compact() to fold the patches, then export"
        )
    location = os.path.abspath(table.path)
    ldir = _log_dir(location)
    os.makedirs(ldir, exist_ok=True)
    now_ms = int(time.time() * 1000)

    prev_dv = _current_delta_version(location)
    next_dv = prev_dv + 1
    prior_adds: dict[str, dict] = {}
    prior_meta: dict = {}
    prior_protocol: dict = {}
    prior_lake_v: int | None = None
    if prev_dv >= 0:
        exported = _exported_lake_versions(location)
        prior_lake_v = max(exported) if exported else None
        if exported and int(snap.version) < max(exported):
            raise ValueError(
                f"lake version {snap.version} is older than the newest "
                f"mirrored version {max(exported)} — the Delta log is "
                f"linear; time travel reads go through read_delta()"
            )
        if int(snap.version) in exported:
            raise ValueError(
                f"lake version {snap.version} already exported as Delta "
                f"version {exported[int(snap.version)]}"
            )
        prior_protocol, prior_meta, prior_adds, _removes, _v = _replay(
            location
        )

    rels = [
        (b, rel)
        for b, files in sorted(snap.buckets.items(), key=lambda kv: int(kv[0]))
        for rel in files
    ] + [
        (b, rel)
        for b, files in sorted(snap.deltas.items(), key=lambda kv: int(kv[0]))
        for rel in files
    ]
    phys_of = _physical_names(table, snap, [rel for _, rel in rels])
    prior_cfg = (prior_meta.get("configuration") or {}) if prior_meta else {}
    # column mapping, once enabled, never disables (spec) — even after a
    # rewrite homogenizes files under current names, later exports keep
    # mode=name with physicalName == logical
    mapped = bool(phys_of) or (
        prior_cfg.get("delta.columnMapping.mode") == "name"
    )
    # live-MOR: deletion vectors mask every row the resolved read hides
    # (superseded base rows, non-latest delta rows, inline tombstones,
    # eq-deleted rows); delta files ride as data files. Like column
    # mapping, the feature never downgrades once the log has used it.
    # Incremental exports recompute masks only for buckets whose file
    # lists changed since the last mirrored lake version — unchanged
    # buckets keep their prior descriptors (O(changed buckets), not
    # O(table), per batch; full recompute when the prior snapshot was
    # vacuumed away).
    masks: dict[str, tuple[bytes, int]] = {}
    if mor_live:
        changed = None
        keys = None
        if prior_lake_v is not None:
            try:
                prior_snap = table.snapshot(prior_lake_v)
                changed = _changed_buckets(snap, prior_snap)
                # small append-only spans mask INCREMENTALLY: the
                # dead-rows job restricts to the appended files' keys
                # (O(batch)) and each touched file's mask unions with
                # its prior DV — sound because masks are monotone
                # between rewrites (the invariant the descriptor-reuse
                # below already depends on)
                keys = _appended_keys_span(table, prior_snap, snap)
            except Exception:
                changed = keys = None
        if keys is not None:
            try:
                masks = _mor_file_masks_incremental(
                    table, snap, changed, keys, prior_adds, location
                )
            except Exception:
                masks = _mor_file_masks(table, snap, changed)
        else:
            masks = _mor_file_masks(table, snap, changed)
    dv_mode = bool(masks) or "deletionVectors" in (
        prior_protocol.get("readerFeatures") or []
    )

    # MOR tables mirror the RESOLVED view: payload columns only — the
    # engine's _seq/_op/_patch markers are private (read() drops them)
    if snap.properties.get("table_mode") == "mor":
        from datax_spark.lake.mor import META_COLS

        export_schema = StructType(
            [f for f in snap.schema.fields if f.name not in META_COLS]
        )
    else:
        export_schema = snap.schema

    # ---- actions
    actions: list[dict] = [
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE",
                "operationParameters": {"mode": "Append"},
                "lakeVersion": int(snap.version),
                "engineInfo": "datax_spark lake mirror",
            }
        }
    ]
    if dv_mode:
        rf = set(prior_protocol.get("readerFeatures") or [])
        wf = set(prior_protocol.get("writerFeatures") or [])
        rf.add("deletionVectors")
        wf.update({"appendOnly", "invariants", "deletionVectors"})
        if mapped:
            rf.add("columnMapping")
            wf.add("columnMapping")
        protocol = {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": sorted(rf),
            "writerFeatures": sorted(wf),
        }
    elif mapped:
        protocol = {"minReaderVersion": 2, "minWriterVersion": 5}
    else:
        protocol = {"minReaderVersion": 1, "minWriterVersion": 2}
    if prev_dv < 0 or protocol != prior_protocol:
        actions.append({"protocol": protocol})

    configuration: dict[str, str] = dict(prior_cfg)
    if mapped:
        schema_json, max_id = _mapped_schema_json(
            export_schema, phys_of, prior_meta
        )
        configuration["delta.columnMapping.mode"] = "name"
        configuration["delta.columnMapping.maxColumnId"] = str(max_id)
    else:
        schema_json = export_schema.jsonValue()
    if dv_mode:
        configuration["delta.enableDeletionVectors"] = "true"
    # CDF: once the table property is set it stays (real Delta keeps the
    # property until explicitly unset) — later exports keep emitting
    # change data even when the caller forgets the flag
    cdf_mode = change_data or (
        prior_cfg.get("delta.enableChangeDataFeed") == "true"
    )
    if cdf_mode:
        configuration["delta.enableChangeDataFeed"] = "true"
    schema_string = json.dumps(schema_json, sort_keys=True)
    if (
        not prior_meta
        or prior_meta.get("schemaString") != schema_string
        or prior_cfg != configuration
    ):
        actions.append(
            {
                "metaData": {
                    "id": prior_meta.get("id") or str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_string,
                    "partitionColumns": [],
                    "configuration": configuration,
                    "createdTime": prior_meta.get("createdTime", now_ms),
                }
            }
        )

    enc_of = {
        rel: urllib.parse.quote(rel, safe="/=") for _, rel in rels
    }
    live_enc = set(enc_of.values())
    for path in sorted(set(prior_adds) - live_enc):
        actions.append(
            {
                "remove": {
                    "path": path,
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }
            }
        )
    # ---- one DV file per export holding every mask; descriptors point
    # at per-DV offsets inside it ('u' storageType, table-relative)
    dv_descs: dict[str, dict] = {}
    if masks:
        path_or_inline, offs = _write_dv_file(
            location, {rel: dv for rel, (dv, _c) in masks.items()}
        )
        for rel, (_dv, card) in masks.items():
            off, size = offs[rel]
            dv_descs[rel] = {
                "storageType": "u",
                "pathOrInlineDv": path_or_inline,
                "offset": off,
                "sizeInBytes": size,
                "cardinality": card,
            }
    stats_cols = snap.properties.get("stats_cols") or []
    new_rels = [
        (b, rel) for b, rel in rels if enc_of[rel] not in prior_adds
    ]
    from datax_spark.lake.iceberg import _record_counts

    abs_of = {rel: os.path.join(location, rel) for _, rel in new_rels}
    counts = _record_counts(table.spark, list(abs_of.values()))
    for b, rel in new_rels:
        apath = abs_of[rel]
        add = {
            "path": enc_of[rel],
            "partitionValues": {},
            "size": os.path.getsize(apath),
            "modificationTime": int(os.path.getmtime(apath) * 1000),
            "dataChange": True,
            "stats": _file_stats_json(
                counts[apath], rel, b, snap, stats_cols, phys_of
            ),
        }
        if rel in dv_descs:
            add["deletionVector"] = dv_descs[rel]
        actions.append({"add": add})
    # previously-exported files whose mask GREW (a new batch superseded
    # more of their rows) re-emit with the new descriptor; masks are
    # monotone until a rewrite swaps the file, so equal cardinality
    # means equal mask and the prior descriptor stays valid
    for _b, rel in rels:
        enc = enc_of[rel]
        if enc not in prior_adds or rel not in dv_descs:
            continue
        prior_card = (
            prior_adds[enc].get("deletionVector") or {}
        ).get("cardinality")
        if prior_card != dv_descs[rel]["cardinality"]:
            actions.append(
                {
                    "add": {
                        **prior_adds[enc],
                        "deletionVector": dv_descs[rel],
                        "dataChange": True,
                    }
                }
            )

    # ---- change data files (CDF): an append-shaped bootstrap export
    # writes none — a reader derives its inserts from the version-0 add
    # actions (the spec's append-only fallback); a MASKED bootstrap
    # (MOR with DVs) and every later export record the feed explicitly
    if cdf_mode and (prior_lake_v is not None or masks):
        actions.extend(
            _write_cdf_files(
                table, location, prior_lake_v, snap, next_dv,
                phys_of if mapped else None,
            )
        )

    # ---- publish: O_EXCL create is the spec's mutual-exclusion
    # primitive (two racing exporters -> exactly one wins this version)
    commit_path = _commit_path(location, next_dv)
    body = "".join(json.dumps(a, sort_keys=True) + "\n" for a in actions)
    fd = os.open(commit_path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    try:
        os.write(fd, body.encode())
    finally:
        os.close(fd)

    if checkpoint_interval and (next_dv + 1) % checkpoint_interval == 0:
        checkpoint_delta(location)
    return commit_path


# ---------------------------------------------------------------------------
# checkpoints (spec "Checkpoints": classic single-file parquet)
# ---------------------------------------------------------------------------


def _checkpoint_schema() -> Any:
    import pyarrow as pa

    return pa.schema(
        [
            pa.field(
                "protocol",
                pa.struct(
                    [
                        pa.field("minReaderVersion", pa.int32()),
                        pa.field("minWriterVersion", pa.int32()),
                        pa.field("readerFeatures", pa.list_(pa.string())),
                        pa.field("writerFeatures", pa.list_(pa.string())),
                    ]
                ),
            ),
            pa.field(
                "metaData",
                pa.struct(
                    [
                        pa.field("id", pa.string()),
                        pa.field(
                            "format",
                            pa.struct(
                                [
                                    pa.field("provider", pa.string()),
                                    pa.field(
                                        "options",
                                        pa.map_(pa.string(), pa.string()),
                                    ),
                                ]
                            ),
                        ),
                        pa.field("schemaString", pa.string()),
                        pa.field(
                            "partitionColumns", pa.list_(pa.string())
                        ),
                        pa.field(
                            "configuration",
                            pa.map_(pa.string(), pa.string()),
                        ),
                        pa.field("createdTime", pa.int64()),
                    ]
                ),
            ),
            pa.field(
                "add",
                pa.struct(
                    [
                        pa.field("path", pa.string()),
                        pa.field(
                            "partitionValues",
                            pa.map_(pa.string(), pa.string()),
                        ),
                        pa.field("size", pa.int64()),
                        pa.field("modificationTime", pa.int64()),
                        pa.field("dataChange", pa.bool_()),
                        pa.field("stats", pa.string()),
                        pa.field(
                            "deletionVector",
                            pa.struct(
                                [
                                    pa.field("storageType", pa.string()),
                                    pa.field("pathOrInlineDv", pa.string()),
                                    pa.field("offset", pa.int64()),
                                    pa.field("sizeInBytes", pa.int64()),
                                    pa.field("cardinality", pa.int64()),
                                ]
                            ),
                        ),
                    ]
                ),
            ),
            pa.field(
                "remove",
                pa.struct(
                    [
                        pa.field("path", pa.string()),
                        pa.field("deletionTimestamp", pa.int64()),
                        pa.field("dataChange", pa.bool_()),
                    ]
                ),
            ),
        ]
    )


def checkpoint_delta(location: str) -> str:
    """Write the spec checkpoint for the log's current version:
    ``<v>.checkpoint.parquet`` holding the complete replay state
    (protocol + metaData + every live add + unexpired remove
    tombstones), then point ``_last_checkpoint`` at it. Replay after
    this is O(commits since here). Driver-side pyarrow write — the
    checkpoint is O(live files) rows of metadata, the same scale class
    as the lake's own manifest handling."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    location = os.path.abspath(location)
    protocol, meta, adds, removes, v = _replay(location)
    now_ms = int(time.time() * 1000)
    rows: list[dict] = [
        {"protocol": protocol},
        {"metaData": {**meta, "format": {
            "provider": meta["format"]["provider"],
            "options": list((meta["format"].get("options") or {}).items()),
        }, "configuration": list((meta.get("configuration") or {}).items()),
        }},
    ]
    for a in adds.values():
        rows.append(
            {"add": {**a, "partitionValues": list(
                (a.get("partitionValues") or {}).items()
            )}}
        )
    for r in removes:
        if now_ms - r["deletionTimestamp"] <= TOMBSTONE_RETENTION_MS:
            rows.append({"remove": r})
    table = pa.Table.from_pylist(rows, schema=_checkpoint_schema())
    ckpt_path = os.path.join(
        _log_dir(location), f"{v:020d}.checkpoint.parquet"
    )
    tmp = ckpt_path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, ckpt_path)
    hint = os.path.join(_log_dir(location), "_last_checkpoint")
    with open(hint + ".tmp", "w") as f:
        json.dump({"version": v, "size": len(rows)}, f)
    os.replace(hint + ".tmp", hint)
    return ckpt_path


def _read_checkpoint(
    location: str, version: int
) -> tuple[dict, dict, dict[str, dict], dict[str, dict]]:
    import pyarrow.parquet as pq

    path = os.path.join(
        _log_dir(location), f"{version:020d}.checkpoint.parquet"
    )
    protocol: dict = {}
    meta: dict = {}
    adds: dict[str, dict] = {}
    removes: dict[str, dict] = {}
    for row in pq.read_table(path).to_pylist():
        if row.get("protocol"):
            # strip the Nones pyarrow fills for absent optional fields so
            # the dict compares equal to its commit-JSON form
            protocol = {
                k: v for k, v in row["protocol"].items() if v is not None
            }
        elif row.get("metaData"):
            m = dict(row["metaData"])
            m["format"] = {
                "provider": m["format"]["provider"],
                "options": dict(m["format"].get("options") or []),
            }
            m["configuration"] = dict(m.get("configuration") or [])
            meta = m
        elif row.get("add"):
            a = dict(row["add"])
            a["partitionValues"] = dict(a.get("partitionValues") or [])
            if a.get("deletionVector") is None:
                a.pop("deletionVector", None)
            adds[a["path"]] = a
        elif row.get("remove"):
            removes[row["remove"]["path"]] = row["remove"]
    return protocol, meta, adds, removes


def _referenced_dv_files(location: str) -> set[str]:
    """Absolute paths of every DV file any still-readable log artifact
    references: all surviving commit JSONs plus all surviving
    checkpoints (time travel to any version >= the last checkpoint
    replays intermediate commits, so intermediate descriptors count)."""
    refs: set[str] = set()

    def take(action_body: dict | None):
        d = (action_body or {}).get("deletionVector")
        if not d:
            return
        st = d.get("storageType")
        if st == "u":
            refs.add(os.path.abspath(_dv_abs_path(location, d["pathOrInlineDv"])))
        elif st == "p":
            refs.add(os.path.abspath(d["pathOrInlineDv"]))

    ldir = _log_dir(location)
    for name in os.listdir(ldir):
        if name.endswith(".json") and name[:20].isdigit():
            for action in _read_commit(location, int(name[:20])):
                take(action.get("add"))
                take(action.get("remove"))
        elif name.endswith(".checkpoint.parquet") and name[:20].isdigit():
            _p, _m, adds, removes = _read_checkpoint(
                location, int(name[:20])
            )
            for a in adds.values():
                take(a)
            for r in removes.values():
                take(r)
    return refs


def clean_delta_log(
    location: str, dv_min_age_sec: float = 0.0
) -> dict[str, int]:
    """Delete commit JSONs (and older checkpoints) strictly below the
    last checkpoint — the ``delta.logRetentionDuration`` cleanup.
    Readers start at the checkpoint, so current reads and reads of any
    version >= it are unaffected; time travel BELOW the checkpoint is
    what's traded away (the spec's own retention semantics). No-op when
    no checkpoint exists.

    Also reclaims DELETION-VECTOR files no surviving log artifact
    references (real Delta VACUUM's DV cleanup): under continuous
    ``sync_delta`` each export with live masks writes one DV file, and
    the next export supersedes its descriptors — without this the
    ``_dv/`` directory grows one file per batch forever. An in-flight
    export stages its DV file BEFORE its commit JSON publishes, so a
    clean racing a live exporter must set ``dv_min_age_sec`` above the
    worst-case stage->publish latency (the lake ``vacuum`` min-age
    contract); 0 is only safe with exports quiesced."""
    import time as _time

    location = os.path.abspath(location)
    ckpt = _last_checkpoint(location)
    if not ckpt:
        return {
            "removed_commits": 0,
            "removed_checkpoints": 0,
            "removed_dv_files": 0,
        }
    cv = int(ckpt["version"])
    ldir = _log_dir(location)
    removed_c = removed_k = 0
    for name in sorted(os.listdir(ldir)):
        if name.endswith(".json") and name[:20].isdigit():
            if int(name[:20]) < cv:
                os.unlink(os.path.join(ldir, name))
                removed_c += 1
        elif name.endswith(".checkpoint.parquet") and name[:20].isdigit():
            if int(name[:20]) < cv:
                os.unlink(os.path.join(ldir, name))
                removed_k += 1
    removed_dv = 0
    now = _time.time()
    dv_dir = os.path.join(location, _DV_DIR)
    if os.path.isdir(dv_dir):
        refs = _referenced_dv_files(location)
        for name in sorted(os.listdir(dv_dir)):
            if not name.startswith("deletion_vector_"):
                continue
            path = os.path.join(dv_dir, name)
            if os.path.abspath(path) in refs:
                continue
            if dv_min_age_sec > 0 and (
                now - os.path.getmtime(path) < dv_min_age_sec
            ):
                continue
            os.unlink(path)
            removed_dv += 1
    # change-data files: referenced only by commit JSONs (checkpoints
    # never carry cdc actions, per spec) — cleaning commits below the
    # checkpoint bounds table_changes to log retention and frees their
    # feed files here
    removed_cdf = 0
    cdf_root = os.path.join(location, CDF_DIR)
    if os.path.isdir(cdf_root):
        cdf_refs: set[str] = set()
        for name in os.listdir(ldir):
            if name.endswith(".json") and name[:20].isdigit():
                for action in _read_commit(location, int(name[:20])):
                    if "cdc" in action:
                        cdf_refs.add(
                            os.path.abspath(
                                os.path.join(
                                    location,
                                    urllib.parse.unquote(
                                        action["cdc"]["path"]
                                    ),
                                )
                            )
                        )
        for sub in sorted(os.listdir(cdf_root)):
            subdir = os.path.join(cdf_root, sub)
            if not os.path.isdir(subdir):
                continue
            for fname in sorted(os.listdir(subdir)):
                fpath = os.path.join(subdir, fname)
                if os.path.abspath(fpath) in cdf_refs:
                    continue
                if dv_min_age_sec > 0 and (
                    now - os.path.getmtime(fpath) < dv_min_age_sec
                ):
                    continue
                os.unlink(fpath)
                removed_cdf += 1
            if not os.listdir(subdir):
                os.rmdir(subdir)
    return {
        "removed_commits": removed_c,
        "removed_checkpoints": removed_k,
        "removed_dv_files": removed_dv,
        "removed_cdf_files": removed_cdf,
    }


# ---------------------------------------------------------------------------
# read / sync / retention coupling
# ---------------------------------------------------------------------------


def _stats_may_match(
    stats_json: str | None,
    filters: list,
    key_of: dict[str, str],
) -> bool:
    """Per-file pruning against an add action's stats JSON
    (minValues/maxValues): False only when a clause PROVABLY excludes
    every row. Missing stats, columns or unknown ops fail open — the
    residual predicate still applies row-level."""
    if not stats_json:
        return True
    try:
        st = json.loads(stats_json)
    except ValueError:
        return True
    mins, maxs = st.get("minValues") or {}, st.get("maxValues") or {}
    for col, op, val in filters:
        key = key_of.get(col, col)
        lo, hi = mins.get(key), maxs.get(key)
        if lo is None or hi is None:
            continue
        # incomparable types (numeric filter on a string column,
        # string-encoded stats) fail OPEN — the residual Spark
        # predicate handles the casts row-level (ADVICE r4)
        try:
            if op == "=" and not (lo <= val <= hi):
                return False
            if op == ">=" and hi < val:
                return False
            if op == ">" and hi <= val:
                return False
            if op == "<=" and lo > val:
                return False
            if op == "<" and lo >= val:
                return False
        except TypeError:
            continue
    return True


def read_delta(
    spark: SparkSession,
    location: str,
    version: int | None = None,
    lake_version: int | None = None,
    filters: list | None = None,
) -> DataFrame:
    """Read a Delta table location purely from its ``_delta_log`` —
    time travel by Delta ``version`` or by ``lake_version`` (resolved
    through the commitInfo mapping this exporter records). The scan is
    an explicit-file parquet read under the metaData schemaString, so
    files written before an additive evolution surface NULLs in new
    columns — the same name-based semantics real minReader-1 Delta
    readers have.

    ``filters`` (the plan_scan grammar, ops ``= < <= > >= in``) prunes
    files by each add action's per-file stats JSON (minValues/
    maxValues, recorded at export for the lake's ``stats_cols``; keyed
    by PHYSICAL name under column mapping) and applies the same
    predicate row-level — exactly the data-skipping real Delta readers
    do from the log, so the filtered read opens only files that can
    match while results stay exact."""
    location = os.path.abspath(location)
    if lake_version is not None:
        if version is not None:
            raise ValueError("pass version OR lake_version, not both")
        exported = _exported_lake_versions(location)
        if int(lake_version) not in exported:
            raise ValueError(
                f"lake version {lake_version} was never exported "
                f"(mirrored: {sorted(exported)})"
            )
        version = exported[int(lake_version)]
    _protocol, meta, adds, _removes, _v = _replay(location, version)
    schema_json = json.loads(meta["schemaString"])
    schema = StructType.fromJson(schema_json)
    mapped = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode"
    ) == "name"
    if not adds:
        out_schema = StructType(
            [
                type(f)(f.name, f.dataType, f.nullable)
                for f in schema.fields
            ]
        )
        return spark.createDataFrame([], out_schema)
    abs_of = {
        p: os.path.join(location, urllib.parse.unquote(p))
        for p in sorted(adds)
    }
    paths = [abs_of[p] for p in sorted(adds)]
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField

    # physical scan schema + logical selects: identity without column
    # mapping, physicalName-resolved under mode=name
    phys_fields = []
    selects = []
    for f, j in zip(schema.fields, schema_json["fields"]):
        phys = (
            (j.get("metadata") or {}).get(
                "delta.columnMapping.physicalName", f.name
            )
            if mapped
            else f.name
        )
        phys_fields.append(StructField(phys, f.dataType, True))
        selects.append(F.col(phys).alias(f.name))
    reader = spark.read.schema(StructType(phys_fields))

    _OPS = {
        "=": lambda c, v: c == F.lit(v),
        "<": lambda c, v: c < F.lit(v),
        "<=": lambda c, v: c <= F.lit(v),
        ">": lambda c, v: c > F.lit(v),
        ">=": lambda c, v: c >= F.lit(v),
        "in": lambda c, v: c.isin(list(v)),
    }

    def _residual(d: DataFrame) -> DataFrame:
        for col, op, val in filters or []:
            if op not in _OPS:
                raise ValueError(f"unsupported filter op {op!r}")
            d = d.filter(_OPS[op](F.col(col), val))
        return d

    if filters:
        key_of = {
            f.name: pf.name for f, pf in zip(schema.fields, phys_fields)
        }
        kept = {
            p: a
            for p, a in adds.items()
            if _stats_may_match(a.get("stats"), filters, key_of)
        }
        adds = kept
        paths = [abs_of[p] for p in sorted(adds)]
        if not paths:
            return _residual(
                spark.createDataFrame(
                    [],
                    StructType(
                        [
                            type(f)(f.name, f.dataType, True)
                            for f in schema.fields
                        ]
                    ),
                )
            )

    dv_adds = {p: a for p, a in adds.items() if a.get("deletionVector")}
    if not dv_adds:
        return _residual(reader.parquet(*paths).select(*selects))
    # deletion vectors: anti-join the masked (file, row position) pairs.
    # The pair list is driver-built from the DV bitmaps — its volume is
    # the data superseded since the last compaction (what a real reader
    # also materializes as per-file position masks during the scan).
    dead_pairs = [
        (abs_of[p], int(pos))
        for p, a in dv_adds.items()
        for pos in _read_dv_positions(location, a["deletionVector"])
    ]
    dead_df = spark.createDataFrame(dead_pairs, "_fp string, _pos long")
    df = reader.parquet(*paths).select(
        *selects,
        F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/").alias(
            "_fp"
        ),
        F.col("_metadata.row_index").alias("_pos"),
    )
    return _residual(
        df.join(
            F.broadcast(dead_df), on=["_fp", "_pos"], how="left_anti"
        ).drop("_fp", "_pos")
    )


def read_delta_changes(
    spark: SparkSession,
    location: str,
    from_version: int | None = None,
    to_version: int | None = None,
    from_lake_version: int | None = None,
) -> DataFrame:
    """The spec CDF read (``table_changes``): row-level changes for the
    Delta versions in ``(from_version, to_version]``, purely from
    ``_delta_log`` + ``_change_data/``. Returns the table columns plus
    ``_change_type`` ('insert' | 'delete' | 'update_preimage' |
    'update_postimage'), ``_commit_version`` (the Delta version) and
    ``_lake_version`` (the mirrored lake version, this exporter's
    commitInfo extension).

    Per commit: explicit ``cdc`` actions are authoritative when present
    (the exporter writes them for every post-bootstrap commit once
    ``delta.enableChangeDataFeed`` is set); a commit WITHOUT them
    derives inserts from its add actions iff it is append-shaped (no
    removes, no deletion-vector descriptors) — the spec's append-only
    fallback, which covers the bootstrap export. Anything else raises:
    CDF was not enabled for that commit. Commits cleaned below a
    checkpoint are unreadable (real Delta's log-retention bound on
    ``table_changes``).

    ``from_version`` is EXCLUSIVE (changes AFTER that version), matching
    ``LakeTable.read_changes`` — pass ``from_lake_version`` to give the
    boundary in lake versions instead."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField

    location = os.path.abspath(location)
    latest = _current_delta_version(location)
    if from_lake_version is not None:
        if from_version is not None:
            raise ValueError(
                "pass from_version OR from_lake_version, not both"
            )
        exported = _exported_lake_versions(location)
        if int(from_lake_version) not in exported:
            raise ValueError(
                f"lake version {from_lake_version} was never exported "
                f"(mirrored: {sorted(exported)})"
            )
        from_version = exported[int(from_lake_version)]
    if from_version is None:
        from_version = -1
    to_version = latest if to_version is None else int(to_version)
    out: DataFrame | None = None
    for v in range(int(from_version) + 1, to_version + 1):
        if not os.path.exists(_commit_path(location, v)):
            raise ValueError(
                f"Delta commit {v} was cleaned below a checkpoint — "
                "change-data reads are bounded by log retention"
            )
        commit = _read_commit(location, v)
        lake_v = next(
            (
                a["commitInfo"].get("lakeVersion")
                for a in commit
                if "commitInfo" in a
            ),
            None,
        )
        # schema + mapping as of THIS version
        _p, meta, _adds, _rm, _ = _replay(location, v)
        schema_json = json.loads(meta["schemaString"])
        schema = StructType.fromJson(schema_json)
        mapped = (meta.get("configuration") or {}).get(
            "delta.columnMapping.mode"
        ) == "name"
        phys_fields, selects = [], []
        for f, j in zip(schema.fields, schema_json["fields"]):
            phys = (
                (j.get("metadata") or {}).get(
                    "delta.columnMapping.physicalName", f.name
                )
                if mapped
                else f.name
            )
            phys_fields.append(StructField(phys, f.dataType, True))
            selects.append(F.col(phys).alias(f.name))

        cdc_paths = [
            os.path.join(
                location, urllib.parse.unquote(a["cdc"]["path"])
            )
            for a in commit
            if "cdc" in a
        ]
        if cdc_paths:
            scan_schema = StructType(
                phys_fields + [StructField("_change_type", StringType())]
            )
            df = spark.read.schema(scan_schema).parquet(*cdc_paths).select(
                *selects, F.col("_change_type")
            )
        else:
            adds = [a["add"] for a in commit if "add" in a]
            if (
                any("remove" in a for a in commit)
                or any(a.get("deletionVector") for a in adds)
            ):
                raise ValueError(
                    f"Delta commit {v} has no change-data actions and is "
                    "not append-shaped — delta.enableChangeDataFeed was "
                    "not set when it was written"
                )
            if not adds:
                continue
            paths = [
                os.path.join(location, urllib.parse.unquote(a["path"]))
                for a in adds
            ]
            df = (
                spark.read.schema(StructType(phys_fields))
                .parquet(*paths)
                .select(*selects, F.lit("insert").alias("_change_type"))
            )
        df = df.withColumn(
            "_commit_version", F.lit(v).cast("long")
        ).withColumn(
            "_lake_version",
            F.lit(lake_v).cast("long"),
        )
        out = df if out is None else out.unionByName(df)
    if out is not None:
        return out
    # empty range: schema of the head version + the CDF columns
    _p, meta, _a, _r, _ = _replay(location, min(to_version, latest))
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    empty = StructType(
        list(schema.fields)
        + [
            StructField("_change_type", StringType()),
            StructField("_commit_version", LongType()),
            StructField("_lake_version", LongType()),
        ]
    )
    return spark.createDataFrame([], empty)


def sync_delta(
    table, checkpoint_interval: int = 10, change_data: bool = False
) -> str | None:
    """Catch the Delta mirror up to the lake's current version — the
    continuous-publish form of ``export_delta``, safe as a
    ``PipelineConfig.on_commit`` hook. No-ops (returns None) when
    already in sync and on transient unexportable states (live patch
    deltas, mixed-era renamed files) — the mirror catches up at the
    next exportable commit, e.g. right after ``auto_compact`` or a
    rewrite. Ordinary live-MOR states export directly (deletion
    vectors). Hard misuse (branch table, regressing lake version)
    still raises."""
    snap = table.snapshot()
    location = os.path.abspath(table.path)
    if _current_delta_version(location) >= 0:
        exported = _exported_lake_versions(location)
        if int(snap.version) in exported:
            return None
    try:
        return export_delta(
            table,
            version=snap.version,
            checkpoint_interval=checkpoint_interval,
            change_data=change_data,
        )
    except DeltaUnexportableState:
        return None


def apply_delta_changes(
    spark: SparkSession,
    table,
    location: str,
    config=None,
) -> list:
    """Exactly-once CDC **from** a Delta table: consume its Change Data
    Feed commit-by-commit and MERGE-apply into a lake table — the
    inverse leg of the mirror, and the Delta-format twin of the Kafka
    relay (``streaming/relay.py``). Lake A -> ``sync_delta(...,
    change_data=True)`` -> Delta log -> ``apply_delta_changes`` ->
    lake B converges B on A's state through any crash/replay.

    Each Delta version applies as one fenced batch with ``batch_id`` =
    the Delta version (the engine's version-fence makes replays
    committed no-ops), and ``seq`` = the Delta version for every event
    (a commit's feed nets to at most one change per key, so
    cross-commit order IS the replay order — the same contract the
    ingest side relies on). Resume needs no external checkpoint: the
    destination table's own stream fence (``last_batch_id``) says which
    Delta version was consumed last. ``update_preimage`` rows drop
    (the post-image carries the payload); insert/update map to upserts,
    delete to deletes.

    Feed reads are bounded by log retention: resuming past a
    ``clean_delta_log`` horizon raises (the cleaned commits' changes
    are gone — re-seed from ``read_delta`` instead)."""
    from pyspark.sql import functions as F

    from datax_spark.streaming.pipeline import PipelineConfig, apply_batch

    cfg = config or PipelineConfig()
    location = os.path.abspath(location)
    latest = _current_delta_version(location)
    resume = table.last_batch_id(cfg.stream_id)
    start = 0 if resume is None else int(resume) + 1
    metrics = []
    for v in range(start, latest + 1):
        feed = read_delta_changes(
            spark, location, from_version=v - 1, to_version=v
        )
        events = (
            feed.filter(F.col("_change_type") != "update_preimage")
            .withColumn(
                "op",
                F.when(F.col("_change_type") == "delete", F.lit("delete"))
                .when(F.col("_change_type") == "insert", F.lit("insert"))
                .otherwise(F.lit("update")),
            )
            .withColumn("seq", F.lit(v).cast("long"))
            .drop("_change_type", "_commit_version", "_lake_version")
        )
        metrics.append(apply_batch(table, events, v, cfg))
    return metrics


def delta_pinned_versions(location: str) -> set[int]:
    """Lake versions whose files the Delta mirror's CURRENT version
    references — lake ``vacuum`` unions these into its retained set so
    an external reader of the mirror's head never dangles. Older Delta
    versions are pinned only as far as lake retention reaches: vacuum
    breaking deep Delta time travel is real Delta VACUUM's own
    documented contract. Empty when never exported."""
    location = os.path.abspath(location)
    latest = _current_delta_version(location)
    if latest < 0:
        return set()
    lv = _lake_version_of(location, latest)
    return {int(lv)} if lv is not None else set()


def delta_history(spark: SparkSession, location: str) -> "DataFrame":
    """``DESCRIBE HISTORY`` over the mirror's ``_delta_log``: one row
    per surviving commit (newest first, like real Delta) with version,
    timestamp, operation, operationParameters, the mirrored lake
    version and counts derived from the commit's actions. Commits
    cleaned below a checkpoint are gone from history — the same
    log-retention trade ``read_delta`` documents. Driver-side JSON
    walk, O(commits)."""
    import datetime as _dt

    from pyspark.sql import types as T

    location = os.path.abspath(location)
    head = _current_delta_version(location)
    if head < 0:
        raise FileNotFoundError(f"no _delta_log under {location}")
    rows = []
    for v in range(head, -1, -1):
        try:
            actions = _read_commit(location, v)
        except FileNotFoundError:
            break  # cleaned below the checkpoint
        info = next(
            (a["commitInfo"] for a in actions if "commitInfo" in a), {}
        )
        n_add = sum(1 for a in actions if "add" in a)
        n_remove = sum(1 for a in actions if "remove" in a)
        n_cdc = sum(1 for a in actions if "cdc" in a)
        rows.append(
            (
                v,
                _dt.datetime.fromtimestamp(info.get("timestamp", 0) / 1000.0)
                if info.get("timestamp")
                else None,
                info.get("operation"),
                {
                    k: str(val)
                    for k, val in (
                        info.get("operationParameters") or {}
                    ).items()
                },
                info.get("lakeVersion"),
                info.get("engineInfo"),
                n_add,
                n_remove,
                n_cdc,
            )
        )
    schema = T.StructType([
        T.StructField("version", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("operation", T.StringType()),
        T.StructField(
            "operationParameters",
            T.MapType(T.StringType(), T.StringType()),
        ),
        T.StructField("lakeVersion", T.LongType()),
        T.StructField("engineInfo", T.StringType()),
        T.StructField("numAddedFiles", T.IntegerType()),
        T.StructField("numRemovedFiles", T.IntegerType()),
        T.StructField("numChangeFiles", T.IntegerType()),
    ])
    return spark.createDataFrame(rows, schema)
