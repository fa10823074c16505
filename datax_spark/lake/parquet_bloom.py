"""Driver-side parquet BLOOM FILTER probing for manifest file skipping.

``LakeTable.create(bloom_cols=...)`` already makes every data file carry
a parquet-native bloom filter (written by Spark's parquet writer, format
per the public parquet spec: split-block bloom, XXH64 of the
plain-encoded value, seed 0). Spark's reader consumes it for ROW-GROUP
skipping — but only after the file is opened on an executor. This module
closes the other half: ``plan_scan`` probes the same bloom DRIVER-SIDE,
so a point lookup (``=`` filter on a bloom column) drops whole files
before Spark ever plans the read. At 100-TB file counts that is the
difference between "schedule a task per file to discover the key isn't
there" and "read O(files that might contain the key)".

This mirrors what Iceberg/Impala do with parquet blooms at planning
time. It is an OPTIMIZATION ONLY, like the min/max bounds in
lake/stats.py: a missing/undecodable bloom, an unsupported type, or any
parse surprise keeps the file (returns None), and ``scan`` re-applies
the full predicate to the surviving rows — a bloom can yield false
positives, never false negatives, so pruning on a definite "absent" is
sound.

pyarrow (16.x) exposes neither ``bloom_filter_offset`` nor the bitset,
so the footer's Thrift COMPACT structure is walked directly (the
serialization is the public parquet-format contract, stable since
format 2.x). Only generic compact-protocol rules are implemented — no
parquet-mr code involved; field ids come from parquet-format's
parquet.thrift.

Reference analogs: the splitPk point-lookup WHERE pushdown
(plugin-rdbms-util/.../SingleTableSplitUtil.java:126-139) and
hbase11xreader's rowkey-range task skipping — here the "index" is the
file's own bloom.
"""

from __future__ import annotations

import os
import struct
from typing import Any

# ---------------------------------------------------------------- xxhash64
# Pure-Python XXH64 (public algorithm; github.com/Cyan4973/xxHash spec).
# Probe inputs are tiny (one literal per filter), so speed is irrelevant.

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M64


def xxhash64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while pos <= n - 32:
            a, b, c, d = struct.unpack_from("<QQQQ", data, pos)
            v1, v2, v3, v4 = _round(v1, a), _round(v2, b), _round(v3, c), _round(v4, d)
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while pos <= n - 8:
        (k1,) = struct.unpack_from("<Q", data, pos)
        h ^= _round(0, k1)
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        pos += 8
    if pos <= n - 4:
        (k,) = struct.unpack_from("<I", data, pos)
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ------------------------------------------------- thrift compact protocol
# Minimal generic reader: structs parse to {field_id: value}; values we
# don't model (doubles, maps) are decoded just enough to skip correctly.

_CT_STOP = 0
_CT_BOOL_TRUE = 1
_CT_BOOL_FALSE = 2
_CT_BYTE = 3
_CT_I16 = 4
_CT_I32 = 5
_CT_I64 = 6
_CT_DOUBLE = 7
_CT_BINARY = 8
_CT_LIST = 9
_CT_SET = 10
_CT_MAP = 11
_CT_STRUCT = 12


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def byte(self) -> int:
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        out = shift = 0
        while True:
            b = self.byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def value(self, ctype: int) -> Any:
        if ctype in (_CT_BOOL_TRUE, _CT_BOOL_FALSE):
            return ctype == _CT_BOOL_TRUE
        if ctype == _CT_BYTE:
            b = self.byte()
            return b - 256 if b > 127 else b
        if ctype in (_CT_I16, _CT_I32, _CT_I64):
            return self.zigzag()
        if ctype == _CT_DOUBLE:
            (d,) = struct.unpack_from("<d", self.buf, self.pos)
            self.pos += 8
            return d
        if ctype == _CT_BINARY:
            n = self.varint()
            out = self.buf[self.pos : self.pos + n]
            self.pos += n
            return out
        if ctype in (_CT_LIST, _CT_SET):
            head = self.byte()
            size = head >> 4
            etype = head & 0x0F
            if size == 15:
                size = self.varint()
            return [self.value(etype) for _ in range(size)]
        if ctype == _CT_MAP:
            size = self.varint()
            if size == 0:
                return {}
            head = self.byte()
            kt, vt = head >> 4, head & 0x0F
            return dict(
                (self.value(kt), self.value(vt)) for _ in range(size)
            )
        if ctype == _CT_STRUCT:
            return self.struct()
        raise ValueError(f"unknown thrift compact type {ctype}")

    def struct(self) -> dict[int, Any]:
        out: dict[int, Any] = {}
        last_fid = 0
        while True:
            head = self.byte()
            if head == _CT_STOP:
                return out
            delta = head >> 4
            ctype = head & 0x0F
            fid = last_fid + delta if delta else self.zigzag()
            last_fid = fid
            # bools carry their value in the type nibble inside structs
            out[fid] = self.value(ctype)


# ------------------------------------------------------- footer extraction

# parquet.thrift field ids (public parquet-format contract)
_FMD_ROW_GROUPS = 4
_RG_COLUMNS = 1
_CC_META_DATA = 3
_CMD_TYPE = 1
_CMD_PATH_IN_SCHEMA = 3
_CMD_BLOOM_OFFSET = 14
_CMD_BLOOM_LENGTH = 15

# parquet physical types (enum values from parquet.thrift)
_PT_INT32 = 1
_PT_INT64 = 2
_PT_BYTE_ARRAY = 6


def footer_bloom_index(
    path: str,
) -> tuple[dict[str, list[tuple[int, int | None, int]]], int]:
    """(column dotted path -> [(bloom_offset, bloom_length|None, ptype)]
    with one entry PER ROW GROUP that has a bloom for the column,
    number of row groups in the file).

    Reads the file's footer only (tail read); any column chunk without a
    bloom contributes nothing. ({}, n) when no column has one. Callers
    deciding to PRUNE must require len(entries) == n_row_groups: a row
    group whose chunk lacks a bloom (mixed writers, evolved configs) is
    invisible here, and a prune that ignores it would be unsound.
    """
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        f.seek(max(0, size - 8))
        tail = f.read(8)
        if len(tail) != 8 or tail[4:] != b"PAR1":
            return {}, 0
        (flen,) = struct.unpack("<I", tail[:4])
        if flen <= 0 or flen > size - 8:
            return {}, 0
        f.seek(size - 8 - flen)
        footer = f.read(flen)
    fmd = _Reader(footer).struct()
    out: dict[str, list[tuple[int, int | None, int]]] = {}
    row_groups = fmd.get(_FMD_ROW_GROUPS) or []
    for rg in row_groups:
        for cc in rg.get(_RG_COLUMNS) or []:
            md = cc.get(_CC_META_DATA)
            if not md:
                continue
            off = md.get(_CMD_BLOOM_OFFSET)
            if off is None:
                continue
            parts = md.get(_CMD_PATH_IN_SCHEMA) or []
            col = ".".join(
                p.decode("utf-8") if isinstance(p, bytes) else str(p)
                for p in parts
            )
            out.setdefault(col, []).append(
                (off, md.get(_CMD_BLOOM_LENGTH), md.get(_CMD_TYPE))
            )
    return out, len(row_groups)


# --------------------------------------------------- split-block bloom probe

_SALT = (
    0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
    0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
)

# BloomFilterHeader field ids: 1=numBytes, 2=algorithm, 3=hash, 4=compression
_BFH_NUM_BYTES = 1
_BFH_HASH = 3


def _read_bitset(path: str, offset: int, length: int | None) -> bytes | None:
    with open(path, "rb") as f:
        f.seek(offset)
        # header is tiny; 64 bytes is ample (3 empty-struct unions + i32)
        head = f.read(length if length else 64)
        rdr = _Reader(head)
        try:
            hdr = rdr.struct()
        except (IndexError, ValueError):
            return None
        nbytes = hdr.get(_BFH_NUM_BYTES)
        if not isinstance(nbytes, int) or nbytes <= 0 or nbytes % 32:
            return None
        # hash union must be XXHASH (field 1) when present
        h = hdr.get(_BFH_HASH)
        if isinstance(h, dict) and h and 1 not in h:
            return None
        start = rdr.pos
        if length:  # bitset rides in the same buffer
            bitset = head[start : start + nbytes]
            if len(bitset) == nbytes:
                return bitset
        f.seek(offset + start)
        bitset = f.read(nbytes)
        return bitset if len(bitset) == nbytes else None


def _sbbf_check(bitset: bytes, h: int) -> bool:
    num_blocks = len(bitset) // 32
    block = ((h >> 32) * num_blocks) >> 32
    key = h & 0xFFFFFFFF
    words = struct.unpack_from("<8I", bitset, block * 32)
    for i in range(8):
        mask = 1 << (((key * _SALT[i]) & 0xFFFFFFFF) >> 27)
        if not words[i] & mask:
            return False
    return True


def _plain_encode(value: Any, ptype: int) -> bytes | None:
    """The bloom's hash input: the value's parquet PLAIN encoding
    (BYTE_ARRAY without the length prefix, per the spec)."""
    if ptype == _PT_INT64:
        if isinstance(value, bool) or not isinstance(value, int):
            return None
        return struct.pack("<q", value) if -(2**63) <= value < 2**63 else None
    if ptype == _PT_INT32:
        if isinstance(value, bool) or not isinstance(value, int):
            return None
        return struct.pack("<i", value) if -(2**31) <= value < 2**31 else None
    if ptype == _PT_BYTE_ARRAY:
        if isinstance(value, str):
            return value.encode("utf-8")
        if isinstance(value, (bytes, bytearray)):
            return bytes(value)
    return None


def file_might_contain(path: str, probes: dict[str, Any]) -> bool:
    """False iff some probed column's blooms PROVE every probed value
    absent from every row group — the only case that may prune. Probe
    values may be a single literal or a list (IN semantics: the file
    survives if ANY listed value might be present). Missing blooms,
    unsupported types, or any decode surprise return True (keep).
    """
    if not probes:
        return True
    try:
        index, n_rg = footer_bloom_index(path)
    except (OSError, IndexError, ValueError, struct.error):
        return True
    for col, value in probes.items():
        entries = index.get(col)
        if not entries or len(entries) != n_rg:
            # no bloom, or blooms don't cover EVERY row group (a
            # bloom-less group could hold the value unseen): keep
            continue
        values = value if isinstance(value, (list, tuple, set)) else [value]
        if not values:
            continue
        # one bitset read per row group, shared across all probed values
        loaded: list[tuple[bytes | None, int]] = []
        for offset, length, ptype in entries:
            try:
                loaded.append((_read_bitset(path, offset, length), ptype))
            except (OSError, IndexError, ValueError, struct.error):
                loaded.append((None, ptype))

        def _might_hold(v) -> bool:
            for bitset, ptype in loaded:
                enc = _plain_encode(v, ptype)
                if enc is None or bitset is None:
                    return True  # undecidable: keep
                if _sbbf_check(bitset, xxhash64(enc)):
                    return True
            return False

        if not any(_might_hold(v) for v in values):
            return False
    return True
