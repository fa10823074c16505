"""Puffin — Iceberg's auxiliary-blob container — plus the v3
``deletion-vector-v1`` blob encoding.

Layout per the public Puffin spec (iceberg.apache.org/puffin-spec):

    file   = Magic blob₁ … blobₙ footer
    footer = Magic payload payloadSize:int32-LE flags:int32-LE Magic
    Magic  = 0x50 0x46 0x41 0x31  ("PFA1")

``payload`` is the UTF-8 JSON FileMetadata ``{"blobs": [...],
"properties": {...}}``; each BlobMetadata carries ``type``, ``fields``,
``snapshot-id``, ``sequence-number``, ``offset``, ``length`` and
optional ``properties``. Flags bit 0 of byte 0 marks an LZ4-compressed
payload — never set by this writer, rejected by this reader (the codec
is optional in the spec and absent in this image).

v3 ``deletion-vector-v1`` blob data (format spec "Deletion vectors"):

    len:int32-BE(magic+vector) | magic D1 33 39 64 |
    portable 64-bit RoaringBitmapArray | crc32:int32-BE(magic+vector)

This is byte-identical to ONE record of Delta Lake's deletion-vector
file format — deliberate: the Iceberg v3 spec adopted Delta's
serialization so engines can share readers. ``lake/delta.py``'s
``serialize_dv`` already emits exactly magic+vector (the Delta "payload")
and its 32-bit roaring chunks are cross-checked byte-for-byte against
org.roaringbitmap in tests/test_delta.py, so the two exporters share
one proven bitmap writer. Blob metadata for DVs carries the required
``referenced-data-file`` and ``cardinality`` properties; following the
reference implementation's DV writer, ``snapshot-id`` and
``sequence-number`` are written as ``-1`` (the manifest entry is the
authority for both).

No reference-repo analog: DataX has no lake format. This module exists
so the CDC mirror (lake/iceberg.py) can publish live MOR states as
spec v3 deletion vectors instead of rewriting position-delete parquet
per snapshot.
"""

from __future__ import annotations

import json
import os
import struct
import zlib
from typing import Any

MAGIC = b"PFA1"

#: framing magic of the serialized bitmap inside a DV blob —
#: int 1681511377, stored little-endian = bytes D1 33 39 64 (the same
#: constant Delta frames its DV payloads with; see lake/delta.py).
DV_MAGIC_BYTES = struct.pack("<I", 1681511377)


def frame_dv_payload(payload: bytes) -> bytes:
    """Frame an already-serialized RoaringBitmapArray (magic + vector —
    the bytes ``lake/delta.py::serialize_dv`` emits) as
    ``delete-vector-v1`` blob data: length + payload + CRC-32."""
    if payload[:4] != DV_MAGIC_BYTES:
        raise ValueError(f"bad DV payload magic {payload[:4]!r}")
    return (
        struct.pack(">I", len(payload))
        + payload
        + struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF)
    )


def dv_blob_data(positions) -> tuple[bytes, int]:
    """Frame dead-row ``positions`` as ``delete-vector-v1`` blob data.
    Returns ``(blob_bytes, cardinality)``."""
    from datax_spark.lake.delta import serialize_dv

    return (
        frame_dv_payload(serialize_dv(sorted(positions))),
        len(set(positions)),
    )


def dv_positions_from_blob(data: bytes) -> list[int]:
    """Decode (and integrity-check) a ``delete-vector-v1`` blob."""
    from datax_spark.lake.delta import deserialize_dv

    (size,) = struct.unpack_from(">I", data, 0)
    payload = data[4 : 4 + size]
    if len(payload) != size:
        raise ValueError(
            f"DV blob truncated: framed {size}, got {len(payload)}"
        )
    if payload[:4] != DV_MAGIC_BYTES:
        raise ValueError(f"bad DV magic {payload[:4]!r}")
    (crc,) = struct.unpack_from(">I", data, 4 + size)
    if zlib.crc32(payload) & 0xFFFFFFFF != crc:
        raise ValueError("DV blob checksum mismatch")
    return deserialize_dv(payload)


def write_puffin(
    path: str,
    blobs: list[dict[str, Any]],
    file_properties: dict[str, str] | None = None,
) -> list[dict[str, Any]]:
    """Write a Puffin file. Each input blob dict carries ``type``,
    ``data`` (bytes) and optionally ``fields`` / ``snapshot-id`` /
    ``sequence-number`` / ``properties``; offsets and lengths are
    assigned here. Returns the BlobMetadata list exactly as written to
    the footer (the caller forwards offset/length into Iceberg manifest
    ``content_offset`` / ``content_size_in_bytes``). Writes via a
    temp file + rename so a crashed export never leaves a half Puffin
    at the final name."""
    metas: list[dict[str, Any]] = []
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        at = len(MAGIC)
        for b in blobs:
            data = b["data"]
            meta: dict[str, Any] = {
                "type": b["type"],
                "fields": list(b.get("fields", [])),
                "snapshot-id": int(b.get("snapshot-id", -1)),
                "sequence-number": int(b.get("sequence-number", -1)),
                "offset": at,
                "length": len(data),
            }
            if b.get("properties"):
                meta["properties"] = dict(b["properties"])
            metas.append(meta)
            f.write(data)
            at += len(data)
        payload = json.dumps(
            {"blobs": metas, "properties": dict(file_properties or {})},
            sort_keys=True,
        ).encode("utf-8")
        f.write(MAGIC)
        f.write(payload)
        f.write(struct.pack("<i", len(payload)))
        f.write(struct.pack("<i", 0))  # flags: payload uncompressed
        f.write(MAGIC)
    os.replace(tmp, path)
    return metas


def read_puffin_footer(path: str) -> dict[str, Any]:
    """Parse a Puffin file's FileMetadata (footer JSON)."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(4)
        if head != MAGIC:
            raise ValueError(f"{path}: not a Puffin file (magic {head!r})")
        f.seek(size - 12)
        payload_size, flags = struct.unpack("<ii", f.read(8))
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: bad trailing Puffin magic")
        if flags & 1:
            raise NotImplementedError(
                f"{path}: LZ4-compressed footer payload not supported"
            )
        if flags & ~1:
            raise ValueError(f"{path}: unknown Puffin footer flags {flags:#x}")
        f.seek(size - 12 - payload_size - 4)
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: bad footer-start Puffin magic")
        payload = f.read(payload_size)
    return json.loads(payload.decode("utf-8"))


def read_puffin_blob(path: str, offset: int, length: int) -> bytes:
    with open(path, "rb") as f:
        f.seek(offset)
        data = f.read(length)
    if len(data) != length:
        raise ValueError(
            f"{path}: blob at {offset} truncated ({len(data)}/{length})"
        )
    return data
