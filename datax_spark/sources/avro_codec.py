"""Pure-stdlib Avro binary codec + Confluent Schema Registry framing.

Production Debezium deployments overwhelmingly ship envelopes as
**Confluent-framed Avro** on Kafka (magic byte 0x00 + 4-byte big-endian
schema id + Avro binary body), not JSON. The reference has no Kafka or
Avro surface at all — this module is a north-rule addition (the
"binlog/WAL tail" input actually arriving the way real capture stacks
deliver it), built from the two public specifications:

- Apache Avro 1.11 binary encoding spec (varint zigzag longs, float/
  double little-endian IEEE, length-prefixed bytes/string, block-encoded
  arrays/maps, union = long index + branch value);
- Confluent wire format (magic 0, 4-byte schema id, payload) + the
  Schema Registry REST surface ``GET /schemas/ids/{id}``.

No third-party Avro library exists in this environment (probed:
``fastavro`` absent, and pyspark ships the avro *core* jars but NOT the
``spark-avro`` datasource module, so ``from_avro`` is unavailable), so
the decoder here is the real path, not a convenience.

Scale shape, stated plainly: Avro decode is per-record Python — the one
workload in this repo where that is unavoidable without the spark-avro
jar. It therefore runs Arrow-batched inside ``mapInPandas`` (see
``avro_envelope_to_json``) and emits each record as ONE JSON text blob;
everything downstream (``from_debezium`` projection, dedup, fenced
apply) stays pure Column expressions. On a real cluster you would
attach the spark-avro package and swap the decode stage for
``from_avro`` — the framing split (substring off the 5-byte Confluent
header, per-schema-id dispatch) is identical either way.
"""

from __future__ import annotations

import io
import json
import os
import struct
import urllib.request
from typing import Any

# ---------------------------------------------------------------------------
# schema handling
# ---------------------------------------------------------------------------

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


def parse_schema(schema: str | dict | list) -> Any:
    """Normalize an Avro schema (JSON text or already-parsed) into the
    dict/list/str form the codec walks. Named types are resolvable by
    later references within the same schema (Avro spec: a name may be
    used in place of a full definition after first occurrence)."""
    if isinstance(schema, str):
        s = schema.strip()
        if s.startswith(("{", "[", '"')):
            schema = json.loads(s)
        else:
            schema = s  # bare primitive name
    names: dict[str, Any] = {}
    return _resolve(schema, names)


def _resolve(schema: Any, names: dict[str, Any]) -> Any:
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return schema
        if schema in names:
            return names[schema]
        raise ValueError(f"unknown Avro type name {schema!r}")
    if isinstance(schema, list):  # union
        return [_resolve(b, names) for b in schema]
    if not isinstance(schema, dict):
        raise ValueError(f"bad Avro schema node: {schema!r}")
    t = schema["type"]
    if t in ("record", "enum", "fixed"):
        # register under both short and namespace-qualified names BEFORE
        # resolving fields (recursive types)
        full = schema.get("name", "")
        ns = schema.get("namespace")
        names[full] = schema
        if ns:
            names[f"{ns}.{full}"] = schema
        if t == "record":
            for f in schema.get("fields", []):
                f["type"] = _resolve(f["type"], names)
        return schema
    if t == "array":
        schema["items"] = _resolve(schema["items"], names)
        return schema
    if t == "map":
        schema["values"] = _resolve(schema["values"], names)
        return schema
    if t in _PRIMITIVES:
        # {"type": "string", "logicalType": ...} — logical types decode
        # as their base type (documented: no logical-type coercion here)
        return t
    raise ValueError(f"unknown Avro complex type {t!r}")


def _type_of(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


# ---------------------------------------------------------------------------
# binary decode (Avro spec "Binary Encoding")
# ---------------------------------------------------------------------------


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read_long(self) -> int:
        """zigzag varint (spec: int and long share this encoding)."""
        shift = 0
        acc = 0
        buf, pos = self.buf, self.pos
        while True:
            b = buf[pos]
            pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        self.pos = pos
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        n = self.read_long()
        out = self.buf[self.pos:self.pos + n]
        if len(out) != n:
            raise ValueError("truncated Avro bytes value")
        self.pos += n
        return out


def _decode(schema: Any, r: _Reader) -> Any:
    t = _type_of(schema)
    if t == "null":
        return None
    if t == "boolean":
        v = r.buf[r.pos]
        r.pos += 1
        return v != 0
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        (v,) = struct.unpack_from("<f", r.buf, r.pos)
        r.pos += 4
        return v
    if t == "double":
        (v,) = struct.unpack_from("<d", r.buf, r.pos)
        r.pos += 8
        return v
    if t == "bytes":
        return r.read_bytes()
    if t == "string":
        return r.read_bytes().decode("utf-8")
    if t == "union":
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise ValueError(f"union index {idx} out of range")
        return _decode(schema[idx], r)
    if t == "record":
        return {
            f["name"]: _decode(f["type"], r) for f in schema["fields"]
        }
    if t == "enum":
        idx = r.read_long()
        return schema["symbols"][idx]
    if t == "fixed":
        n = schema["size"]
        out = r.buf[r.pos:r.pos + n]
        r.pos += n
        return out
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix (spec)
                n = -n
                r.read_long()  # block byte size, unused when decoding
            for _ in range(n):
                out.append(_decode(schema["items"], r))
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = _decode(schema["values"], r)
    raise ValueError(f"cannot decode Avro type {t!r}")


def decode(schema: Any, blob: bytes) -> Any:
    """Decode one Avro binary datum against its WRITER schema (the one
    the registry stores under the frame's schema id). Reader-schema
    resolution is deliberately absent: this engine treats evolution as
    additive table DDL downstream, not codec-level projection."""
    r = _Reader(blob)
    v = _decode(schema, r)
    if r.pos != len(blob):
        raise ValueError(
            f"trailing bytes after Avro datum ({len(blob) - r.pos})"
        )
    return v


# ---------------------------------------------------------------------------
# binary encode (used by tests/fixtures and the emit side)
# ---------------------------------------------------------------------------


def _zigzag(v: int) -> bytes:
    acc = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(schema: Any, v: Any, out: io.BytesIO) -> None:
    t = _type_of(schema)
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif t in ("int", "long"):
        out.write(_zigzag(int(v)))
    elif t == "float":
        out.write(struct.pack("<f", float(v)))
    elif t == "double":
        out.write(struct.pack("<d", float(v)))
    elif t == "bytes":
        out.write(_zigzag(len(v)))
        out.write(bytes(v))
    elif t == "string":
        b = v.encode("utf-8")
        out.write(_zigzag(len(b)))
        out.write(b)
    elif t == "union":
        idx = _union_branch(schema, v)
        out.write(_zigzag(idx))
        _encode(schema[idx], v, out)
    elif t == "record":
        for f in schema["fields"]:
            _encode(f["type"], v.get(f["name"]), out)
    elif t == "enum":
        out.write(_zigzag(schema["symbols"].index(v)))
    elif t == "fixed":
        assert len(v) == schema["size"]
        out.write(bytes(v))
    elif t == "array":
        if v:
            out.write(_zigzag(len(v)))
            for item in v:
                _encode(schema["items"], item, out)
        out.write(b"\x00")
    elif t == "map":
        if v:
            out.write(_zigzag(len(v)))
            for k, item in v.items():
                kb = k.encode("utf-8")
                out.write(_zigzag(len(kb)))
                out.write(kb)
                _encode(schema["values"], item, out)
        out.write(b"\x00")
    else:
        raise ValueError(f"cannot encode Avro type {t!r}")


def _union_branch(union: list, v: Any) -> int:
    """Pick the union branch for a python value — null first, then the
    first branch whose base type matches (sufficient for the
    ["null", X] unions envelopes use)."""
    for i, b in enumerate(union):
        if _type_of(b) == "null" and v is None:
            return i
    for i, b in enumerate(union):
        t = _type_of(b)
        if t == "null":
            continue
        if t == "boolean" and isinstance(v, bool):
            return i
        if t in ("int", "long") and isinstance(v, int) and not isinstance(v, bool):
            return i
        if t in ("float", "double") and isinstance(v, float):
            return i
        if t == "string" and isinstance(v, str):
            return i
        if t in ("bytes", "fixed") and isinstance(v, (bytes, bytearray)):
            return i
        if t == "record" and isinstance(v, dict):
            return i
        if t == "enum" and isinstance(v, str):
            return i
        if t == "array" and isinstance(v, list):
            return i
        if t == "map" and isinstance(v, dict):
            return i
    raise ValueError(f"no union branch for {type(v).__name__}")


def encode(schema: Any, v: Any) -> bytes:
    out = io.BytesIO()
    _encode(schema, v, out)
    return out.getvalue()


# ---------------------------------------------------------------------------
# Confluent wire format + Schema Registry client
# ---------------------------------------------------------------------------

_MAGIC = 0


def frame_confluent(schema_id: int, body: bytes) -> bytes:
    return struct.pack(">bI", _MAGIC, schema_id) + body


def unframe_confluent(blob: bytes) -> tuple[int, bytes]:
    if not blob or blob[0] != _MAGIC:
        raise ValueError(
            f"not Confluent-framed (magic byte {blob[:1]!r}, want 0x00)"
        )
    (schema_id,) = struct.unpack_from(">I", blob, 1)
    return schema_id, blob[5:]


class SchemaRegistry:
    """Minimal Confluent Schema Registry client: resolve writer schemas
    by id (``GET /schemas/ids/{id}``), cached per instance. A dict of
    ``{id: schema_json}`` works offline (job-config-embedded schemas)."""

    def __init__(self, url: str | None = None,
                 schemas: dict[int, str] | None = None):
        if url is None and schemas is None:
            raise ValueError("SchemaRegistry needs url or schemas")
        self.url = url.rstrip("/") if url else None
        self._static = dict(schemas or {})
        self._cache: dict[int, Any] = {}

    def schema_for(self, schema_id: int) -> Any:
        if schema_id in self._cache:
            return self._cache[schema_id]
        if schema_id in self._static:
            parsed = parse_schema(self._static[schema_id])
        elif self.url:
            with urllib.request.urlopen(
                f"{self.url}/schemas/ids/{schema_id}"
            ) as resp:
                parsed = parse_schema(json.loads(resp.read())["schema"])
        else:
            raise KeyError(f"schema id {schema_id} not in static registry")
        self._cache[schema_id] = parsed
        return parsed

    def decode_value(self, blob: bytes) -> tuple[int, Any]:
        schema_id, body = unframe_confluent(blob)
        return schema_id, decode(self.schema_for(schema_id), body)


# ---------------------------------------------------------------------------
# Object Container Files (Avro spec "Object Container Files")
# ---------------------------------------------------------------------------
#
# Added for the Iceberg metadata surface (lake/iceberg.py): Iceberg
# manifests and manifest lists ARE Avro container files, so exporting
# spec-conformant table metadata needs the OCF framing on top of the
# binary codec above. Kept deliberately deterministic — the sync marker
# derives from the content, so identical metadata exports are
# byte-identical (the same property the lake's content-addressed
# manifest shards rely on).

OCF_MAGIC = b"Obj\x01"
_META_SCHEMA = parse_schema({"type": "map", "values": "bytes"})


def write_container(
    path: str,
    schema: str | dict,
    records: list,
    meta: dict[str, bytes | str] | None = None,
    codec: str = "deflate",
) -> None:
    """Write one Avro Object Container File: header (magic, metadata map
    incl. avro.schema + avro.codec, 16-byte sync marker), then a single
    data block (count, byte length, payload, sync). One block is right
    for metadata-sized files (an Iceberg manifest holds O(files-per-
    snapshot) entries, bounded by the lake's O(num_buckets) file counts);
    a table of data-scale row counts would never route through here.

    ``codec`` is ``null`` or ``deflate`` (raw zlib per the spec — the
    two codecs every Avro implementation must support)."""
    import zlib

    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported OCF codec {codec!r}")
    schema_json = schema if isinstance(schema, str) else json.dumps(schema)
    parsed = parse_schema(json.loads(schema_json))
    m: dict[str, bytes] = {
        k: v.encode("utf-8") if isinstance(v, str) else bytes(v)
        for k, v in (meta or {}).items()
    }
    m["avro.schema"] = schema_json.encode("utf-8")
    m["avro.codec"] = codec.encode("utf-8")
    body = b"".join(encode(parsed, rec) for rec in records)
    if codec == "deflate":
        # raw deflate (no zlib header/checksum), per the Avro spec
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        body = co.compress(body) + co.flush()
    import hashlib

    # deterministic sync marker: content-derived, so re-exports of the
    # same state produce byte-identical files
    sync = hashlib.md5(
        b"ocf-sync:" + schema_json.encode() + b":" + body
    ).digest()
    out = io.BytesIO()
    out.write(OCF_MAGIC)
    # metadata map in sorted key order (determinism)
    out.write(encode(_META_SCHEMA, dict(sorted(m.items()))))
    out.write(sync)
    if records:
        out.write(_zigzag(len(records)))
        out.write(_zigzag(len(body)))
        out.write(body)
        out.write(sync)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(out.getvalue())
    os.replace(tmp, path)


def read_container(path: str) -> tuple[dict[str, bytes], list]:
    """Read an Avro Object Container File -> (metadata map, records).
    Decodes against the embedded writer schema (``avro.schema``)."""
    import zlib

    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != OCF_MAGIC:
        raise ValueError(f"{path}: not an Avro container file")
    r = _Reader(buf, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    sync = buf[r.pos:r.pos + 16]
    r.pos += 16
    schema = parse_schema(json.loads(meta["avro.schema"].decode("utf-8")))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    records: list = []
    while r.pos < len(buf):
        count = r.read_long()
        blen = r.read_long()
        block = buf[r.pos:r.pos + blen]
        r.pos += blen
        if buf[r.pos:r.pos + 16] != sync:
            raise ValueError(f"{path}: bad sync marker (corrupt block)")
        r.pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported OCF codec {codec!r}")
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode(schema, br))
        if br.pos != len(block):
            raise ValueError(f"{path}: trailing bytes in OCF block")
    return meta, records


def _json_default(v: Any) -> Any:
    if isinstance(v, (bytes, bytearray)):  # binary transported as latin-1
        return v.decode("latin-1")
    raise TypeError(type(v).__name__)


def avro_record_to_json(registry: SchemaRegistry, blob: bytes) -> str:
    """One Confluent-Avro value -> compact JSON text. This is the bridge
    into the existing envelope parsers: Debezium's Avro converter and
    its JSON converter produce the SAME logical document, so decoding to
    JSON text lets ``from_debezium`` / the DDL router / SCD2 drivers run
    unchanged (pure Column from_json downstream)."""
    _, v = registry.decode_value(blob)
    return json.dumps(v, separators=(",", ":"), default=_json_default)
