"""Confluent-Avro envelope path (sources/avro_codec.py +
sources/envelope_avro.py): pure-stdlib Avro binary codec pinned against
spec byte literals, Confluent framing, a Schema Registry HTTP fixture,
and the Arrow-batched decode feeding the UNCHANGED from_debezium
Column parser end-to-end (including additive schema evolution across
two schema ids in one topic)."""

from __future__ import annotations

import json
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from datax_spark.sources.avro_codec import (
    SchemaRegistry,
    avro_record_to_json,
    decode,
    encode,
    frame_confluent,
    parse_schema,
    unframe_confluent,
)

# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------

RECORD_SCHEMA = json.dumps({
    "type": "record", "name": "Row", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "kind", "type": {"type": "enum", "name": "Kind",
                                  "symbols": ["A", "B", "C"]}},
        {"name": "fp", "type": {"type": "fixed", "name": "FP", "size": 4}},
        {"name": "blob", "type": "bytes"},
        {"name": "ok", "type": "boolean"},
    ],
})


def test_avro_golden_primitives():
    """Spec byte literals: zigzag varints, little-endian IEEE, length
    prefixes — pinned independently of the encoder."""
    assert encode("long", 0) == b"\x00"
    assert encode("long", 1) == b"\x02"
    assert encode("long", -1) == b"\x01"
    assert encode("long", 64) == b"\x80\x01"
    assert encode("long", -64) == b"\x7f"
    assert encode("string", "foo") == b"\x06foo"
    assert encode("double", 1.0) == struct.pack("<d", 1.0)
    assert encode("boolean", True) == b"\x01"
    # union ["null","string"]: branch index varint then value
    u = parse_schema('["null", "string"]')
    assert encode(u, None) == b"\x00"
    assert encode(u, "x") == b"\x02\x02x"
    for v in (0, -1, 1, 2**40, -(2**40), 2**62 - 1):
        assert decode("long", encode("long", v)) == v


def test_avro_record_roundtrip():
    schema = parse_schema(RECORD_SCHEMA)
    row = {
        "id": 42, "name": "hello", "score": -2.5,
        "tags": ["a", "b"], "attrs": {"x": 1, "y": -9},
        "kind": "B", "fp": b"\x01\x02\x03\x04", "blob": b"\xff\x00",
        "ok": True,
    }
    blob = encode(schema, row)
    assert decode(schema, blob) == row
    none_row = dict(row, name=None, tags=[], attrs={})
    assert decode(schema, encode(schema, none_row)) == none_row
    # trailing garbage is an error, not a silent ignore
    with pytest.raises(ValueError, match="trailing"):
        decode(schema, blob + b"\x00")


def test_confluent_framing():
    body = encode("string", "v")
    framed = frame_confluent(7, body)
    assert framed[:5] == b"\x00\x00\x00\x00\x07"
    assert unframe_confluent(framed) == (7, body)
    with pytest.raises(ValueError, match="magic"):
        unframe_confluent(b"\x01xxxx")


def test_nested_and_recursive_named_types():
    schema = parse_schema(json.dumps({
        "type": "record", "name": "Node", "fields": [
            {"name": "v", "type": "long"},
            {"name": "next", "type": ["null", "Node"]},
        ],
    }))
    chain = {"v": 1, "next": {"v": 2, "next": None}}
    assert decode(schema, encode(schema, chain)) == chain


# ---------------------------------------------------------------------------
# schema registry (HTTP fixture + static dict)
# ---------------------------------------------------------------------------


class _RegistryHandler(BaseHTTPRequestHandler):
    schemas: dict[int, str] = {}
    hits: list[str] = []

    def do_GET(self):  # noqa: N802
        type(self).hits.append(self.path)
        sid = int(self.path.rsplit("/", 1)[1])
        if sid not in self.schemas:
            self.send_response(404)
            self.end_headers()
            return
        body = json.dumps({"schema": self.schemas[sid]}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def registry_srv():
    _RegistryHandler.schemas = {}
    _RegistryHandler.hits = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _RegistryHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _url(srv) -> str:
    host, port = srv.server_address
    return f"http://{host}:{port}"


def test_registry_http_resolution_cached(registry_srv):
    _RegistryHandler.schemas[5] = RECORD_SCHEMA
    reg = SchemaRegistry(url=_url(registry_srv))
    row = {"id": 1, "name": None, "score": 0.0, "tags": [], "attrs": {},
           "kind": "A", "fp": b"aaaa", "blob": b"", "ok": False}
    blob = frame_confluent(5, encode(parse_schema(RECORD_SCHEMA), row))
    for _ in range(3):
        sid, got = reg.decode_value(blob)
        assert (sid, got) == (5, row)
    assert _RegistryHandler.hits == ["/schemas/ids/5"]  # cached after one


def test_registry_static_and_json_bridge():
    reg = SchemaRegistry(schemas={9: RECORD_SCHEMA})
    row = {"id": 7, "name": "n", "score": 1.5, "tags": ["t"],
           "attrs": {"k": 3}, "kind": "C", "fp": b"zzzz",
           "blob": b"\x01", "ok": True}
    blob = frame_confluent(9, encode(parse_schema(RECORD_SCHEMA), row))
    doc = json.loads(avro_record_to_json(reg, blob))
    assert doc["id"] == 7 and doc["attrs"] == {"k": 3}
    assert doc["fp"] == "zzzz" and doc["blob"] == "\x01"  # latin-1 bridge
    with pytest.raises(KeyError):
        reg.decode_value(frame_confluent(8, b""))


# ---------------------------------------------------------------------------
# Spark end-to-end: Confluent-Avro Debezium envelopes -> from_debezium
# ---------------------------------------------------------------------------

PAYLOAD_DDL = ("repo string, path string, commit string, lang string, "
               "content string")


def _dbz_schema(with_lang: bool) -> str:
    """A Debezium-shaped Avro value schema; the with_lang variant is the
    additively-evolved writer (new optional column)."""
    fields = [
        {"name": "repo", "type": ["null", "string"]},
        {"name": "path", "type": ["null", "string"]},
        {"name": "commit", "type": ["null", "string"]},
    ]
    if with_lang:
        fields.append({"name": "lang", "type": ["null", "string"]})
    fields.append({"name": "content", "type": ["null", "string"]})
    img = {"type": "record", "name": "Value", "fields": fields}
    return json.dumps({
        "type": "record", "name": "Envelope", "fields": [
            {"name": "before", "type": ["null", img]},
            {"name": "after", "type": ["null", "Value"]},
            {"name": "op", "type": "string"},
            {"name": "ts_ms", "type": ["null", "long"]},
            {"name": "source", "type": {
                "type": "record", "name": "Source", "fields": [
                    {"name": "lsn", "type": ["null", "long"]},
                    {"name": "table", "type": ["null", "string"]},
                ]}},
        ],
    })


def _dbz_avro(schema_id: int, schema_json: str, after: dict | None,
              before: dict | None, op: str, lsn: int) -> bytes:
    env = {"before": before, "after": after, "op": op, "ts_ms": lsn,
           "source": {"lsn": lsn, "table": "files"}}
    return frame_confluent(schema_id,
                           encode(parse_schema(schema_json), env))


def test_avro_values_to_json_spark(spark):
    from datax_spark.sources.envelope import from_debezium
    from datax_spark.sources.envelope_avro import avro_values_to_json

    s1 = _dbz_schema(False)
    s2 = _dbz_schema(True)
    blobs = [
        (_dbz_avro(1, s1, {"repo": "r1", "path": "p", "commit": "c1",
                           "content": "v1"}, None, "c", 10),),
        (_dbz_avro(1, s1, {"repo": "r2", "path": "p", "commit": "c2",
                           "content": "v2"}, None, "c", 11),),
        # evolved writer schema (id 2) adds lang — same topic
        (_dbz_avro(2, s2, {"repo": "r1", "path": "p", "commit": "c1",
                           "lang": "py", "content": "v1b"}, None, "u", 12),),
        (_dbz_avro(2, s2, None, {"repo": "r2", "path": "p", "commit": "c2",
                                 "lang": None, "content": "v2"}, "d", 13),),
        (None,),
    ]
    df = spark.createDataFrame(blobs, "value binary")
    out = avro_values_to_json(df, schemas={1: s1, 2: s2})
    rows = out.collect()
    docs = [json.loads(r.value) for r in rows if r.value is not None]
    assert sum(r.value is None for r in rows) == 1
    assert {d["op"] for d in docs} == {"c", "u", "d"}
    # the decoded JSON feeds the UNCHANGED envelope parser: old-writer
    # rows read lang as null (additive evolution, no codec projection)
    payload = spark.createDataFrame([], PAYLOAD_DDL).schema
    parsed = from_debezium(
        out.where(out.value.isNotNull()), payload
    ).orderBy("seq").collect()
    assert [(r.repo, r.op, r.lang, r.content, r.seq) for r in parsed] == [
        ("r1", "insert", None, "v1", 10),
        ("r2", "insert", None, "v2", 11),
        ("r1", "update", "py", "v1b", 12),
        ("r2", "delete", None, "v2", 13),
    ]


def test_kafka_avro_end_to_end(spark, tmp_path):
    """The production front door in one test: Confluent-Avro Debezium
    envelopes produced to the fixture broker, tailed over the wire,
    decoded Arrow-batched, applied through the fenced lake sink."""
    from datax_spark.lake.table import LakeTable
    from datax_spark.sources.kafka_broker import start_broker
    from datax_spark.sources.kafka_live import (
        KafkaClient,
        partition_for,
        tail_kafka_and_apply,
    )

    srv = start_broker()
    state = srv.state
    try:
        state.create_topic("dbz-avro", 2)
        host, port = srv.server_address
        s1, s2 = _dbz_schema(False), _dbz_schema(True)
        cli = KafkaClient(host, port)
        try:
            expected = {}
            for j in range(12):
                key = f"r{j}".encode()
                pid = partition_for(key, 2)
                cli.produce("dbz-avro", pid, [(key, _dbz_avro(
                    1, s1, {"repo": f"r{j}", "path": "p", "commit": f"c{j}",
                            "content": f"v0-{j}"}, None, "c", 100 + j), 0)])
                expected[(f"r{j}", "p", f"c{j}")] = (None, f"v0-{j}")
            for j in range(0, 12, 3):  # evolved updates
                key = f"r{j}".encode()
                pid = partition_for(key, 2)
                cli.produce("dbz-avro", pid, [(key, _dbz_avro(
                    2, s2, {"repo": f"r{j}", "path": "p", "commit": f"c{j}",
                            "lang": "py", "content": f"v1-{j}"},
                    None, "u", 200 + j), 0)])
                expected[(f"r{j}", "p", f"c{j}")] = ("py", f"v1-{j}")
        finally:
            cli.close()

        payload = spark.createDataFrame([], PAYLOAD_DDL).schema
        table = LakeTable.create(
            spark, str(tmp_path / "tbl"), payload,
            key_cols=["repo", "path", "commit"], bucket_key="repo",
            num_buckets=4)
        tail_kafka_and_apply(
            spark, str(tmp_path / "tbl"), host, port, "dbz-avro",
            checkpoint_dir=str(tmp_path / "ckpt"), envelope="debezium",
            value_format="confluent_avro",
            registry_schemas={1: s1, 2: s2},
            timeout_sec=120,
        )
        got = {(r.repo, r.path, r.commit): (r.lang, r.content)
               for r in table.read().collect()}
        assert got == expected
    finally:
        srv.shutdown()
        srv.server_close()
