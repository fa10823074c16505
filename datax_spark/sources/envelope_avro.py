"""Confluent-Avro envelope values -> JSON text, Arrow-batched.

The bridge between ``sources/avro_codec.py`` (pure-stdlib Avro +
Confluent framing) and the engine's pure-Column envelope parsers:
Debezium's AvroConverter and JsonConverter emit the SAME logical
document, so decoding each framed value to compact JSON text lets
``from_debezium`` / the DDL driver / the fat-topic router / SCD2 run
unchanged downstream.

Scale shape: the decode is the one unavoidable Python stage (no
spark-avro jar in this environment — module docstring of avro_codec has
the probe evidence), so it runs as a scalar ``pandas_udf`` (Arrow
batches, one Python round-trip per ~10k rows, never per-row IPC). The
SchemaRegistry client is pickled once per executor and caches parsed
schemas per schema id, so registry HTTP traffic is O(distinct schema
ids per executor), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from datax_spark.sources.avro_codec import (
    SchemaRegistry,
    avro_record_to_json,
    encode,
    frame_confluent,
    parse_schema,
)


def avro_values_to_json(
    df: DataFrame,
    value_col: str = "value",
    url: str | None = None,
    schemas: dict[int, str] | None = None,
) -> DataFrame:
    """Replace a binary Confluent-framed Avro column with its JSON text.
    ``url`` points at a Schema Registry (``GET /schemas/ids/{id}``);
    ``schemas`` embeds writer schemas in the job config instead
    (offline / air-gapped deployments). Null values stay null; a frame
    that fails to decode raises (corrupt input is a job error, not a
    silent drop — quarantine happens downstream on CONTENT, transport
    corruption must surface)."""
    registry = SchemaRegistry(url=url, schemas=schemas)

    @pandas_udf(StringType())
    def _decode(vals):
        return vals.map(
            lambda b: None
            if b is None
            else avro_record_to_json(registry, bytes(b))
        )

    return df.withColumn(value_col, _decode(F.col(value_col)))


# ---------------------------------------------------------------------------
# emit side: JSON envelope text -> Confluent-framed Avro
# ---------------------------------------------------------------------------

#: Spark payload types expressible through the JSON hop without loss.
_AVRO_OF_SPARK = {
    "string": "string",
    "long": "long",
    "integer": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
}


def debezium_avro_schema(payload_schema, name: str = "Envelope") -> str:
    """Generate the Debezium envelope's Avro schema (JSON text) for a
    Spark payload schema — the shape ``to_debezium`` emits: nullable
    ``before``/``after`` records of the payload columns (each field
    itself nullable), ``op``, nullable ``ts_ms``, and ``source.lsn``.
    Registering this under an id makes the engine's emitted envelopes
    decodable by any Confluent-ecosystem consumer (and by
    ``avro_values_to_json`` on the way back in).

    Payload columns must be JSON-faithful primitives
    (string/long/int/double/float/boolean) — binary or temporal columns
    would round through envelope JSON lossily, so they raise here.
    """
    fields = []
    for f in payload_schema.fields:
        t = _AVRO_OF_SPARK.get(f.dataType.typeName())
        if t is None:
            raise ValueError(
                f"payload column {f.name!r} has type "
                f"{f.dataType.simpleString()}: not JSON-faithful through "
                "the envelope hop (supported: "
                f"{sorted(_AVRO_OF_SPARK)})"
            )
        fields.append({"name": f.name, "type": ["null", t]})
    value = {"type": "record", "name": "Value", "fields": fields}
    env = {
        "type": "record",
        "name": name,
        "fields": [
            {"name": "before", "type": ["null", value]},
            {"name": "after", "type": ["null", "Value"]},
            {"name": "op", "type": "string"},
            {"name": "ts_ms", "type": ["null", "long"]},
            {
                "name": "source",
                "type": {
                    "type": "record",
                    "name": "Source",
                    "fields": [
                        {"name": "lsn", "type": ["null", "long"]},
                        {"name": "ts_ms", "type": ["null", "long"]},
                    ],
                },
            },
        ],
    }
    import json as _json

    return _json.dumps(env)


def json_values_to_avro(
    df: DataFrame,
    schema_id: int,
    schema: str,
    value_col: str = "value",
) -> DataFrame:
    """Replace a JSON envelope text column with Confluent-framed Avro
    binary under ``schema`` (registered as ``schema_id``) — the encode
    twin of ``avro_values_to_json``. Same scale shape: one scalar
    ``pandas_udf``, schema parsed once per executor, Arrow-batched.
    Null values stay null; a row that does not fit the schema raises
    (the emitter owns its envelopes — a mismatch is a bug, not dirt)."""
    import json as _json

    parsed = parse_schema(schema)

    @pandas_udf("binary")
    def _enc(vals):
        return vals.map(
            lambda s: None
            if s is None
            else frame_confluent(schema_id, encode(parsed, _json.loads(s)))
        )

    return df.withColumn(value_col, _enc(F.col(value_col)))
