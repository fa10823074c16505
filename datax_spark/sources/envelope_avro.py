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

from datax_spark.sources.avro_codec import SchemaRegistry, avro_record_to_json


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
