"""Multimodal (binary) column plumbing: decode / feature-extract stubs.

Images/audio/video are carried as opaque ``binary`` columns plus a typed
metadata struct. The Spark-side machinery — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested; the
actual media decode is STUBBED (``decode_stub``) because no image/audio
libraries ship in this container. Swap ``_decode_one`` for PIL/ffmpeg in
production; nothing else changes.

Scale notes: mapInPandas streams Arrow batches (bounded by
spark.sql.execution.arrow.maxRecordsPerBatch), so a 100 TB binary scan
never materializes a partition in memory; keep media files row-grouped
small in parquet or use a path column + ranged reads for >100 MB blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("byte_len", LongType()),
        StructField("content_sha", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def to_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a text column as an opaque binary payload + typed metadata.

    Stand-in for reading real media files (`spark.read.format("binaryFile")`
    in production); encode() is a JVM expression.
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("text/plain").alias("mime"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _decode_one(payload: bytes) -> tuple[int, str, int, int]:
    """STUB media decode: real length+sha256, fake dimensions.

    Replace with PIL.Image.open / soundfile / pyav in production. The
    fake width/height are a deterministic function of the bytes so tests
    and oracles stay stable.
    """
    n = len(payload)
    sha = hashlib.sha256(payload).hexdigest()
    width = 16 + (n % 64)  # deterministic fake: STUB
    height = 16 + (int(sha[:4], 16) % 64)  # deterministic fake: STUB
    return n, sha, width, height


def decode_stub(df: DataFrame) -> DataFrame:
    """Arrow-batched 'decode' of media payloads via mapInPandas.

    One pandas call per Arrow batch (vectorized transfer; the per-row
    Python inside the batch is the unavoidable decode-library call this
    stubs). Output schema is DECODED_SCHEMA.
    """

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            decoded = pdf["payload"].map(_decode_one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "byte_len": [d[0] for d in decoded],
                    "content_sha": [d[1] for d in decoded],
                    "width": [d[2] for d in decoded],
                    "height": [d[3] for d in decoded],
                }
            )

    return df.mapInPandas(_batches, schema=DECODED_SCHEMA)
