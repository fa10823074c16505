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


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("resized_sha", StringType()),
    ]
)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Arrow-batched media RESIZE via mapInPandas — plumbing real, the
    pixel work STUBBED (no PIL in this container): the 'resized' output
    is identified by a deterministic content address
    ``sha256(sha256(payload) + 'x{w}x{h}')`` so tests and the DuckDB
    oracle can verify the exact per-row transform. Swap the body for
    ``PIL.Image.resize`` in production; schema, batching, and
    partitioning are what carry to 100 TB (one Arrow batch per decode
    call, no row-at-a-time Python crossing the boundary).
    """

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        suffix = f"x{width}x{height}"
        for pdf in it:
            shas = pdf["payload"].map(
                lambda b: hashlib.sha256(
                    (hashlib.sha256(b).hexdigest() + suffix).encode()
                ).hexdigest()
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "resized_sha": shas,
                }
            )

    return df.mapInPandas(_batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", LongType()),
        StructField("byte_offset", LongType()),
        StructField("frame_sha", StringType()),
    ]
)


def frame_sample_stub(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling plumbing: ONE input row fans out to
    ``n_frames`` rows (frame_index, byte_offset, frame_sha), the shape a
    real ffmpeg/pyav keyframe sampler produces. Offsets are evenly
    spaced over the payload (floor(i*len/n)); the frame content is
    STUBBED as ``sha256(payload_sha + ':' + offset)``. mapInPandas
    handles the 1->N fan-out inside the Arrow batch — no explode
    shuffle, no per-row Python UDF."""

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "frame_index": [], "byte_offset": [],
                   "frame_sha": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                sha = hashlib.sha256(payload).hexdigest()
                n = len(payload)
                for i in range(n_frames):
                    off = (i * n) // n_frames
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(i)
                    out["byte_offset"].append(off)
                    out["frame_sha"].append(
                        hashlib.sha256(f"{sha}:{off}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=FRAME_SCHEMA)


def feature_extract_stub(df: DataFrame, dim: int = 8) -> DataFrame:
    """Embedding-style feature extraction plumbing: binary payload ->
    ``array<double>`` of ``dim`` values in [0, 1). The real model call
    (CLIP/wav2vec) is STUBBED with hash arithmetic — feature j =
    (int(sha256(payload)[4j:4j+4], 16) % 1000) / 1000 — deterministic
    and DuckDB-reproducible, so the oracle checks the exact vector. The
    output column shape matches the `embeddings` table contract
    (`array<float>`-compatible), ready for the ANN/dedup operators."""
    from pyspark.sql.types import ArrayType, DoubleType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            feats = pdf["payload"].map(
                lambda b: [
                    (int(hashlib.sha256(b).hexdigest()[4 * j: 4 * j + 4], 16)
                     % 1000) / 1000.0
                    for j in range(dim)
                ]
            )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.mapInPandas(_batches, schema=schema)
