"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are NOT available in this container
(per the build constraints), so the decode step is a clearly-marked
deterministic fake — but the Spark-side plumbing is real and tested:
binary columns, Arrow-batched `mapInPandas` with a typed output schema,
and partition-sized batch processing. Swap `_fake_decode` for a real
decoder (PIL / torchaudio / pyav) on a cluster that has one.

Scale notes: binary payloads ride the normal columnar path (parquet
BYTE_ARRAY); mapInPandas streams Arrow batches so peak memory is
O(batch), not O(partition); metadata-only queries never touch the bytes
thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import table
from ..operators.registry import query

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[str, int, int, int]:
    """Deterministic stand-in for an image/av decoder.

    Real decoders (PIL, pyav, soundfile) are unavailable in this
    environment — raise if someone expects real decode semantics.
    """
    if not isinstance(payload, (bytes, bytearray)):
        raise NotImplementedError(
            "real media decode requires PIL/pyav/soundfile; this container "
            "has none — _fake_decode only handles synthetic binary payloads"
        )
    # fake dims derived from payload content: deterministic, schema-correct
    w = 16 + payload[0] % 64 if payload else 16
    h = 16 + payload[-1] % 64 if payload else 16
    fmt = "fake/rgb8"
    return fmt, w, h, 1


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        decoded = [_fake_decode(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "format": [d[0] for d in decoded],
                "width": [d[1] for d in decoded],
                "height": [d[2] for d in decoded],
                "n_frames": [d[3] for d in decoded],
            }
        )


def binary_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text re-encoded as an opaque binary payload column —
    the stand-in for an image/audio bytes column."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )


def decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary -> typed metadata via Arrow-batched mapInPandas."""
    return binary_corpus(spark, sf_dir).mapInPandas(
        _decode_batches, schema=DECODED_SCHEMA
    )


@query(
    "m1_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_bytes,
           'fake/rgb8' AS format,
           16 + ord(SUBSTR(text, 1, 1)) % 64 AS width,
           16 + ord(SUBSTR(text, -1, 1)) % 64 AS height,
           1 AS n_frames
    FROM documents
    """,
)
def m1_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline (stubbed decoder, real plumbing).

    Oracle-checkable because the fake decoder's outputs are pure functions
    of the payload bytes (ascii text, so byte == ord(char)).
    """
    return decode_metadata(spark, sf_dir)
