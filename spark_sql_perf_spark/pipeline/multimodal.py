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


# -- frame sampling: 1 binary row -> N sampled-frame rows ----------------

_FRAME_BYTES = 64
_FRAME_STRIDE = 4

SAMPLED_FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_checksum", LongType()),
    ]
)


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Every ``_FRAME_STRIDE``-th fixed-size frame of each payload —
    the video-keyframe-extraction batch shape: one input row fans out to
    a variable number of output rows WITHIN the Arrow batch, so the
    explode happens executor-side with no shuffle and no driver round
    trip. The per-frame work (here a checksum; in production a JPEG
    encode of the frame) runs on numpy buffers."""
    import numpy as np

    for pdf in batches:
        doc_ids: list[int] = []
        idxs: list[int] = []
        sums: list[int] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(bytes(payload), dtype=np.uint8)
            n_frames = max(len(b) // _FRAME_BYTES, 1)
            for f in range(0, n_frames, _FRAME_STRIDE):
                seg = b[f * _FRAME_BYTES : (f + 1) * _FRAME_BYTES]
                doc_ids.append(doc_id)
                idxs.append(f)
                sums.append(int(seg.sum()))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_checksum": pd.Series(sums, dtype="int64"),
            }
        )


@query(
    "m2_frame_sample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, LENGTH(text) AS n,
             GREATEST(LENGTH(text) // {_FRAME_BYTES}, 1) AS n_frames
      FROM documents),
    s AS (
      SELECT doc_id, text, n,
             unnest(range(0, n_frames, {_FRAME_STRIDE})) AS f
      FROM d)
    SELECT doc_id, CAST(f AS INT) AS frame_idx,
           CAST(COALESCE(list_sum(list_transform(
             range(f * {_FRAME_BYTES} + 1,
                   LEAST(f * {_FRAME_BYTES} + {_FRAME_BYTES}, n) + 1),
             i -> ord(SUBSTR(text, i, 1)))), 0) AS BIGINT) AS frame_checksum
    FROM s
    """,
)
def m2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a binary 'video' column: every 4th 64-byte
    frame, one output row per sampled frame (mapInPandas row fan-out).
    The checksum stands in for per-frame decode; the fan-out, typed
    schema, and Arrow batch shape are the real plumbing a keyframe
    extractor needs at 100 TB."""
    return binary_corpus(spark, sf_dir).mapInPandas(
        _frame_sample_batches, schema=SAMPLED_FRAMES_SCHEMA
    )


# -- feature extraction: fixed-width byte histogram ----------------------

_N_HIST_BUCKETS = 8  # byte >> 5

HIST_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("bucket", IntegerType()),
        StructField("cnt", LongType()),
    ]
)


def _histogram_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fixed-width feature vector per payload (numpy bincount over the
    byte buffer — the vectorized shape of an embedding/feature
    extractor), emitted flat as (doc_id, bucket, cnt) rows."""
    import numpy as np

    for pdf in batches:
        doc_ids: list[int] = []
        buckets: list[int] = []
        cnts: list[int] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(bytes(payload), dtype=np.uint8)
            hist = np.bincount(b >> 5, minlength=_N_HIST_BUCKETS)
            for j in range(_N_HIST_BUCKETS):
                doc_ids.append(doc_id)
                buckets.append(j)
                cnts.append(int(hist[j]))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "bucket": pd.Series(buckets, dtype="int32"),
                "cnt": pd.Series(cnts, dtype="int64"),
            }
        )


@query(
    "m3_byte_histogram",
    oracle=f"""
    WITH codes AS (
      SELECT doc_id,
             list_transform(range(1, LENGTH(text) + 1),
                            i -> ord(SUBSTR(text, i, 1))) AS cs
      FROM documents),
    b AS (SELECT unnest(range(0, {_N_HIST_BUCKETS})) AS bucket)
    SELECT doc_id, CAST(bucket AS INT) AS bucket,
           CAST(len(list_filter(cs, c -> c // 32 = bucket)) AS BIGINT) AS cnt
    FROM codes, b
    """,
)
def m3_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over the binary column: an 8-bucket byte
    histogram per payload (numpy-vectorized in Arrow batches), flattened
    to (doc_id, bucket, cnt) so the engine-vs-engine compare stays on a
    flat schema."""
    return binary_corpus(spark, sf_dir).mapInPandas(
        _histogram_batches, schema=HIST_SCHEMA
    )


# -- resize: metadata transform + strided thumbnail checksum -------------

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("new_width", IntegerType()),
        StructField("new_height", IntegerType()),
        StructField("thumb_checksum", LongType()),
    ]
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Half-resolution 'resize': dims from the fake decoder halved, the
    thumbnail standing in as the stride-4 byte subsample's checksum.
    In production this body is PIL's Image.resize over the decoded
    buffer; schema, batching, and memory shape are identical."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            _, w, h, _ = _fake_decode(raw)
            b = np.frombuffer(raw, dtype=np.uint8)
            rows.append(
                (doc_id, w, h, w // 2, h // 2, int(b[::_FRAME_STRIDE].sum()))
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "width", "height",
                "new_width", "new_height", "thumb_checksum",
            ],
        ).astype(
            {
                "doc_id": "int64", "width": "int32", "height": "int32",
                "new_width": "int32", "new_height": "int32",
                "thumb_checksum": "int64",
            }
        )


@query(
    "m4_resize_thumbs",
    oracle=f"""
    SELECT doc_id,
           16 + ord(SUBSTR(text, 1, 1)) % 64 AS width,
           16 + ord(SUBSTR(text, -1, 1)) % 64 AS height,
           (16 + ord(SUBSTR(text, 1, 1)) % 64) // 2 AS new_width,
           (16 + ord(SUBSTR(text, -1, 1)) % 64) // 2 AS new_height,
           CAST(list_sum(list_transform(
             range(1, LENGTH(text) + 1, {_FRAME_STRIDE}),
             i -> ord(SUBSTR(text, i, 1)))) AS BIGINT) AS thumb_checksum
    FROM documents
    """,
)
def m4_resize_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over the binary column: halved dimensions plus a
    strided-subsample thumbnail checksum per payload, Arrow-batched."""
    return binary_corpus(spark, sf_dir).mapInPandas(
        _resize_batches, schema=RESIZED_SCHEMA
    )
