"""Streaming exact deduplication — the streaming face of the d1 dedup
family, for a training-data pipeline that ingests documents/events
continuously instead of in batch.

``dropDuplicatesWithinWatermark`` is the idiomatic Structured Streaming
operator here: state for a key is retained only for the watermark delay
(bounded state — the property that lets this run forever at 100 TB/day),
and any duplicate arriving within that window is suppressed. The key is
a content hash of the full row identity, which turns an at-least-once
upstream (re-delivered files, replayed batches — the normal failure
mode of large ingest) into exactly-once rows downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .windows import stream_events


def content_key(df: DataFrame) -> DataFrame:
    """Attach the row-identity hash over every payload column including
    the timestamp, so a re-delivered row collapses no matter which
    file/batch carried it. ``xxhash64`` hashes each column with its type
    and null-ness intact — unlike a ``concat_ws`` string (which silently
    drops NULL fields and lets a delimiter inside a value alias two
    different rows), distinct rows cannot collide by construction here
    short of an actual 64-bit hash collision."""
    return df.withColumn(
        "content_key",
        F.xxhash64(
            F.col("event_id"), F.col("ts"), F.col("user_id"),
            F.col("event_type"), F.col("value"), F.col("props"),
        ),
    )


def streaming_dedup(
    spark: SparkSession, sf_dir: str, stream_dir: str, delay: str = "2 hours"
) -> DataFrame:
    """events as a stream, deduplicated on content identity within a
    watermark: state per key lives for ``delay`` of event time, then is
    dropped — bounded state, append output."""
    ev = stream_events(spark, sf_dir, stream_dir).withWatermark("ts", delay)
    return content_key(ev).dropDuplicatesWithinWatermark(["content_key"])


def run_stream_append(df: DataFrame, table_name: str) -> None:
    """Drain an append-mode streaming DataFrame into a memory sink
    (dedup/map-like operators are append; aggregations use
    ``run_stream_once``'s complete mode)."""
    q = (
        df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
