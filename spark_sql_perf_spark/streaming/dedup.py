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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sink import merge_into_buckets
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


# ---------------------------------------------------------------------------
# streaming incremental NEAR-dup probe (the streaming face of d10)
# ---------------------------------------------------------------------------


def stream_documents(
    spark: SparkSession,
    sf_dir: str,
    stream_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``documents``-shaped rows as a true stream (file source watching
    ``stream_dir``) — schema taken from a batch read of the real table,
    like stream_events."""
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reader = spark.readStream.schema(raw.schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(stream_dir)


def build_probe_index(spark: SparkSession, sf_dir: str, index_dir: str) -> None:
    """Materialize d10's corpus-side relations AT REST: (id, shingle
    hash) sets, minhash signatures, and band buckets as parquet under
    ``index_dir`` — computed ONCE from the static corpus, reused by
    every arriving micro-batch. This is the 100 TB division of labor
    the batch query can only document: index cost amortizes over the
    stream's lifetime, per-batch cost is the broadcast probe alone."""
    from ..catalog import table
    from ..pipeline.dedup import _minhash_frames

    idx = table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), F.lower("text").alias("text")
    )
    ihashed, isigs, ibands = _minhash_frames(idx)
    ihashed.write.mode("overwrite").parquet(f"{index_dir}/hashed")
    isigs.write.mode("overwrite").parquet(f"{index_dir}/sigs")
    # the probe's first join is an equi-join on (band, bh): lay the
    # bucket relation out partitioned by band so a probe prunes to the
    # band directories its signatures actually hit
    ibands.write.mode("overwrite").partitionBy("band").parquet(
        f"{index_dir}/bands"
    )


def streaming_incremental_probe(
    spark: SparkSession,
    sf_dir: str,
    stream_dir: str,
    index_dir: str,
    target_dir: str,
    max_files_per_trigger: int | None = None,
    grow_index: bool = False,
):
    """Probe an arriving document stream against the at-rest index and
    MERGE each micro-batch's decisions into a bucket-partitioned
    parquet target (exactly the upsert-sink discipline): rows dedupe on
    batch_id, so an at-least-once upstream that re-delivers a whole
    file converges to the same table — replay-idempotent, asserted in
    test_streaming_probe.py by draining the same file twice and
    comparing against the BATCH d10 answer.

    foreachBatch is the right engine surface here: the probe is a
    multi-join + aggregation pipeline (not expressible as a single
    streaming stateful operator), and per-micro-batch batch-mode
    execution against static index relations is precisely its
    production shape.

    ``grow_index=True`` closes the continuous-ingestion loop: a batch's
    ACCEPTED novels are appended back to the at-rest index (signatures,
    shingle sets, band buckets), so later batches dedup against earlier
    arrivals, not just the original corpus. Replay safety is a
    three-part contract, each part load-bearing: (a) the probe excludes
    self-id matches (a redelivered doc would otherwise match its own
    earlier acceptance and flip novel -> dup); (b) the decision merge
    keeps the FIRST stored decision (_is_new ASC); (c) the append is
    guarded by an anti-join against the LIVE index's ids, so a replayed
    batch appends nothing. The index frames are re-read from parquet
    inside every micro-batch — each batch must see the appends of the
    previous one."""
    from pyspark.sql import Window

    from ..pipeline.dedup import probe_with_index

    def one_per_key(df: DataFrame) -> DataFrame:
        # _is_new ASC: the stored decision wins, a replay cannot rewrite
        # history (with a static index both rows are identical; with a
        # grown index only the FIRST decision is the true one)
        w = Window.partitionBy("batch_id").orderBy(F.col("_is_new").asc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def apply(batch_df: DataFrame, _batch_id: int) -> None:
        from ..pipeline.dedup import _minhash_frames

        # fresh per micro-batch: the live index includes prior appends
        ihashed = spark.read.parquet(f"{index_dir}/hashed")
        isigs = spark.read.parquet(f"{index_dir}/sigs")
        ibands = spark.read.parquet(f"{index_dir}/bands").select(
            "id", "band", "bh"
        )
        batch = batch_df.select(
            F.col("doc_id").alias("id"), F.lower("text").alias("text")
        )
        out = probe_with_index(
            ihashed, isigs, ibands, batch, exclude_self=grow_index
        )
        if not grow_index:
            merge_into_buckets(out, target_dir, "batch_id", one_per_key)
            return
        # Freeze decisions BEFORE mutating the index: localCheckpoint
        # (not cache) because a cache-evicted recompute would re-read
        # the GROWN index and silently flip novel -> dup mid-batch.
        # The checkpoint blocks are released once the batch's merge is
        # done — a long-running stream must not accumulate one pinned
        # RDD per micro-batch.
        out = out.localCheckpoint(eager=True)
        try:
            # decide + append in one pass: novels not already indexed
            # (the anti-join makes a replayed append a no-op)
            fresh = (
                out.where(F.col("is_novel"))
                .select(F.col("batch_id").alias("id"))
                .join(isigs.select("id"), "id", "left_anti")
            )
            novels = batch.join(F.broadcast(fresh), "id")
            nhashed, nsigs, nbands = _minhash_frames(novels)
            nhashed.write.mode("append").parquet(f"{index_dir}/hashed")
            nsigs.write.mode("append").parquet(f"{index_dir}/sigs")
            nbands.write.mode("append").partitionBy("band").parquet(
                f"{index_dir}/bands"
            )
            merge_into_buckets(out, target_dir, "batch_id", one_per_key)
        finally:
            try:
                out._jdf.queryExecution().analyzed().rdd().unpersist(False)
            except Exception:
                pass

    stream = stream_documents(spark, sf_dir, stream_dir, max_files_per_trigger)
    return (
        stream.writeStream.foreachBatch(apply)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", os.path.join(target_dir, "_checkpoint")
        )
        .start()
    )


# ---------------------------------------------------------------------------
# streaming quality cut (the streaming face of c16's Gopher cut)
# ---------------------------------------------------------------------------


def streaming_quality_cut(
    spark: SparkSession, sf_dir: str, stream_dir: str, delay: str = "2 hours"
) -> DataFrame:
    """c16's Gopher repetition cut + exact dedup applied ON THE STREAM:
    the in-row top-gram fold is a stateless projection (it rides each
    micro-batch with zero state), and duplicate suppression is
    dropDuplicatesWithinWatermark on the content hash — bounded state,
    the same exactly-once discipline as streaming_dedup.

    Documents carry no event time, so the dedup window is ARRIVAL time
    (an injected processing-time column) — the standard choice for
    ingest dedup where re-deliveries cluster within minutes of the
    original. Cut documents never enter the dedup state at all: the
    filter sits below the stateful operator, so boilerplate floods
    (the very thing the Gopher rules drop) cannot balloon state."""
    from ..pipeline.curation import _WS_SPLIT, repetition_cut_flag

    docs = stream_documents(spark, sf_dir, stream_dir)
    kept = (
        docs.withColumn("text", F.lower("text"))
        .withColumn("ws", F.split("text", _WS_SPLIT))
        .where(~repetition_cut_flag())
        .drop("ws")
    )
    return (
        kept.withColumn("arrival_ts", F.current_timestamp())
        .withWatermark("arrival_ts", delay)
        .withColumn("content_key", F.md5("text"))
        .dropDuplicatesWithinWatermark(["content_key"])
    )
