"""Streaming ANN serving: a stream of query vectors joined per
micro-batch against a STATIC adaptive-bucketed corpus (sim6's
lsh_buckets_df layout), top-k per query.

The serving shape at scale: the corpus index is built once (bucketed,
persisted / laid out on storage), queries arrive continuously, and each
micro-batch is a stateless bucket equi-join + per-query top-k — no
streaming state at all, so it runs through foreachBatch (per-query
ranking is a plain window inside the batch; Spark's streaming engine
does not allow non-time windows on the stream itself, and serving
systems rank per request anyway).

Query-side bucket assignment under the adaptive split: a corpus region
carries exactly one key per split depth 0..SPLIT_LEVELS (unsplit sig0,
or sig0+sigx1+marker_1, recursing to sig0+sigx1+sigx2+marker_2). The
query cannot know a region's depth without consulting the index, so it
emits ALL SPLIT_LEVELS+1 candidate keys (a small explode) and
equi-joins the corpus key — at most one key exists on the corpus side
per region, so this costs `levels` extra probe rows per query, never a
second scan and never duplicate matches. Results are identical to
running the same expression in batch over all queries at once (asserted
across micro-batch slicings in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lsh import (
    LSH_BITS,
    SPLIT_BITS,
    SPLIT_LEVELS,
    sign_lsh_sig_spark,
    split_marker,
)

# pipeline.similarity (a registry module) is imported lazily inside the
# functions below: pipeline/__init__ imports its modules in a fixed
# order and dedup's oracle construction imports similarity at module
# load, so a top-level import here can observe a partially-initialized
# module depending on which package the process touches first.
# functions.lsh is a cycle-free leaf and stays top-level.


def build_ann_index(vecs: DataFrame, dim: int | None = None) -> DataFrame:
    """The static corpus index: (vec_id, v, sig) under the adaptive
    split, persisted — built once, probed by every batch."""
    from ..pipeline.similarity import lsh_buckets_df

    return lsh_buckets_df(vecs, dim=dim).persist()


def _query_keys(queries: DataFrame, dim: int | None = None) -> DataFrame:
    """Each query with its SPLIT_LEVELS+1 candidate bucket keys exploded
    (one per possible split depth of the region it probes — at most one
    exists on the index side, so this is `levels` extra probe rows per
    query, never duplicate matches)."""
    keys = [sign_lsh_sig_spark(dim=dim)]
    for i in range(1, SPLIT_LEVELS + 1):
        sigx = sign_lsh_sig_spark(
            SPLIT_BITS, dim=dim, lo=LSH_BITS + (i - 1) * SPLIT_BITS
        )
        keys.append(keys[-1] - F.lit(0 if i == 1 else split_marker(i - 1))
                    + sigx + F.lit(split_marker(i)))
    return queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.explode(F.array(*keys)).alias("sig"),
    )


def ann_serve_batch(
    queries: DataFrame, index: DataFrame, k: int = 3, dim: int | None = None
) -> DataFrame:
    """One serving batch: probe both candidate keys, exact-cosine rank
    within the matched bucket, top-k per query (self-match excluded)."""
    from ..pipeline.similarity import _cosine

    q = _query_keys(queries, dim)
    c = index.alias("c")
    scored = (
        q.alias("q")
        .join(c, (F.col("q.sig") == F.col("c.sig"))
              & (F.col("q.query_id") != F.col("c.vec_id")))
        .select(
            F.col("q.query_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.round(_cosine("q.qv", "c.v", dim), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= k)
    )


def stream_vectors(
    spark: SparkSession,
    sf_dir: str,
    stream_dir: str,
    max_files_per_trigger: int | None = None,
    schema=None,
) -> DataFrame:
    """The embeddings table as a file stream of (vec_id, v) queries.
    Pass ``schema`` (e.g. from an already-loaded corpus frame) to skip
    the extra footer read the schema probe otherwise performs."""
    if schema is None:
        schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(stream_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def streaming_ann_serve(
    spark: SparkSession,
    sf_dir: str,
    stream_dir: str,
    out_dir: str,
    k: int = 3,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain the query stream against the static index, appending each
    batch's top-k matches to a parquet results sink (the serving-log
    deployment shape; foreachBatch calls are serialized by the engine)."""
    raw = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = raw.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    from ..pipeline.similarity import embedding_dim

    dim = embedding_dim(corpus, key=sf_dir)
    index = build_ann_index(corpus, dim)
    queries = stream_vectors(
        spark, sf_dir, stream_dir, max_files_per_trigger, schema=raw.schema
    )

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        ann_serve_batch(batch_df, index, k, dim).write.mode("append").parquet(
            out_dir
        )

    q = (
        queries.writeStream.foreachBatch(sink)
        # Checkpoint the source offsets: without it a restart after a
        # mid-drain failure re-reads ALL input files and appends duplicate
        # rows to the serving log. With it the restart resumes from the
        # last committed batch — the parquet append is still at-least-once
        # across a crash INSIDE a batch (foreachBatch's documented
        # contract), but never replays whole completed batches.
        .option("checkpointLocation", f"{out_dir}_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(120):
            q.stop()
            raise TimeoutError("streaming_ann_serve: drain exceeded 120s")
    finally:
        index.unpersist(blocking=False)
