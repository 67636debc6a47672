"""Streaming incremental near-dup probe (the streaming face of d10):
the at-rest index is built once, each arriving micro-batch is probed
through the same pipeline as the batch query, and the merged target
must (a) converge to EXACTLY the batch d10 answer and (b) be
replay-idempotent — the same file is delivered twice as two
micro-batches and the second pass must not change the table."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_TINY


def test_streaming_probe_matches_batch_and_survives_replay(spark):
    from spark_sql_perf_spark.catalog import table
    from spark_sql_perf_spark.operators import QUERIES
    from spark_sql_perf_spark.streaming.dedup import (
        build_probe_index,
        streaming_incremental_probe,
    )

    work = tempfile.mkdtemp(prefix="probe-stream-")
    index_dir = os.path.join(work, "index")
    stream_dir = os.path.join(work, "arrivals")
    target_dir = os.path.join(work, "decisions")
    os.makedirs(stream_dir)

    # the arriving batch = d10's planted batch, as a documents-shaped
    # file (full table schema so the stream source reads it verbatim)
    docs = table(spark, SF_DIR_TINY, "documents")
    near = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lower("text"), F.lit(" probe batch suffix")).alias("text"),
        "lang", "source", "n_chars",
    )
    novel = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.array_join(F.reverse(F.split(F.lower("text"), r"\s+")), " ").alias(
            "text"
        ),
        "lang", "source", "n_chars",
    )
    batch_file = os.path.join(work, "batch.parquet")
    near.unionAll(novel).coalesce(1).write.parquet(batch_file)
    part = [f for f in os.listdir(batch_file) if f.endswith(".parquet")][0]
    # two staged copies of the SAME batch -> with maxFilesPerTrigger=1
    # the second micro-batch is a full replay of the first
    for copy in ("arrival-0.parquet", "arrival-1.parquet"):
        os.symlink(
            os.path.join(batch_file, part), os.path.join(stream_dir, copy)
        )

    build_probe_index(spark, SF_DIR_TINY, index_dir)
    q = streaming_incremental_probe(
        spark, SF_DIR_TINY, stream_dir, index_dir, target_dir,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)

    cols = ["batch_id", "n_cand", "n_match", "match_id_min",
            "best_jaccard", "is_novel"]
    got = {
        r["batch_id"]: tuple(r[c] for c in cols[1:])
        for r in spark.read.parquet(target_dir).select(*cols).collect()
    }
    want = {
        r["batch_id"]: tuple(r[c] for c in cols[1:])
        for r in QUERIES["d10_incremental_lsh_probe"](
            spark, SF_DIR_TINY
        ).collect()
    }
    # replay collapsed: one decision per batch doc, equal to batch d10
    assert got == want
    assert any(v[-1] for v in got.values())  # novels present
    assert any(not v[-1] for v in got.values())  # matches present
