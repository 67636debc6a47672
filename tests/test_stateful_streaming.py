"""applyInPandasWithState: state must persist ACROSS micro-batches —
staged as two files consumed one per trigger."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_TINY


def test_running_totals_across_microbatches(spark):
    from spark_sql_perf_spark.catalog import table
    from spark_sql_perf_spark.streaming.stateful import running_user_totals

    ev = table(spark, SF_DIR_TINY, "events").select("event_id", "user_id", "value")

    # stage two parquet files; maxFilesPerTrigger=1 -> two micro-batches
    stream_dir = tempfile.mkdtemp(prefix="stateful-src-")
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{stream_dir}/b0")
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{stream_dir}/b1")
    flat = tempfile.mkdtemp(prefix="stateful-flat-")
    n = 0
    for sub in ("b0", "b1"):
        for f in os.listdir(f"{stream_dir}/{sub}"):
            if f.endswith(".parquet"):
                os.symlink(f"{stream_dir}/{sub}/{f}", f"{flat}/{n:03d}.parquet")
                n += 1
    assert n == 2

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(flat)
    )
    out = running_user_totals(stream.select("user_id", "value"))
    q = (
        out.writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last emitted row per user must equal the full-batch aggregate
    got = (
        spark.table("user_totals")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
            F.max("max_value").alias("max_value"),
        )
    )
    want = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("value").alias("max_value"),
    )
    g = {r.user_id: (r.n_events, round(r.total_value, 6), r.max_value) for r in got.collect()}
    w = {r.user_id: (r.n_events, round(r.total_value, 6), r.max_value) for r in want.collect()}
    assert g == w
    # multiple emissions prove state crossed batches (users present in both
    # halves emit twice)
    emissions = spark.table("user_totals").count()
    assert emissions > len(w)
