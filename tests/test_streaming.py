"""Structured Streaming smoke: the tumbling-window transformation produces
identical results on a true stream (file source + watermark + AvailableNow
trigger) and in batch."""

from __future__ import annotations

import os
import tempfile

from tests.conftest import SF_DIR_TINY


def test_streaming_tumbling_matches_batch(spark):
    from spark_sql_perf_spark.operators import QUERIES
    from spark_sql_perf_spark.streaming.windows import (
        run_stream_once,
        streaming_tumbling,
    )

    # file stream source watches a directory; stage the single-file table
    stream_dir = tempfile.mkdtemp(prefix="events-stream-")
    os.symlink(
        f"{SF_DIR_TINY}/events.parquet", os.path.join(stream_dir, "part-0.parquet")
    )
    stream_df = streaming_tumbling(spark, SF_DIR_TINY, stream_dir)
    assert stream_df.isStreaming
    run_stream_once(stream_df, "stream_tumbling_out")

    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("stream_tumbling_out").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in QUERIES["e1_tumbling_window"](spark, SF_DIR_TINY).collect()
    }
    assert got == want


def test_multimodal_decode_is_distributed(spark):
    """mapInPandas plumbing: schema is typed, rows flow through Arrow
    batches, payload bytes round-trip."""
    from spark_sql_perf_spark.pipeline.multimodal import decode_metadata

    df = decode_metadata(spark, SF_DIR_TINY)
    rows = df.collect()
    assert len(rows) == 500
    assert all(r.n_bytes > 0 and 16 <= r.width < 80 for r in rows)
