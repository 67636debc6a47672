"""Event-time window aggregations over `events`.

Batch and streaming share the transformation: Structured Streaming's
micro-batch model makes `F.window`/`F.session_window` aggregations produce
identical results on a static table and on a stream once the watermark has
passed — so the DuckDB oracle (time_bucket / gaps-and-islands SQL) checks
both semantics.

Scale: windowed aggregation shuffles on (key, window) — bounded state per
watermark; session windows use Spark's native session_window operator
(state merges inside the shuffle, no per-row Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.registry import dec, query


@query(
    "e1_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)), event_type
    """,
)
def e1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window (F.window == streaming tumbling agg)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "e2_sliding_window",
    oracle="""
    WITH buckets AS (
      SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS b, value FROM events),
    contrib AS (
      SELECT b AS window_start, value FROM buckets
      UNION ALL
      SELECT b - INTERVAL '1 hour' AS window_start, value FROM buckets)
    SELECT window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM contrib
    GROUP BY window_start
    """,
)
def e2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h-window / 1h-slide: each event lands in 2 windows.

    The oracle mirrors Spark's window assignment (window_start in
    {bucket(ts), bucket(ts) - slide}).
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@query(
    "e3_session_window",
    oracle="""
    WITH micro AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL '1 hour'
                  THEN 0 ELSE 1 END AS new_session
      FROM micro),
    grouped AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM grouped
    GROUP BY user_id, session_id
    """,
)
def e3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window, 1h gap (F.session_window == the stateful streaming
    operator; oracle = gaps-and-islands SQL). Session identity is the set
    of events, surfaced as (user_id, session_start).

    fan_out pre-partitions by user_id when the scan plans fewer
    partitions than the session parallelism (the single-row-group bench
    case): the pinned exchange satisfies the session aggregation's
    required distribution, keeping ONE exchange while the per-user
    session sorts run in parallel instead of on AQE's ~1 coalesced task
    (r14 interleaved A/B at sf0.1: 0.338 vs 0.578 min, 5/5 pairwise).
    No-op on an already-parallel scan (the at-scale case)."""
    from ..catalog import fan_out

    ev = fan_out(table(spark, sf_dir, "events"), key="user_id")
    return (
        ev.groupBy(F.session_window("ts", "1 hour").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
            F.min("ts").alias("session_start"),
        )
        .select("user_id", "session_start", "n_events", "sum_value")
    )


@query(
    "e4_event_type_pivot",
    oracle="""
    SELECT user_id % 100 AS user_bucket,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value
    FROM events
    GROUP BY user_id % 100
    """,
)
def e4_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional pivot over event types per user bucket (sessionization
    feature-building shape)."""
    ev = table(spark, sf_dir, "events")

    def cnt(t: str) -> F.Column:
        return F.count(F.when(F.col("event_type") == t, F.lit(1))).alias(f"n_{t}")

    return ev.groupBy((F.col("user_id") % 100).alias("user_bucket")).agg(
        cnt("click"),
        cnt("view"),
        cnt("purchase"),
        F.sum(F.when(F.col("event_type") == "purchase", dec("value")))
        .cast("double")
        .alias("purchase_value"),
    )


@query(
    "e5_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
        AND e.ts <= v.t_view + INTERVAL 4 HOUR
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        AND e.ts <= c.t_click + INTERVAL 48 HOUR
      GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_full_funnel
    """,
)
def e5_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel with per-step windows: users whose
    first view is followed by a click within 4 hours, then a purchase
    within 48 hours of that click (windows chosen so every stage is
    non-empty AND discriminating at every test scale). Each stage is a user_id aggregation
    joined to the previous stage — after the first shuffle every stage
    is co-partitioned on user_id, so the funnel costs one shuffle of
    the events table regardless of funnel depth."""
    ev = table(spark, sf_dir, "events")

    def first_after(
        prev: DataFrame, etype: str, prev_col: str, out: str, window: str
    ) -> DataFrame:
        e = ev.where(F.col("event_type") == etype)
        return (
            e.join(prev, "user_id")
            .where(
                (F.col("ts") > F.col(prev_col))
                & (F.col("ts") <= F.col(prev_col) + F.expr(f"INTERVAL {window}"))
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(out))
        )

    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = first_after(v, "click", "t_view", "t_click", "4 HOUR")
    p = first_after(c, "purchase", "t_click", "t_purchase", "48 HOUR")
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_view_click"))))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_full_funnel"))))
    )


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    stream_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """`events` as a true stream: a file source watching ``stream_dir``
    (Spark's file stream source requires a directory — the production shape,
    where upstream lands one parquet file per micro-batch).

    Use with ``run_stream_once`` in tests: Trigger.AvailableNow drains the
    source and stops — batch-equivalent semantics, real streaming engine.

    Mirrors catalog.table's ts handling: the stream schema is taken from
    a batch read of the same table, so ts arrives either as long (raw
    nanos under the legacy conf) or as TIMESTAMP(MICROS), and
    ``_ts_as_timestamp`` dispatches on the loaded type — both encodings
    read identically.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    reader = spark.readStream.schema(raw.schema)
    if max_files_per_trigger is not None:
        # one file per micro-batch: lets tests drive MULTI-batch behavior
        # (cross-batch state) through the same AvailableNow drain
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(stream_dir)
    from ..catalog import _ts_as_timestamp

    return stream.withColumn("ts", _ts_as_timestamp(raw))


def streaming_tumbling(spark: SparkSession, sf_dir: str, stream_dir: str) -> DataFrame:
    """e1 as a genuine streaming query with a watermark (late-data bound)."""
    ev = stream_events(spark, sf_dir, stream_dir).withWatermark("ts", "2 hours")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_once(
    df: DataFrame, table_name: str, output_mode: str = "complete"
) -> None:
    """Drain a streaming DataFrame into an in-memory sink (AvailableNow)."""
    q = (
        df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError(f"stream {table_name} did not drain within 120s")
