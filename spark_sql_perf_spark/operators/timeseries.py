"""Time-series operators over the `events` table: resample + gap-fill
(LOCF) and interval-overlap concurrency (sweep line).

The reference corpus stops at windowed aggregation (its streaming and
window suites); regular-grid resampling and interval concurrency are the
two time-series shapes a metrics/hypertable workload adds on top. Both
are expressed as compositions of built-in DataFrame ops — generate the
grid with `sequence`, fill with an `ignorenulls` window `last`, sweep
with a running sum — no UDFs, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from .registry import dec, query


@query(
    "ts1_gapfill_locf",
    oracle="""
    WITH b AS (
      SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2),
    spans AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM b GROUP BY 1),
    grid AS (
      SELECT user_id,
             unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket_hour
      FROM spans),
    j AS (
      SELECT g.user_id, g.bucket_hour, b.n_events, b.sum_value
      FROM grid g LEFT JOIN b
        ON b.user_id = g.user_id AND b.h = g.bucket_hour)
    SELECT user_id, bucket_hour,
           COALESCE(n_events, 0) AS n_events, sum_value,
           last_value(sum_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket_hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
    FROM j
    """,
)
def ts1_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's event stream onto a regular hourly grid and
    gap-fill with last-observation-carried-forward — the hypertable
    `time_bucket_gapfill + locf` shape. Buckets with no events appear
    with n_events = 0, NULL raw sum, and the carried-forward value;
    buckets before a user's first event stay NULL.

    100 TB design: the grid is generated per series (`sequence` over the
    user's own [first, last] hour — never a global cross join of users x
    buckets), the bucket aggregation is an ordinary partial-combining
    groupBy, and the LOCF window partitions BY SERIES, so state per
    window is one series' buckets — the classic metrics layout of
    millions of short series parallelizes on user_id. The sum is exact
    DECIMAL (order-independent, hash-stable); avg-style readings derive
    as sum/n downstream.
    """
    return gapfill_locf_df(table(spark, sf_dir, "events"))


def gapfill_locf_df(ev: DataFrame) -> DataFrame:
    """ts1's resample+LOCF pipeline over any (user_id, ts, value) frame
    (the scale probe drives it on generated series)."""
    b = (
        ev.select(
            "user_id",
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("h"),
            "value",
        )
        .groupBy("user_id", "h")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
    )
    grid = (
        b.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("bucket_hour"),
        )
    )
    j = grid.join(
        b.withColumnRenamed("h", "bucket_hour"), ["user_id", "bucket_hour"], "left"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket_hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "bucket_hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "sum_value",
        F.last("sum_value", ignorenulls=True).over(w).alias("locf_value"),
    )


_TS2_SPAN_MIN = 10  # each view event holds a session open this long


@query(
    "ts2_interval_concurrency",
    oracle=f"""
    WITH iv AS (
      SELECT CAST(ts AS TIMESTAMP) AS s,
             CAST(ts AS TIMESTAMP) + INTERVAL {_TS2_SPAN_MIN} MINUTE AS e
      FROM events WHERE event_type = 'view'),
    segdays AS (
      SELECT s, e,
             unnest(generate_series(
               date_trunc('day', s),
               date_trunc('day', e - INTERVAL 1 MICROSECOND),
               INTERVAL 1 DAY)) AS day
      FROM iv),
    segs AS (
      SELECT day, GREATEST(s, day) AS seg_start,
             LEAST(e, day + INTERVAL 1 DAY) AS seg_end
      FROM segdays),
    bounds AS (
      SELECT day, seg_start AS t, 1 AS delta FROM segs
      UNION ALL
      SELECT day, seg_end AS t, -1 AS delta FROM segs),
    run AS (
      SELECT day, delta,
             CAST(SUM(delta) OVER (PARTITION BY day ORDER BY t, delta
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS c
      FROM bounds)
    SELECT CAST(day AS DATE) AS day,
           MAX(c) AS max_concurrent,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_active
    FROM run GROUP BY 1
    """,
)
def ts2_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency per day, by sweep line: each view event
    opens a 10-minute half-open session [ts, ts+10min); the answer is
    the per-day maximum number of simultaneously open sessions plus the
    count of sessions active that day.

    The sweep avoids the O(n^2) self-join a naive "count overlapping
    intervals" query runs: emit +1 at each start and -1 at each end,
    order by (t, delta) — ends sort before starts at the same instant,
    which is exactly the half-open-interval convention — and take the
    running sum's max. Ties among equal (t, delta) rows permute prefix
    sums within an equal-delta run only, so the max is deterministic.

    100 TB design: intervals are split at day boundaries (an interval
    contributes a segment to every day it touches, microsecond-exact on
    the half-open end), so the sweep partitions by day and each window
    holds one day's boundaries. At extreme per-day cardinality, sub-shard
    the day and stitch with broadcast per-shard offsets — the same
    two-pass scheme `operators/windows2.py` uses for its global rank;
    day partitions keep this plan shuffle-minimal until then.
    """
    ev = table(spark, sf_dir, "events")
    iv = ev.where(F.col("event_type") == "view").select(
        F.col("ts").cast("timestamp").alias("s"),
        (F.col("ts").cast("timestamp") + F.expr(f"interval {_TS2_SPAN_MIN} minutes")).alias("e"),
    )
    return interval_concurrency_df(iv)


def interval_concurrency_df(iv: DataFrame) -> DataFrame:
    """ts2's day-partitioned sweep over any (s, e) half-open interval
    frame (the scale probe drives it on generated intervals)."""
    segs = iv.select(
        "s",
        "e",
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col("s")),
                F.date_trunc("day", F.col("e") - F.expr("interval 1 microsecond")),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
    ).select(
        "day",
        F.greatest("s", "day").alias("seg_start"),
        F.least("e", F.col("day") + F.expr("interval 1 day")).alias("seg_end"),
    )
    bounds = segs.select(
        "day", F.col("seg_start").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        segs.select("day", F.col("seg_end").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("day")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bounds.select("day", "delta", F.sum("delta").over(w).alias("c"))
        .groupBy(F.col("day").cast("date").alias("day"))
        .agg(
            F.max("c").alias("max_concurrent"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias("n_active"),
        )
    )
