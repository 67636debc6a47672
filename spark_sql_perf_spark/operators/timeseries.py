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


@query(
    "ts3_ohlc_bars",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, ts AS t,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY user_id, day
                                ORDER BY t, v) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY user_id, day
                                ORDER BY t DESC, v DESC) AS rn_d
      FROM e)
    SELECT user_id, day,
           CAST(MAX(CASE WHEN rn_a = 1 THEN v END) AS DOUBLE) AS open,
           CAST(MAX(v) AS DOUBLE) AS high,
           CAST(MIN(v) AS DOUBLE) AS low,
           CAST(MAX(CASE WHEN rn_d = 1 THEN v END) AS DOUBLE) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM r GROUP BY 1, 2
    """,
)
def ts3_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample each user's value stream into daily OHLC bars (open /
    high / low / close / tick count) — the candlestick rollup every
    metrics store ships.

    open/close are first/last by (ts, value) — the value tiebreak makes
    the bar deterministic when two ticks share a timestamp (min_by/max_by
    would be tie-nondeterministic and hash-unstable vs the oracle).

    100 TB design: both row_number windows and the final groupBy share
    the (user_id, day) partitioning, so the plan is one shuffle plus a
    partition-local re-sort for the descending window; bars parallelize
    across series-days. Values aggregate as exact DECIMAL and convert to
    double once at the edge.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.col("ts").alias("t"),
        dec("value").alias("v"),
    )
    wa = Window.partitionBy("user_id", "day").orderBy("t", "v")
    wd = Window.partitionBy("user_id", "day").orderBy(
        F.col("t").desc(), F.col("v").desc()
    )
    r = ev.select(
        "user_id",
        "day",
        "v",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("user_id", "day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("v"))).cast("double").alias("open"),
        F.max("v").cast("double").alias("high"),
        F.min("v").cast("double").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("v"))).cast("double").alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


@query(
    "ts4_time_weighted_avg",
    oracle="""
    WITH e AS (
      SELECT user_id, ts AS t, CAST(value AS DECIMAL(18,2)) AS v
      FROM events),
    d AS (
      SELECT user_id, v,
             date_diff('second', t,
               lead(t) OVER (PARTITION BY user_id ORDER BY t, v)) AS w
      FROM e),
    s AS (
      SELECT user_id, SUM(v * w) AS vw, SUM(w) AS sw,
             CAST(COUNT(*) AS BIGINT) AS n_spans
      FROM d WHERE w IS NOT NULL AND w > 0 GROUP BY 1)
    SELECT user_id,
           CAST(vw AS DOUBLE) AS sum_vw,
           CAST(sw AS BIGINT) AS sum_w,
           CAST(vw AS DOUBLE) / CAST(sw AS DOUBLE) AS twa,
           n_spans
    FROM s
    """,
)
def ts4_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average: each sample holds its value until
    the next sample, so the mean weights each reading by its holding
    duration (seconds) — the irregular-sampling average a plain AVG gets
    wrong. The last sample (no successor) and zero-duration spans carry
    no weight and are excluded.

    100 TB design: one lead() window partitioned by series, then a
    partial-combining groupBy on the same key — a single shuffle.
    Weighted mass accumulates as exact DECIMAL x BIGINT-seconds
    (order-independent, hash-stable); the only floating-point op is the
    final one-shot division of the two exact sums.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").alias("t"), dec("value").alias("v")
    )
    wl = Window.partitionBy("user_id").orderBy("t", "v")
    d = ev.select(
        "user_id",
        "v",
        (F.lead("t").over(wl).cast("long") - F.col("t").cast("long")).alias("w"),
    )
    s = (
        d.where(F.col("w").isNotNull() & (F.col("w") > 0))
        .groupBy("user_id")
        .agg(
            F.sum(F.col("v") * F.col("w")).alias("vw"),
            F.sum("w").alias("sw"),
            F.count(F.lit(1)).alias("n_spans"),
        )
    )
    return s.select(
        "user_id",
        F.col("vw").cast("double").alias("sum_vw"),
        F.col("sw").cast("bigint").alias("sum_w"),
        (F.col("vw").cast("double") / F.col("sw").cast("double")).alias("twa"),
        "n_spans",
    )


def interval_concurrency_df(iv: DataFrame) -> DataFrame:
    """ts2's day-partitioned sweep over any (s, e) half-open interval
    frame (the scale probe drives it on generated intervals).

    Empty (e == s) and malformed (e < s) intervals contribute nothing:
    without the guard, a zero-length interval starting exactly at
    midnight makes `sequence(day(s), day(e - 1us))` run backwards and
    Spark throws at runtime — DuckDB's generate_series returns empty for
    the same bounds, so dropping the row keeps the engines aligned."""
    iv = iv.where(F.col("e") > F.col("s"))
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


# ---------------------------------------------------------------------------
# cdc1: SCD2 compression of a change stream (gaps-and-islands)
# ---------------------------------------------------------------------------


@query(
    "cdc1_scd2_compress",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    runs AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM ordered),
    intervals AS (
      SELECT user_id, event_type, run_id,
             MIN(ts) AS valid_from, COUNT(*) AS n_events,
             MIN(event_id) AS ord_id
      FROM runs GROUP BY user_id, event_type, run_id)
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, ord_id) AS valid_to,
           n_events
    FROM intervals
    """,
)
def cdc1_scd2_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build SCD2 validity intervals from a change log: collapse each
    user's consecutive runs of the same event_type into one row with
    [valid_from, valid_to) — valid_to = the NEXT run's start, NULL for
    the current (open) run. The CDC-to-dimension-table shape: a MERGE
    source for slowly-changing dimensions, built with pure windows.

    Gaps-and-islands: a change flag vs LAG, a running SUM to number the
    runs, a per-run aggregate, then LEAD to chain interval ends. All
    windows partition on user_id — state per window is one series, so
    millions of keys parallelize; no self-join, no driver loops. The
    (ts, event_id) tiebreak makes run numbering deterministic under
    equal timestamps on both engines.
    """
    return scd2_compress_df(table(spark, sf_dir, "events"))


def change_runs(df: DataFrame, order_cols: list[str],
                type_col: str = "event_type",
                partition: str = "user_id") -> DataFrame:
    """Gaps-and-islands run numbering: append ``_run``, the index of the
    row's consecutive same-``type_col`` run within its partition under
    ``order_cols``. The ONE copy of the change-flag/running-sum chain —
    shared by cdc1, the streaming CDC-apply's per-batch reduction, and
    its collapse-on-read view, so the three can never silently diverge.
    """
    w = Window.partitionBy(partition).orderBy(*order_cols)
    prev = F.lag(type_col).over(w)
    chg = F.when(prev.isNull() | (prev != F.col(type_col)), 1).otherwise(0)
    return (
        df.select("*", chg.alias("_chg"))
        .select(
            "*",
            F.sum("_chg")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("_run"),
        )
        .drop("_chg")
    )


def scd2_compress_df(ev: DataFrame) -> DataFrame:
    """cdc1's transformation on an explicit (user_id, event_type, ts,
    event_id) frame — unit-testable on hand-built change logs."""
    runs = change_runs(
        ev.select("user_id", "event_type", "ts", "event_id"), ["ts", "event_id"]
    ).withColumnRenamed("_run", "run_id")
    intervals = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
        F.min("event_id").alias("ord_id"),
    )
    # tiebreak on the run's first event_id: two runs CAN share valid_from
    # (consecutive same-ts events of different types), and LEAD over
    # valid_from alone would chain them nondeterministically — in both
    # engines. min(event_id) is the same physical order the streaming
    # CDC-apply view uses, so batch == streaming holds under ties too.
    chain = Window.partitionBy("user_id").orderBy("valid_from", "ord_id")
    return intervals.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(chain).alias("valid_to"),
        "n_events",
    )
