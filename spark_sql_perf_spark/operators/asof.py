"""As-of and range joins — operators stock Spark lacks (and the reference
corpus never exercises: SURVEY.md §2.3 'notably absent ... range/as-of/
interval joins'), expressed as compositions of built-in operators per the
custom-operator policy.

asof1: last click at-or-before each purchase, per user.
       Spark: union-tag + running `last(..., ignorenulls)` window — one
       shuffle on (user), no pairwise product. Oracle: DuckDB's native
       ASOF JOIN.
range1: click/purchase pairs within a 1-hour window, via time-bucket
       binning: each purchase probes its own and the previous bin, so the
       join is equi on (user, bin) — the pattern that keeps interval joins
       shuffle-bounded at 100 TB. Oracle: the naive theta join (feasible
       at test scale, quadratic at real scale — which is the point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from .registry import query


def _clicks_purchases(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    ev = table(spark, sf_dir, "events")
    # dedupe clicks to one row per (user, ts) so the as-of match is unique
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return clicks, purchases


@query(
    "asof1_last_click_before_purchase",
    oracle="""
    WITH clicks AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, CAST(ts AS TIMESTAMP)),
    purchases AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.ts AS click_ts, c.click_value
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof1_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via union-tag + running last-non-null window.

    Clicks and purchases interleave in one (user, ts)-ordered stream;
    every purchase row picks up the most recent click state. Equal
    timestamps order click-first so `p.ts >= c.ts` semantics match.
    """
    return _asof_purchases_clicks(spark, sf_dir)


def _asof_purchases_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    clicks, purchases = _clicks_purchases(spark, sf_dir)
    tagged = clicks.select(
        "user_id", "ts",
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.col("click_value"),
    ).unionAll(
        purchases.select(
            "user_id", "ts",
            F.lit(1).alias("tag"),
            "event_id", "value",
            F.lit(None).cast("double").alias("click_value"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = tagged.select(
        "user_id", "ts", "tag", "event_id", "value",
        F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("click_ts"),
        F.last(F.when(F.col("tag") == 0, F.col("click_value")), ignorenulls=True)
        .over(w)
        .alias("click_value"),
    )
    return enriched.where(F.col("tag") == 1).select(
        "event_id", "user_id", "ts", "value", "click_ts", "click_value"
    )


@query(
    "asof2_tolerance",
    oracle="""
    WITH clicks AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, CAST(ts AS TIMESTAMP)),
    purchases AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.ts, p.value,
           CASE WHEN c.ts >= p.ts - INTERVAL 2 HOUR THEN c.ts END AS click_ts,
           CASE WHEN c.ts >= p.ts - INTERVAL 2 HOUR THEN c.click_value END
             AS click_value
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof2_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance bound (pandas merge_asof's
    ``tolerance=``): the most recent click counts only if it is at most
    2 hours old, else the purchase keeps NULL click state. Same
    single-shuffle union-tag plan as asof1 plus a residual null-out —
    tolerance costs nothing extra at any scale."""
    enriched = _asof_purchases_clicks(spark, sf_dir)
    fresh = F.col("click_ts") >= F.col("ts") - F.expr("INTERVAL 2 HOUR")
    return enriched.select(
        "event_id", "user_id", "ts", "value",
        F.when(fresh, F.col("click_ts")).alias("click_ts"),
        F.when(fresh, F.col("click_value")).alias("click_value"),
    )


@query(
    "range1_clicks_near_purchase",
    oracle="""
    WITH clicks AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'click'),
    purchases AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id,
           COUNT(*) AS n_clicks_1h,
           CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS click_value_1h
    FROM purchases p JOIN clicks c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL '1 hour'
    GROUP BY p.event_id, p.user_id
    """,
)
def range1_clicks_near_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join via time-bucket binning: purchases probe
    their hour-bin and the previous one, so the physical join is EQUI on
    (user_id, bin) — shuffle-bounded — with the exact interval predicate
    applied as a residual filter. The naive theta-join oracle is the
    semantics; the binned plan is the 100-TB shape.
    """
    ev = table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value",
        F.floor(F.unix_timestamp("ts") / 3600).alias("bin"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.explode(
            F.array(
                F.floor(F.unix_timestamp("ts") / 3600),
                F.floor(F.unix_timestamp("ts") / 3600) - 1,
            )
        ).alias("bin"),
    )
    joined = purchases.alias("p").join(
        clicks.alias("c"),
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("p.bin") == F.col("c.bin"))
        & (F.col("c.ts") <= F.col("p.ts"))
        & (F.col("c.ts") > F.col("p.ts") - F.expr("INTERVAL 1 HOUR")),
    )
    return joined.groupBy(
        F.col("p.event_id").alias("event_id"), F.col("p.user_id").alias("user_id")
    ).agg(
        F.count(F.lit(1)).alias("n_clicks_1h"),
        F.sum(F.col("c.value").cast("decimal(18,2)")).cast("double").alias("click_value_1h"),
    )
