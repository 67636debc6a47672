"""Window-function corpus (SURVEY.md §2.5, W1-W5 + extensions).

Covers rank over partitions (q67/q36/q70), running totals with explicit
ROWS frames (q51), windowed max (q51), group-relative averages
(q47/q53/q57/q63/q89), dense_rank (performance.dashboard.scala:12), plus
row_number/lag/lead — unused by the reference but part of a complete
window surface.

Determinism: every ORDER BY inside a window ends with a unique key so the
frame contents (and therefore float accumulations) are total-ordered and
identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import fan_out, table
from .registry import dec, money_sum, money_sum_sql, query


@query(
    "w1_rank_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             RANK() OVER (PARTITION BY p_brand
                          ORDER BY p_retailprice DESC, p_partkey) AS rnk
      FROM part) t
    WHERE rnk <= 3
    """,
)
def w1_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 + top-k-per-group (q67 `where rk <= 100` shape)."""
    part = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        part.select(
            "p_brand", "p_partkey", "p_retailprice", F.rank().over(w).alias("rnk")
        )
        .where(F.col("rnk") <= 3)
    )


@query(
    "w2_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
    FROM orders
    """,
)
def w2_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: running total with an explicit ROWS frame (TPC-DS q51 shape).

    The accumulation is decimal (exact) so partial-order differences
    between engines can't change the result.

    fan_out pre-partitions BY THE WINDOW KEY when the scan plans fewer
    partitions than the session parallelism (the single-row-group bench
    case, where AQE's size-based coalesce otherwise collapses the
    post-shuffle sort to ~1 task): the pinned exchange satisfies the
    window's ClusteredDistribution, so the plan keeps exactly ONE
    exchange and the per-group sorts run in parallel (r14 interleaved
    A/B at sf0.1: 0.294 vs 0.507 min, 5/5 pairwise). No-op on an
    already-parallel scan — at scale the window's own AQE-managed
    exchange is what runs.
    """
    orders = fan_out(table(spark, sf_dir, "orders"), key="o_custkey")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice", 25, 6)).over(w).cast("double").alias("running_spend"),
    )


@query(
    "w3_window_max",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           MAX(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS max_so_far
    FROM orders
    """,
)
def w3_window_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: windowed MAX over the same running frame (q51)."""
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.max("o_totalprice").over(w).alias("max_so_far"),
    )


@query(
    "w4_avg_over_agg",
    oracle="""
    WITH g AS (
      SELECT l_suppkey, l_returnflag,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
      FROM lineitem GROUP BY l_suppkey, l_returnflag)
    SELECT l_suppkey, l_returnflag,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(SUM(rev) OVER (PARTITION BY l_returnflag) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY l_returnflag) AS avg_flag_revenue
    FROM g
    """,
)
def w4_avg_over_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: group-relative average — window aggregate over a grouped
    aggregate (q47/q53/q57 'deviation from mean' shape). The window AVG is
    decomposed into exact decimal SUM / COUNT for engine-exactness."""
    li = table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_suppkey", "l_returnflag").agg(
        F.sum(dec("l_extendedprice")).alias("rev")
    )
    w = Window.partitionBy("l_returnflag")
    return g.select(
        "l_suppkey",
        "l_returnflag",
        F.col("rev").cast("double").alias("revenue"),
        (F.sum("rev").over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "avg_flag_revenue"
        ),
    )


@query(
    "w5_dense_rank",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           DENSE_RANK() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC, c_custkey) AS drnk
    FROM customer
    """,
)
def w5_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: dense_rank (performance.dashboard.scala:26-28 run numbering)."""
    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return cust.select(
        "c_mktsegment", "c_custkey", "c_acctbal", F.dense_rank().over(w).alias("drnk")
    )


@query(
    "w6_lag_lead_rownum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def w6_lag_lead_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: row_number/lag/lead (absent from the reference corpus —
    SURVEY.md §2.5 negative finding — but required for a complete surface)."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@query(
    "w7_cumulative_vs_total",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d,
             SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS day_rev
      FROM orders GROUP BY o_orderdate)
    SELECT d,
           CAST(day_rev AS DOUBLE) AS day_revenue,
           CAST(SUM(day_rev) OVER (ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS cum_revenue
    FROM daily
    """,
)
def w7_cumulative_vs_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 variant: global (unpartitioned) cumulative sum over a pre-agg.

    At scale an unpartitioned window is a single-reducer bottleneck — this
    is only safe *because* the inner groupBy reduces to |distinct days|.
    """
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(dec("o_totalprice", 25, 6)).alias("day_rev")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "d",
        F.col("day_rev").cast("double").alias("day_revenue"),
        F.sum("day_rev").over(w).cast("double").alias("cum_revenue"),
    )
