"""Window-function surface extensions: ntile, numeric RANGE frames,
first/last_value with explicit frames, percent_rank/cume_dist.

None of these appear in the reference corpus (SURVEY.md §2.5 negative
finding) but they complete the window surface a migrating user expects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from .registry import dec, query


@query(
    "w8_ntile_buckets",
    oracle="""
    SELECT c_custkey, c_acctbal,
           NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
)
def w8_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    w = Window.orderBy(F.desc("c_acctbal"), "c_custkey")
    return cust.select(
        "c_custkey", "c_acctbal", F.ntile(4).over(w).alias("quartile")
    )


@query(
    "w9_range_frame",
    oracle="""
    WITH sized AS (SELECT p_brand, p_size, p_partkey, p_retailprice FROM part)
    SELECT p_partkey, p_brand, p_size,
           COUNT(*) OVER (PARTITION BY p_brand ORDER BY p_size
                          RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_near_sizes,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY p_brand ORDER BY p_size
                 RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_price_sum
    FROM sized
    """,
)
def w9_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric RANGE frame (value-based window: all rows within 2 size
    units). Unlike ROWS frames, RANGE ties are frame-stable so the decimal
    sum is deterministic without a unique tiebreak."""
    part = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_size").rangeBetween(-2, 0)
    return part.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.count(F.lit(1)).over(w).alias("n_near_sizes"),
        F.sum(dec("p_retailprice")).over(w).cast("double").alias("near_price_sum"),
    )


@query(
    "w10_first_last_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def w10_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value with the full-partition frame for last
    (the default growing frame would return the current row)."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
    )


@query(
    "w11_percent_rank_cume",
    oracle="""
    SELECT p_partkey, p_retailprice,
           ROUND(PERCENT_RANK() OVER (ORDER BY p_retailprice, p_partkey), 9) AS pct_rank,
           ROUND(CUME_DIST() OVER (ORDER BY p_retailprice, p_partkey), 9) AS cume
    FROM part
    """,
)
def w11_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist (rounded: both are ratios of ints, exact to
    1 ulp, but the division order can differ across engines)."""
    part = table(spark, sf_dir, "part")
    w = Window.orderBy("p_retailprice", "p_partkey")
    return part.select(
        "p_partkey",
        "p_retailprice",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )
