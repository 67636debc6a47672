"""Sort / limit / top-k corpus (SURVEY.md §2.6).

ORDER BY + LIMIT (110/87 uses across the reference corpus), top-k-per-group
via rank filter (q67/q70), and ORDER BY expr DESC LIMIT 1 (AMPLab BDB q3).

Determinism: every LIMIT is preceded by a total order (unique tiebreaker
key) — otherwise the returned row *set* is engine-dependent.

Scale note: Spark compiles orderBy().limit(k) to TakeOrderedAndProject —
a per-partition top-k plus a driver-side merge of k-row heaps. No global
sort happens; this is the right plan at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from .registry import query


@query(
    "s1_orderby_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def s1_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "s2_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             RANK() OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer) t
    WHERE rnk <= 2
    """,
)
def s2_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window rank filter (q67:2767 shape)."""
    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        cust.select("c_mktsegment", "c_custkey", "c_acctbal", F.rank().over(w).alias("rnk"))
        .where(F.col("rnk") <= 2)
        .drop("rnk")
    )


@query(
    "s3_orderby_expr_limit1",
    oracle="""
    SELECT c_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_spend
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    ORDER BY total_spend DESC, c_custkey
    LIMIT 1
    """,
)
def s3_orderby_expr_limit1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY aggregate DESC LIMIT 1 (AMPLab BDB q3, bigdata/Queries.scala:124)."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double").alias("total_spend"))
        .orderBy(F.desc("total_spend"), "c_custkey")
        .limit(1)
    )


@query(
    "s4_multi_key_sort",
    oracle="""
    SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_quantity >= 49
    ORDER BY l_returnflag, l_linestatus DESC, l_orderkey, l_linenumber
    """,
)
def s4_multi_key_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed asc/desc multi-key global sort (range-partitioned exchange)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_quantity") >= 49)
        .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
        .orderBy("l_returnflag", F.desc("l_linestatus"), "l_orderkey", "l_linenumber")
    )
