"""Subquery corpus (SURVEY.md §2.3 J13-J14).

Correlated scalar subqueries (TPC-DS q1/q32/q92), uncorrelated scalar
subqueries (q9), and EXISTS-with-aggregate (q16 shape). The DataFrame side
expresses each as the decorrelated plan Catalyst itself would produce —
join against a pre-aggregated subquery — because that is the plan we want
at scale (one shuffle, no per-row re-execution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .registry import dec, query


@query(
    "sub1_uncorrelated_scalar",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice >
      (SELECT 1.5 * (CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*))
       FROM orders)
    """,
)
def sub1_uncorrelated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J14: uncorrelated scalar subquery — orders above 1.5x the global mean.

    The threshold is computed as an exact decimal sum / count, so the
    filter boundary is the identical double in both engines (a native
    double AVG would be order-dependent and could flip boundary rows).
    """
    orders = table(spark, sf_dir, "orders")
    thresh = orders.agg(
        (F.lit(1.5) * (F.sum(dec("o_totalprice", 25, 6)).cast("double") / F.count(F.lit(1)))).alias(
            "thresh"
        )
    )
    return (
        orders.crossJoin(F.broadcast(thresh))
        .where(F.col("o_totalprice") > F.col("thresh"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "sub2_correlated_scalar",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity
    FROM lineitem
    WHERE l_quantity < 0.5 * (
      SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def sub2_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13: correlated scalar subquery (TPC-H q17 / TPC-DS q1 shape),
    expressed as its decorrelated form: join against per-key averages."""
    li = table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(per_part, li.l_partkey == per_part.pk)
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


@query(
    "sub3_in_subquery_agg",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
    """,
)
def sub3_in_subquery_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12+A9: IN (grouped-HAVING subquery) — TPC-H q18 / TPC-DS q23 shape,
    expressed as a left-semi join against the aggregate."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("s"))
        .where(F.col("s") > 150)
        .select("l_orderkey")
    )
    return orders.join(
        big, orders.o_orderkey == big.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")
