"""Join operator corpus (SURVEY.md §2.3, J1-J12).

Covers the reference's JoinPerformance.scala matrix (inner/left/right/full
single-key equi joins), compound-key and self joins (SimpleQueries.scala:
31-37,160-189), broadcast map-join hints (ImpalaKitQueries.scala:1272),
and semi/anti joins (the IN/EXISTS subquery rewrites of q10/q16/q70).

Scale notes: dimension sides are broadcast explicitly; fact-fact joins
shuffle on their keys and rely on AQE for skew splitting. Outer joins
aggregate *before* joining where the pattern allows (q51 shape), which is
the shuffle-minimal plan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .registry import query


@query(
    "j1_inner_equi",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def j1_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: single-key inner equi join (JoinPerformance.scala:38-48 shape)."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "j1_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderstatus
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def j1_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_orderstatus"
    )


@query(
    "j1_right_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    """,
)
def j1_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@query(
    "j1_full_outer",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
               FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nk, s.nk) AS nationkey, n_cust, n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def j1_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J10: full outer join of two aggregates (TPC-DS q51 shape).

    Aggregating before the join is deliberate: at scale the join inputs
    shrink from |fact| to |distinct keys| before any shuffle.
    """
    cust = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cust.join(supp, cust.nk == supp.nk, "full_outer").select(
        F.coalesce(cust.nk, supp.nk).alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "j2_compound_key",
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber, b.l_suppkey AS matched_suppkey
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
    """,
)
def j2_compound_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: compound-key equi join (SimpleQueries.scala:31-37 fact-fact shape)."""
    a = table(spark, sf_dir, "lineitem").alias("a")
    b = table(spark, sf_dir, "lineitem").alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") == F.col("b.l_linenumber")),
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("l_linenumber"),
        F.col("b.l_suppkey").alias("matched_suppkey"),
    )


@query(
    "j3_self_join_pairs",
    oracle="""
    SELECT a.p_brand AS p_brand, COUNT(*) AS n_pairs
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size
         AND a.p_partkey < b.p_partkey
    GROUP BY a.p_brand
    """,
)
def j3_self_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3+P6: self join with theta (inequality) predicate
    (SimpleQueries.scala:160-189, SquareQueryPerformance.scala:79)."""
    a = table(spark, sf_dir, "part").alias("a")
    b = table(spark, sf_dir, "part").alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .groupBy(F.col("a.p_brand").alias("p_brand"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "j9_broadcast_star",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_lines, SUM(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def j9_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: explicit broadcast (map-join) hint — the /*+ MAPJOIN */ of
    ImpalaKitQueries.scala:1272 re-expressed as F.broadcast."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
    )


@query(
    "j12_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def j12_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: left-semi join (the EXISTS rewrite of TPC-DS q10)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "j12_anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
)
def j12_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: left-anti join (the NOT EXISTS rewrite of TPC-DS q16).

    The subquery is filtered to 'P'-status orders so the anti side is
    non-empty at every scale factor (every customer has *some* order)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "j4_chain_join",
    oracle="""
    SELECT n_name, COUNT(*) AS n_lineitems
    FROM nation
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders   ON o_custkey   = c_custkey
      JOIN lineitem ON l_orderkey  = o_orderkey
    GROUP BY n_name
    """,
)
def j4_chain_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: linear (chain) multi-way join nation->customer->orders->lineitem
    (LinearQueryPerformance.scala:77-91 shape on relational data)."""
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_lineitems"))
    )
