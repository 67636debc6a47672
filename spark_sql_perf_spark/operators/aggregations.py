"""Aggregation operator corpus (SURVEY.md §2.4, A1-A11).

Covers grouped/global aggregates (AggregationPerformance.scala:32-66),
count-distinct batteries (TPCDS qSsMax), conditional aggregation (q2 shape),
ROLLUP + GROUPING() (q67/q36/q70), HAVING, and the UDAF surface
(DatasetPerformance.scala:102-132, GeometricMean) as a pandas GROUPED_AGG.

All double aggregates use the exact-decimal strategy from .registry so the
DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..catalog import table
from .registry import dec, money_avg, money_avg_sql, money_sum, money_sum_sql, query


@query(
    "a1_grouped_avg",
    oracle=f"""
    SELECT l_returnflag,
           {money_avg_sql('l_extendedprice', 'avg_price')},
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a1_grouped_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: grouped average (AggregationPerformance.scala:32-38)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        money_avg("l_extendedprice", "avg_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "a2_low_cardinality_group",
    oracle=f"""
    SELECT o_orderkey % 2 AS grp,
           COUNT(*) AS n,
           {money_sum_sql('o_totalprice', 'sum_price', prec=25, scale=6)}
    FROM orders GROUP BY o_orderkey % 2
    """,
)
def a2_low_cardinality_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: two-group aggregation (AggregationPerformance.scala:20-25).

    Low-cardinality keys are the map-side-combine best case: partial
    aggregation reduces each scan partition to 2 rows before the shuffle.
    """
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy((F.col("o_orderkey") % 2).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        money_sum("o_totalprice", "sum_price", prec=25, scale=6),
    )


@query(
    "a3_global_aggs",
    oracle=f"""
    SELECT COUNT(*) AS n,
           {money_sum_sql('l_extendedprice', 'sum_price')},
           {money_avg_sql('l_extendedprice', 'avg_price')},
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           SQRT((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 - CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
                / (COUNT(*) - 1)) AS stddev_price
    FROM lineitem
    """,
)
def a3_global_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: ungrouped SUM/AVG/COUNT/MIN/MAX/STDDEV battery
    (AggregationPerformance.scala:57-66).

    stddev is computed from exact decimal sums (sum, sum-of-squares) so it
    is order-independent and engine-exact — native stddev_samp over doubles
    would be run-order-dependent.
    """
    li = table(spark, sf_dir, "lineitem")
    s = F.sum(dec("l_extendedprice")).cast("double")
    sq = F.sum(dec("l_extendedprice") * dec("l_extendedprice")).cast("double")
    n = F.count(F.lit(1))
    return li.agg(
        n.alias("n"),
        money_sum("l_extendedprice", "sum_price"),
        money_avg("l_extendedprice", "avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.sqrt((sq - s * s / n) / (n - F.lit(1))).alias("stddev_price"),
    )


@query(
    "a4_complex_input_agg",
    oracle="""
    SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) + CAST(l_quantity AS DECIMAL(18,2))
                + CAST(l_quantity AS DECIMAL(18,2)) + CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum4
    FROM lineitem
    """,
)
def a4_complex_input_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: complex expression inside the aggregate
    (AggregationPerformance.scala:48-55 SUM(id+id+...))."""
    li = table(spark, sf_dir, "lineitem")
    q = dec("l_quantity")
    return li.agg(F.sum(q + q + q + q).cast("double").alias("sum4"))


@query(
    "a5_count_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           MAX(l_quantity) AS max_qty
    FROM lineitem
    """,
)
def a5_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: COUNT(DISTINCT)/MAX battery (TPCDS_1_4_Queries.scala:3844 qSsMax)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.max("l_quantity").alias("max_qty"),
    )


@query(
    "a6_multi_column_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT (o_custkey, o_orderpriority)) AS n_combos
    FROM orders GROUP BY o_orderstatus
    """,
)
def a6_multi_column_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: multi-column COUNT DISTINCT (q38/q87 shape)."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey", "o_orderpriority").alias("n_combos")
    )


@query(
    "a7_conditional_agg",
    oracle=f"""
    SELECT o_orderstatus,
           {money_sum_sql("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END",
                          'urgent_price', prec=25, scale=6)},
           {money_sum_sql("CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END",
                          'low_price', prec=25, scale=6)},
           COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent
    FROM orders GROUP BY o_orderstatus
    """,
)
def a7_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: conditional aggregation / manual pivot (TPC-DS q2 day-name shape)."""
    orders = table(spark, sf_dir, "orders")
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))
    low = F.when(F.col("o_orderpriority") == "5-LOW", F.col("o_totalprice"))
    return orders.groupBy("o_orderstatus").agg(
        F.sum(dec(urgent, 25, 6)).cast("double").alias("urgent_price"),
        F.sum(dec(low, 25, 6)).cast("double").alias("low_price"),
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))).alias("n_urgent"),
    )


@query(
    "a8_rollup_grouping",
    oracle="""
    SELECT r_name, n_name,
           GROUPING(r_name) AS g_region, GROUPING(n_name) AS g_nation,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def a8_rollup_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: ROLLUP grouping sets + GROUPING() (TPC-DS q67/q36/q70 shape)."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("long").alias("g_region"),
        F.grouping("n_name").cast("long").alias("g_nation"),
        F.count(F.lit(1)).alias("n_cust"),
        money_sum("c_acctbal", "sum_bal"),
    ).select("r_name", "n_name", "g_region", "g_nation", "n_cust", "sum_bal")


@query(
    "a9_having",
    oracle=f"""
    SELECT l_suppkey, {money_sum_sql('l_quantity', 'total_qty')}, COUNT(*) AS n
    FROM lineitem
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100
    """,
)
def a9_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: HAVING post-aggregate filter (q23a shape)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            money_sum("l_quantity", "total_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .where(F.col("total_qty") > 100)
    )


@pandas_udf(DoubleType())
def _geometric_mean(v: pd.Series) -> float:  # GROUPED_AGG pandas UDAF
    # Sort before summing so the float reduction is deterministic across
    # partition orders (run-to-run stability at any parallelism).
    logs = np.sort(np.log(v.to_numpy(dtype="float64")))
    return float(np.exp(logs.sum() / len(logs)))


@query(
    "a10_udaf_geomean",
    oracle="""
    SELECT p_brand,
           ROUND(EXP(SUM(LN(p_retailprice)) / COUNT(*)), 6) AS geomean_price
    FROM part GROUP BY p_brand
    """,
)
def a10_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10/A11: user-defined aggregate as an Arrow-batched pandas GROUPED_AGG
    (the GeometricMean UDAF of notebooks/performance.dashboard.scala:55-90).

    Rounded to 6 decimals on both sides: a log-sum is not exactly
    reproducible across engines, only to ~1e-15 relative error.
    """
    part = table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.round(_geometric_mean("p_retailprice"), 6).alias("geomean_price")
    )


@query(
    "a11_percentile",
    oracle="""
    SELECT l_returnflag,
           MEDIAN(l_quantity) AS median_qty,
           QUANTILE_CONT(l_quantity, 0.9) AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a11_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: exact percentile (callUDF("percentile", ...) parity,
    notebooks/performance.dashboard.scala:40). l_quantity is integral-valued
    so interpolation is exact in both engines."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
    )
