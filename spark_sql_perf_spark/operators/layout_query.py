"""Physical-layout operators as oracle-checked queries: repartition /
sortWithinPartitions (the DataFrame side of tpcds/Tables.scala:143-156
DISTRIBUTE BY pre-clustering) and the SQL DISTRIBUTE BY form. Layout ops
change the physical distribution, never the result set — which is exactly
what the oracle verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register_views, table
from .registry import dec, query


@query(
    "l1_repartition_cluster_agg",
    oracle="""
    SELECT l_suppkey,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def l1_repartition_cluster_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """repartition(key) + sortWithinPartitions before aggregating — the
    pre-clustered write path (`DISTRIBUTE BY` + sort) expressed in the
    DataFrame API; the aggregation reuses the repartition's hash
    distribution instead of adding its own exchange."""
    li = table(spark, sf_dir, "lineitem")
    clustered = li.repartition(8, "l_suppkey").sortWithinPartitions("l_suppkey")
    return clustered.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
    )


_DISTRIBUTE_SQL_SPARK = """
    SELECT o_orderstatus, o_orderkey, o_totalprice
    FROM (SELECT * FROM orders DISTRIBUTE BY o_orderstatus SORT BY o_orderstatus, o_orderkey)
    WHERE o_totalprice > 100000
"""

_DISTRIBUTE_SQL_ORACLE = """
    SELECT o_orderstatus, o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 100000
"""


@query("l2_distribute_sort_by", oracle=_DISTRIBUTE_SQL_ORACLE)
def l2_distribute_sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL DISTRIBUTE BY / SORT BY (Hive-style pre-clustering clauses;
    result set unchanged, distribution hash-partitioned per key)."""
    register_views(spark, sf_dir)
    return spark.sql(_DISTRIBUTE_SQL_SPARK)
