"""Generators / nested-data / JSON operators.

The reference's only generator is `explode` over its results JSON
(RunBenchmark.scala:152-156, A12) and `getItem` map access. Here:
explode-based wordcount over documents, JSON field extraction from the
events `props` column, and a struct/array build-then-consume round trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .registry import dec, query


@query(
    "n1_explode_wordcount",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
      FROM documents)
    SELECT word, COUNT(*) AS n
    FROM words
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def n1_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 generator shape: explode -> groupBy -> top-k (wordcount)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


@query(
    "n2_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
           MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def n2_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the props column (semi-structured path:
    get_json_object stays JVM-side, no UDF)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.sum(k).alias("sum_k"),
    )


@query(
    "n3_struct_array_roundtrip",
    oracle="""
    WITH built AS (
      SELECT o_custkey,
             list_sort(list(o_orderkey)) AS order_keys,
             COUNT(*) AS n_orders
      FROM orders
      GROUP BY o_custkey)
    SELECT o_custkey, n_orders,
           order_keys[1] AS first_key,
           order_keys[n_orders] AS last_key,
           len(order_keys) AS n_keys
    FROM built
    """,
)
def n3_struct_array_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array build (collect_list + sort) then element access — the
    aggregate-to-nested-to-flat round trip used by feature pipelines."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.sort_array(F.collect_list("o_orderkey")).alias("order_keys"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_custkey",
            "n_orders",
            F.element_at("order_keys", 1).alias("first_key"),
            F.element_at("order_keys", F.col("n_orders").cast("int")).alias("last_key"),
            F.size("order_keys").alias("n_keys"),
        )
    )


@query(
    "a13_cube_grouping",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_prio,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def a13_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (unused by the reference corpus — SURVEY §2.4
    notes 0 hits — included for a complete grouping-sets surface)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_prio"),
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("o_totalprice", 25, 6)).cast("double").alias("sum_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n", "sum_price")
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "a14_pivot",
    oracle=f"""
    SELECT o_orderstatus,
           {', '.join(
               "COUNT(CASE WHEN o_orderpriority = '" + p + "' THEN 1 END) AS " + '"' + p + '"'
               for p in _PRIORITIES)}
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def a14_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational PIVOT (the df.groupBy().pivot() form of the reference's
    manual day-name pivot, TPC-DS q2)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
