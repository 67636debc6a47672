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


@query(
    "a15_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_prio,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def a15_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form ROLLUP/CUBE desugar to):
    status-only, priority-only, and grand-total groups in one pass —
    Catalyst expands then aggregates partially like any groupBy, so one
    scan feeds all three groupings at any scale."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus", "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_prio"),
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("o_totalprice", 25, 6)).cast("double").alias("sum_price"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n", "sum_price"
        )
    )


@query(
    "n4_higher_order_funcs",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey, list_sort(list(l_quantity)) AS qs
      FROM lineitem GROUP BY l_orderkey)
    SELECT l_orderkey,
           len(qs) AS n_items,
           CAST(list_aggregate(list_transform(qs, x -> x * 2), 'sum') AS DOUBLE)
             AS doubled_sum,
           len(list_filter(qs, x -> x >= 30)) AS n_big,
           CAST(list_aggregate(qs[1:3], 'sum') AS DOUBLE) AS first3_sum
    FROM per_order
    """,
)
def n4_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas (transform / filter / aggregate /
    slice) over per-order quantity arrays. The lambdas run inside
    codegen on the already-grouped arrays — no explode/re-group round
    trip, no Python. Arrays are sorted first so the left-fold sum adds
    in the same order in both engines (quantities are integer-valued
    doubles, so the folds agree bit-for-bit)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_quantity")).alias("qs"))
        .select(
            "l_orderkey",
            F.size("qs").alias("n_items"),
            F.expr(
                "aggregate(transform(qs, x -> x * 2), 0D, (a, x) -> a + x)"
            ).alias("doubled_sum"),
            F.size(F.expr("filter(qs, x -> x >= 30D)")).alias("n_big"),
            F.expr("aggregate(slice(qs, 1, 3), 0D, (a, x) -> a + x)").alias(
                "first3_sum"
            ),
        )
    )
