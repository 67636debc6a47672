"""Scalar-function corpus (SURVEY.md §2.8).

The function battery actually used by the reference corpus: substr(41),
coalesce(41), case-when(127), concat(9), round(9), abs(8), upper(2),
year/month/dayofmonth, interval arithmetic (q21/q72 `+ interval 14 days`),
plus the crc32 result-fingerprint (Query.scala:130-136) kept as a
Spark-side self-check mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .registry import query


@query(
    "f1_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(SUBSTR(c_name, 1, 8)) AS name8,
           LENGTH(c_name) AS name_len,
           c_name || '-' || c_mktsegment AS tagged,
           SUBSTR(c_mktsegment, 1, 3) AS seg3
    FROM customer
    """,
)
def f1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """substr/upper/length/concat battery (bigdata/Queries.scala:73-77 shape)."""
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper(F.substring("c_name", 1, 8)).alias("name8"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("-", "c_name", "c_mktsegment").alias("tagged"),
        F.substring("c_mktsegment", 1, 3).alias("seg3"),
    )


@query(
    "f2_date_funcs",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate) AS o_year,
           MONTH(o_orderdate) AS o_month,
           DAYOFMONTH(o_orderdate) AS o_dom,
           o_orderdate + INTERVAL 14 DAY AS due_date
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    """,
)
def f2_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/dayofmonth + interval arithmetic
    (TPCDS_1_4_Queries.scala:253 `cast(... as date) + interval 14 days`)."""
    orders = table(spark, sf_dir, "orders")
    return orders.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_dom"),
        (F.col("o_orderdate") + F.expr("INTERVAL 14 DAYS")).alias("due_date"),
    )


@query(
    "f3_case_coalesce",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'rich' END AS bal_band,
           ABS(c_acctbal) AS abs_bal,
           COALESCE(o_orderkey, -1) AS order_or_default
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def f3_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """case-when / coalesce / abs over outer-join nulls (q78 coalesce shape)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left").select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("bal_band"),
        F.abs("c_acctbal").alias("abs_bal"),
        F.coalesce("o_orderkey", F.lit(-1)).alias("order_or_default"),
    )


@query(
    "f4_round_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) / 7, 2) AS price_div7,
           CAST(l_quantity AS BIGINT) % 5 AS qty_mod5,
           l_extendedprice * 2 AS price_x2
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def f4_round_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round + arithmetic (q2 `round(x,2)` shape). The division happens in
    decimal so rounding is applied to the identical exact value in both
    engines (double division would risk half-even/half-up divergence)."""
    li = table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice").cast("decimal(18,2)") / 7, 2)
        .cast("double")
        .alias("price_div7"),
        (F.col("l_quantity").cast("bigint") % 5).alias("qty_mod5"),
        (F.col("l_extendedprice") * 2).alias("price_x2"),
    )


@query("f5_crc32_fingerprint")  # no oracle: crc32 is not a DuckDB builtin
def f5_crc32_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's result-fingerprint mode (ExecutionMode.HashResults,
    Query.scala:130-136): SUM(CRC32(CONCAT_WS(',', *))) over the output.
    Used for run-to-run stability checks; rows-only driver check here."""
    nation = table(spark, sf_dir, "nation")
    return nation.select(
        F.sum(F.crc32(F.concat_ws(",", *nation.columns))).alias("result_hash")
    )
