"""Scalar-function battery 2: string manipulation + epoch conversions +
the full TPC-DS q9 shape (5 bucketed scalar subqueries in CASE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register_views, table
from .registry import query


@query(
    "f6_string_battery2",
    oracle="""
    SELECT s_suppkey,
           LOWER(s_name) AS lname,
           TRIM(s_name) AS tname,
           LPAD(CAST(s_suppkey AS VARCHAR), 8, '0') AS padded_key,
           REPLACE(s_name, 'SUPP', 'S#') AS repl,
           regexp_replace(s_name, '[0-9]+', '#') AS digits_masked,
           INSTR(s_name, '_') AS underscore_at,
           REVERSE(s_name) AS rev
    FROM supplier
    """,
)
def f6_string_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/trim/lpad/replace/regexp_replace/instr/reverse battery."""
    supp = table(spark, sf_dir, "supplier")
    return supp.select(
        "s_suppkey",
        F.lower("s_name").alias("lname"),
        F.trim("s_name").alias("tname"),
        F.lpad(F.col("s_suppkey").cast("string"), 8, "0").alias("padded_key"),
        F.replace(F.col("s_name"), F.lit("SUPP"), F.lit("S#")).alias("repl"),
        F.regexp_replace("s_name", "[0-9]+", "#").alias("digits_masked"),
        F.instr(F.col("s_name"), "_").alias("underscore_at"),
        F.reverse("s_name").alias("rev"),
    )


@query(
    "f7_epoch_funcs",
    oracle="""
    SELECT event_id,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
           CAST(to_timestamp(CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
                AS TIMESTAMP) AS ts_roundtrip,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H') AS hour_str
    FROM events WHERE event_id < 100
    """,
)
def f7_epoch_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unix_timestamp/from_unixtime/date_format (epoch round trips —
    performance.dashboard.scala:18 `from_unixtime($"timestamp"/1000)`)."""
    ev = table(spark, sf_dir, "events")
    return ev.where(F.col("event_id") < 100).select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.from_unixtime(F.unix_timestamp("ts")).cast("timestamp").alias("ts_roundtrip"),
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour_str"),
    )


_Q9_SQL = """
    SELECT CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) > 1000
                THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                      FROM lineitem WHERE l_quantity BETWEEN 1 AND 10)
                ELSE (SELECT CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                      FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) END AS bucket1,
           CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) > 1000
                THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                      FROM lineitem WHERE l_quantity BETWEEN 11 AND 20)
                ELSE (SELECT CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                      FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) END AS bucket2,
           CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) > 1000
                THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                      FROM lineitem WHERE l_quantity BETWEEN 21 AND 30)
                ELSE (SELECT CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                      FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) END AS bucket3,
           CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) > 1000
                THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                      FROM lineitem WHERE l_quantity BETWEEN 31 AND 40)
                ELSE (SELECT CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                      FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) END AS bucket4,
           CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) > 1000
                THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                      FROM lineitem WHERE l_quantity BETWEEN 41 AND 50)
                ELSE (SELECT CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                      FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) END AS bucket5
    FROM region WHERE r_regionkey = 0
"""


@query("q9_case_scalar_buckets", oracle=_Q9_SQL)
def q9_case_scalar_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q9 exact shape: 15 uncorrelated scalar subqueries driving 5
    CASE buckets, through spark.sql (Catalyst evaluates each scalar
    subquery as its own tiny plan; the outer one-row scan just anchors)."""
    register_views(spark, sf_dir)
    return spark.sql(_Q9_SQL)
