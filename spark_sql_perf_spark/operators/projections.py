"""Projection / cast / filter micro-patterns (SURVEY.md §2.2 P1-P4) and
the remaining TPC-DS / AMPLab BDB query shapes.

P1  literal padding projection      (JoinPerformance.scala:50-55)
P2  cast projection matrix          (JoinPerformance.scala:57-62)
P3  arithmetic projection chain     (DatasetPerformance.scala:86-92)
P4  filter battery x4               (DatasetPerformance.scala:54-75)
q2  week-pivot + year self-join     (TPCDS_1_4_Queries.scala:60-89)
q51 dual cumulative-window compare  (TPCDS_1_4_Queries.scala:2049-2077)
bdb AMPLab Big Data Benchmark q1-q3 (bigdata/Queries.scala:25-163)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from .registry import dec, money_sum_sql, query


@query(
    "p1_projection_padding",
    oracle="""
    SELECT l_orderkey, l_linenumber, repeat('*', 64) AS data64
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def p1_projection_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: select + literal payload padding (varyDataSize shape)."""
    li = table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_linenumber") == 1).select(
        "l_orderkey", "l_linenumber", F.lit("*" * 64).alias("data64")
    )


@query(
    "p2_cast_matrix",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(o_orderkey AS INT) AS key_int,
           CAST(o_orderkey AS DOUBLE) AS key_dbl,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def p2_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: the key-type cast variation (String/Int/Long/Double)."""
    orders = table(spark, sf_dir, "orders")
    return orders.where(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("int").alias("key_int"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        # floor, not a bare int cast: DuckDB's double->int cast ROUNDS while
        # Spark's truncates — floor is the portable spelling
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
    )


@query(
    "p3_arith_chain",
    oracle="""
    SELECT ((((o_orderkey + 1) + 1) + 1) + 1) AS id4, o_orderkey
    FROM orders
    """,
)
def p3_arith_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: chained arithmetic projections (`select($"id"+1 as 'id)` x4 —
    constant-folds to one add in Catalyst, which is the point)."""
    orders = table(spark, sf_dir, "orders")
    out = orders.select(F.col("o_orderkey").alias("id4"), "o_orderkey")
    for _ in range(4):
        out = out.select((F.col("id4") + 1).alias("id4"), "o_orderkey")
    return out


@query(
    "p4_filter_battery",
    oracle="""
    SELECT o_orderkey FROM orders
    WHERE o_orderkey % 100 != 0 AND o_orderkey % 10 != 0
      AND o_orderkey % 7 != 0 AND o_orderkey % 3 != 0
    """,
)
def p4_filter_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: four chained filters, SQL-string and Column forms mixed
    (DatasetPerformance's filter benchmark; Catalyst fuses them)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.filter("o_orderkey % 100 != 0")
        .filter(F.col("o_orderkey") % 10 != 0)
        .filter("o_orderkey % 7 != 0")
        .filter(F.col("o_orderkey") % 3 != 0)
        .select("o_orderkey")
    )


@query(
    "q2_week_pivot_compare",
    oracle=f"""
    WITH weekly AS (
      SELECT year(o_orderdate) AS yr, (dayofweek(o_orderdate) = 0) AS is_sun,
             {money_sum_sql("CASE WHEN dayofweek(o_orderdate) = 0 THEN o_totalprice END",
                            'sun_sales', prec=25, scale=6)},
             {money_sum_sql("CASE WHEN dayofweek(o_orderdate) = 1 THEN o_totalprice END",
                            'mon_sales', prec=25, scale=6)},
             {money_sum_sql("CASE WHEN dayofweek(o_orderdate) = 6 THEN o_totalprice END",
                            'sat_sales', prec=25, scale=6)}
      FROM orders GROUP BY year(o_orderdate), (dayofweek(o_orderdate) = 0))
    SELECT a.yr AS yr, a.sun_sales AS sun_this, b.sun_sales AS sun_next,
           a.mon_sales AS mon_this, b.mon_sales AS mon_next
    FROM weekly a JOIN weekly b ON a.yr + 1 = b.yr AND a.is_sun = b.is_sun
    WHERE a.is_sun
    ORDER BY yr
    """,
)
def q2_week_pivot_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q2 exact shape: day-name conditional pivot + self-join on
    shifted year to compare adjacent years."""
    orders = table(spark, sf_dir, "orders")

    def day_sales(dow: int, alias: str) -> F.Column:
        return (
            F.sum(F.when(F.dayofweek("o_orderdate") == dow, dec("o_totalprice", 25, 6)))
            .cast("double")
            .alias(alias)
        )

    weekly = orders.groupBy(
        F.year("o_orderdate").alias("yr"),
        (F.dayofweek("o_orderdate") == 1).alias("is_sun"),
    ).agg(
        day_sales(1, "sun_sales"), day_sales(2, "mon_sales"), day_sales(7, "sat_sales")
    )
    a = weekly.alias("a")
    b = weekly.alias("b")
    return (
        a.join(
            b,
            (F.col("a.yr") + 1 == F.col("b.yr"))
            & (F.col("a.is_sun") == F.col("b.is_sun")),
        )
        .where(F.col("a.is_sun"))
        .select(
            F.col("a.yr").alias("yr"),
            F.col("a.sun_sales").alias("sun_this"),
            F.col("b.sun_sales").alias("sun_next"),
            F.col("a.mon_sales").alias("mon_this"),
            F.col("b.mon_sales").alias("mon_next"),
        )
        .orderBy("yr")
    )


@query(
    "q51_cumulative_compare",
    oracle="""
    WITH clicks AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             SUM(CAST(value AS DECIMAL(18,2))) AS v
      FROM events WHERE event_type = 'click' GROUP BY user_id, CAST(ts AS DATE)),
    views AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             SUM(CAST(value AS DECIMAL(18,2))) AS v
      FROM events WHERE event_type = 'view' GROUP BY user_id, CAST(ts AS DATE)),
    merged AS (
      SELECT COALESCE(c.user_id, w.user_id) AS user_id,
             COALESCE(c.d, w.d) AS d,
             c.v AS click_v, w.v AS view_v
      FROM clicks c FULL OUTER JOIN views w
        ON c.user_id = w.user_id AND c.d = w.d),
    cum AS (
      SELECT user_id, d,
             CAST(SUM(click_v) OVER (PARTITION BY user_id ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_click,
             CAST(SUM(view_v) OVER (PARTITION BY user_id ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_view
      FROM merged)
    SELECT user_id, d, cum_click, cum_view
    FROM cum
    WHERE cum_click IS NOT NULL AND cum_view IS NOT NULL AND cum_click > cum_view
    """,
)
def q51_cumulative_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q51 exact shape: two channel aggregates full-outer joined,
    dual running totals, filter where one channel's cumulative overtakes
    the other (clicks vs views per user-day)."""
    ev = table(spark, sf_dir, "events")

    def channel(t: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == t)
            .groupBy("user_id", F.col("ts").cast("date").alias("d"))
            .agg(F.sum(dec("value")).alias("v"))
        )

    c = channel("click").alias("c")
    w = channel("view").alias("w")
    merged = c.join(
        w,
        (F.col("c.user_id") == F.col("w.user_id")) & (F.col("c.d") == F.col("w.d")),
        "full_outer",
    ).select(
        F.coalesce(F.col("c.user_id"), F.col("w.user_id")).alias("user_id"),
        F.coalesce(F.col("c.d"), F.col("w.d")).alias("d"),
        F.col("c.v").alias("click_v"),
        F.col("w.v").alias("view_v"),
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = merged.select(
        "user_id",
        "d",
        F.sum("click_v").over(win).cast("double").alias("cum_click"),
        F.sum("view_v").over(win).cast("double").alias("cum_view"),
    )
    return cum.where(
        F.col("cum_click").isNotNull()
        & F.col("cum_view").isNotNull()
        & (F.col("cum_click") > F.col("cum_view"))
    )


@query(
    "bdb_q1_filter_project",
    oracle="""
    SELECT doc_id, n_chars FROM documents WHERE n_chars > 300
    """,
)
def bdb_q1_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMPLab BDB q1: SELECT pageURL, pageRank FROM rankings WHERE
    pageRank > X — scan-filter-project."""
    docs = table(spark, sf_dir, "documents")
    return docs.where(F.col("n_chars") > 300).select("doc_id", "n_chars")


@query(
    "bdb_q2_substr_groupby",
    oracle=f"""
    SELECT SUBSTR(source, 1, 4) AS src_prefix,
           {money_sum_sql('n_chars', 'total_chars', prec=25, scale=0)}
    FROM documents GROUP BY SUBSTR(source, 1, 4)
    """,
)
def bdb_q2_substr_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMPLab BDB q2: SELECT SUBSTR(sourceIP,1,8), SUM(adRevenue) GROUP BY —
    substring-key aggregation."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy(F.substring("source", 1, 4).alias("src_prefix")).agg(
        F.sum(F.col("n_chars").cast("decimal(25,0)")).cast("double").alias("total_chars")
    )


@query(
    "bdb_q3_join_agg_top1",
    oracle=f"""
    SELECT d.lang AS lang,
           {money_sum_sql('e.value', 'total_value')},
           COUNT(*) AS n
    FROM documents d JOIN events e ON d.doc_id = e.event_id % 500
    GROUP BY d.lang
    ORDER BY total_value DESC, lang
    LIMIT 1
    """,
)
def bdb_q3_join_agg_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMPLab BDB q3: join + aggregate + ORDER BY agg DESC LIMIT 1."""
    docs = table(spark, sf_dir, "documents").alias("d")
    ev = table(spark, sf_dir, "events").alias("e")
    return (
        docs.join(ev, F.col("d.doc_id") == F.col("e.event_id") % 500)
        .groupBy(F.col("d.lang").alias("lang"))
        .agg(
            F.sum(dec("e.value")).cast("double").alias("total_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(F.desc("total_value"), "lang")
        .limit(1)
    )
