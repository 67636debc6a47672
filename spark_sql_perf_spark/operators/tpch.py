"""TPC-H-style headline queries over the driver testdata.

These translate the reference's TPC-DS query *patterns* (SURVEY.md §2.2-2.8,
e.g. the q7-shaped star join-aggregates of SimpleQueries.scala:129-158 and
tpcds/MultiJoinQueries.scala:28-132) onto the available TPC-H-ish schema.

Scale design: every query is a declarative DataFrame plan — filters reach
the parquet scan (PushedFilters), dims are broadcast explicitly, partial
aggregation is map-side, and no driver-side collection happens here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .registry import dec, money_avg, money_avg_sql, money_sum, money_sum_sql, query

# revenue = l_extendedprice * (1 - l_discount), computed exactly in decimal.
# Column expressions are built lazily (functions) because PySpark requires an
# active session to construct Column objects.
def _rev() -> F.Column:
    return dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - dec("l_discount", 3, 2))


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


# charge = revenue * (1 + l_tax)
def _charge() -> F.Column:
    return _rev() * (F.lit(1).cast("decimal(3,2)") + dec("l_tax", 3, 2))


_CHARGE_SQL = f"{_REV_SQL} * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"


def _cents(col: str) -> F.Column:
    """Exact integer cents of a 2-decimal-clean money double."""
    return F.round(F.col(col) * 100).cast("long")


def _rev_cents() -> F.Column:
    """revenue in units of 1e-4 dollars, as exact 64-bit integers."""
    return _cents("l_extendedprice") * (100 - _cents("l_discount"))


def rev_sum(alias: str) -> F.Column:
    """SUM(revenue) as double — value-identical to
    SUM(CAST({_REV_SQL} AS DECIMAL(38,4))) cast double, computed with
    integer-cents products instead of per-row Decimal multiplies.
    Decimal multiply + changePrecision dominated q1's aggregate stage
    (r13 decomposition: the decimal form's agg cost ~3x the integer
    form's); the products are exact in 64-bit (l_extendedprice <= ~1e7
    cents, factors <= 200, so each term <= ~2e11), the SUM accumulates
    in decimal(38,0) (no overflow at any scale factor), and the single
    scale-shifting division happens once per GROUP, not per row. The
    final double is bit-identical because both forms cast the same
    exact rational to double (IEEE casts are correctly rounded) —
    verified value-identical vs the decimal form and the DuckDB oracle
    at sf0.001/0.01/0.1."""
    return (F.sum(_rev_cents().cast("decimal(38,0)")) / 10000).cast(
        "double"
    ).alias(alias)


def charge_sum(alias: str) -> F.Column:
    """SUM(charge) as double via integer cents (see rev_sum; charge
    terms <= ~4e13, still exact in 64-bit)."""
    charge = _rev_cents() * (100 + _cents("l_tax"))
    return (F.sum(charge.cast("decimal(38,0)")) / 1000000).cast(
        "double"
    ).alias(alias)


def cents_sum(col: str, alias: str) -> F.Column:
    """money_sum's integer-cents twin for 2-decimal-clean testdata money
    columns (the cleanliness tests/test_cents_exact.py asserts): the same
    exact sum accumulated from long cents instead of per-row
    decimal(18,2) casts, divided back once per group. Value-identical
    (same exact rational -> same correctly-rounded double)."""
    return (F.sum(_cents(col).cast("decimal(38,0)")) / 100).cast(
        "double"
    ).alias(alias)


def cents_avg(col: str, alias: str) -> F.Column:
    """money_avg's integer-cents twin (identical double sum, then the
    same single IEEE division by the non-null count)."""
    return (
        (F.sum(_cents(col).cast("decimal(38,0)")) / 100).cast("double")
        / F.count(F.col(col))
    ).alias(alias)


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {money_sum_sql('l_quantity', 'sum_qty')},
           {money_sum_sql('l_extendedprice', 'sum_base_price')},
           {money_sum_sql(_REV_SQL, 'sum_disc_price', prec=38, scale=4)},
           {money_sum_sql(_CHARGE_SQL, 'sum_charge', prec=38, scale=6)},
           {money_avg_sql('l_quantity', 'avg_qty')},
           {money_avg_sql('l_extendedprice', 'avg_price')},
           {money_avg_sql('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan -> pushed filter -> hash agg (map-side partial)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            cents_sum("l_quantity", "sum_qty"),
            cents_sum("l_extendedprice", "sum_base_price"),
            rev_sum("sum_disc_price"),
            charge_sum("sum_charge"),
            cents_avg("l_quantity", "avg_qty"),
            cents_avg("l_extendedprice", "avg_price"),
            cents_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {money_sum_sql(_REV_SQL, 'revenue', prec=38, scale=4)},
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> 2 joins -> agg -> top-k."""
    cust = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev_sum("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {money_sum_sql(_REV_SQL, 'revenue', prec=38, scale=4)}
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join, broadcast dims, co-nation predicate."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(rev_sum("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {money_sum_sql('CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(3,2))',
                          'revenue', prec=38, scale=4)}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.08
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: everything pushes to the scan; single global agg."""
    li = table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.04, 0.08)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum((dec("l_extendedprice") * dec("l_discount", 3, 2)).cast("decimal(38,4)"))
        .cast("double")
        .alias("revenue")
    )


@query(
    "flagship_star_agg",
    oracle=f"""
    SELECT p_brand,
           year(o_orderdate) AS order_year,
           {money_sum_sql(_REV_SQL, 'revenue', prec=38, scale=4)},
           {money_sum_sql('l_quantity', 'sum_qty')},
           COUNT(*) AS n_lines
    FROM lineitem, orders, part
    WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
      AND p_type IN ('ECONOMY', 'PROMO')
      AND o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY p_brand, year(o_orderdate)
    ORDER BY p_brand, order_year
    """,
)
def flagship_star_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's flagship: q7-shaped star join-aggregate
    (pattern of reference SimpleQueries.scala:129-158).

    Plan shape we want (and assert in tests): pushed filters on both scans,
    broadcast hash join for `part`, shuffled join lineitem<->orders on the
    join key, partial agg before the final shuffle.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    part = table(spark, sf_dir, "part").where(F.col("p_type").isin("ECONOMY", "PROMO"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", F.year("o_orderdate").alias("order_year"))
        .agg(
            rev_sum("revenue"),
            money_sum("l_quantity", "sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_brand", "order_year")
    )
