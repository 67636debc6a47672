"""The integer-cents aggregate forms (tpch.rev_sum / charge_sum /
cents_sum / cents_avg) are value-identical to their decimal twins.

Two layers: the DATA invariant they rest on (every money double is
2-decimal clean, so ``round(x*100)`` recovers the exact cents the
decimal(18,2) cast would), and the AGGREGATE identity (the cents plan
and the decimal plan produce bitwise-equal doubles on real testdata).
A testdata regeneration that broke cleanliness would fail here, not as
an oracle hash mismatch three rounds later.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_TINY

_MONEY_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def test_money_columns_are_2_decimal_clean(spark):
    from spark_sql_perf_spark.catalog import table

    li = table(spark, SF_DIR_TINY, "lineitem")
    bad = li.select(
        [
            F.sum(
                (
                    F.round(F.col(c) * 100).cast("long")
                    != (F.col(c).cast("decimal(18,2)") * 100).cast("long")
                ).cast("int")
            ).alias(c)
            for c in _MONEY_COLS
        ]
    ).collect()[0]
    assert all(bad[c] == 0 for c in _MONEY_COLS), bad.asDict()


def test_q1_cents_form_matches_decimal_form(spark):
    from spark_sql_perf_spark.catalog import table
    from spark_sql_perf_spark.operators import QUERIES
    from spark_sql_perf_spark.operators.registry import money_avg, money_sum
    from spark_sql_perf_spark.operators.tpch import _charge, _rev

    li = table(spark, SF_DIR_TINY, "lineitem")
    decimal_form = (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity", "sum_qty"),
            money_sum("l_extendedprice", "sum_base_price"),
            F.sum(_rev().cast("decimal(38,4)")).cast("double").alias("sum_disc_price"),
            F.sum(_charge().cast("decimal(38,6)")).cast("double").alias("sum_charge"),
            money_avg("l_quantity", "avg_qty"),
            money_avg("l_extendedprice", "avg_price"),
            money_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    got = [tuple(r) for r in QUERIES["q1_pricing_summary"](spark, SF_DIR_TINY).collect()]
    want = [tuple(r) for r in decimal_form.collect()]
    assert got == want
