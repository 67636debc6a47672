"""Bucketing (shuffle-free joins) and salting (skew spreading) tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_TINY


def test_bucketed_join_has_no_exchange(spark):
    from spark_sql_perf_spark.catalog import table
    from spark_sql_perf_spark.plans.layout import bucketed_join, write_bucketed

    orders = table(spark, SF_DIR_TINY, "orders")
    li = table(spark, SF_DIR_TINY, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4, sort_by="o_orderkey")
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", n_buckets=4, sort_by="o_orderkey",
    )
    try:
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = bucketed_join(spark, "b_orders", "b_lineitem", on="o_orderkey")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert df.count() == 6000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salt_join_preserves_semantics(spark):
    from spark_sql_perf_spark.catalog import table
    from spark_sql_perf_spark.plans.layout import salt_join

    orders = table(spark, SF_DIR_TINY, "orders")
    cust = table(spark, SF_DIR_TINY, "customer")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    salted = salt_join(orders, cust, "o_custkey", "c_custkey", n_salts=4).count()
    assert salted == plain == 1500


def test_salt_join_spreads_hot_key(spark):
    from spark_sql_perf_spark.plans.layout import salt_join

    # one pathological key holding 90% of rows
    left = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(100).select(F.col("id").alias("k2"), F.lit("dim").alias("v"))
    out = salt_join(left, right, "k", "k2", n_salts=8)
    # exact semantics: only k<100 rows match; k=7 rows all match
    expected = left.join(right, left.k == right.k2).count()
    assert out.count() == expected
    # the salted key column spreads the hot key across multiple sub-keys
    spread = (
        left.withColumn("_salt", F.abs(F.xxhash64("k", F.monotonically_increasing_id())) % 8)
        .where(F.col("k") == 7)
        .select("_salt")
        .distinct()
        .count()
    )
    assert spread == 8
