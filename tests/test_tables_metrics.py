"""Tests for table provisioning (S7/S10/S11), per-operator metrics, and
the RDD-count benchmarkable / pandas-vs-native execution triad (§2.10)."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_DIR_TINY


def test_unresolved_tables_parse(spark):
    from spark_sql_perf_spark.tables import unresolved_tables

    names = unresolved_tables(
        spark,
        "SELECT * FROM some_fact f JOIN some_dim d ON f.k = d.k WHERE d.x > 0",
    )
    assert names == {"some_fact", "some_dim"}


def test_provision_tables_creates_missing(spark, tmp_path):
    from spark_sql_perf_spark.catalog import table
    from spark_sql_perf_spark.tables import provision_tables

    nation = table(spark, SF_DIR_TINY, "nation")
    sql = "SELECT n_name FROM prov_nation WHERE n_regionkey = 0"
    created = provision_tables(spark, sql, {"prov_nation": nation})
    assert created == ["prov_nation"]
    assert spark.sql(sql).count() > 0
    # second call: nothing to do
    assert provision_tables(spark, sql, {"prov_nation": nation}) == []
    spark.sql("DROP TABLE prov_nation")


def test_temp_and_external_tables(spark, tmp_path):
    from spark_sql_perf_spark.catalog import table
    from spark_sql_perf_spark.tables import (
        create_external_table,
        create_temporary_table,
    )

    region = table(spark, SF_DIR_TINY, "region")
    cached = create_temporary_table(spark, "tmp_region", region)
    assert spark.table("tmp_region").count() == 5
    assert cached.storageLevel.useMemory
    cached.unpersist()

    loc = str(tmp_path / "ext_region")
    region.write.parquet(loc)
    create_external_table(spark, "ext_region", loc)
    assert spark.table("ext_region").count() == 5
    spark.sql("DROP TABLE ext_region")


def test_plan_metrics_after_run(spark):
    from spark_sql_perf_spark.metrics import plan_metrics, rows_by_operator
    from spark_sql_perf_spark.operators import QUERIES

    df = QUERIES["flagship_star_agg"](spark, SF_DIR_TINY)
    df.collect()
    nodes = plan_metrics(df)
    assert len(nodes) > 3
    rows = rows_by_operator(df)
    # the scans actually report produced rows
    assert any(v > 0 for v in rows.values()), rows


def test_breakdown_execution(spark):
    """Per-subtree re-execution breakdown (Query.scala:86-116 parity):
    every optimized-logical subtree runs bottom-up with its own timing;
    the root subtree's row count equals the query's own result count."""
    from spark_sql_perf_spark.metrics import breakdown_execution
    from spark_sql_perf_spark.operators import QUERIES

    df = QUERIES["flagship_star_agg"](spark, SF_DIR_TINY)
    rows = breakdown_execution(spark, df)
    assert len(rows) > 3
    # bottom-up: leaves (max depth) first, root (depth 0) last
    assert rows[0].depth >= rows[-1].depth
    assert rows[-1].depth == 0
    assert rows[-1].rows == df.count()
    assert all(r.time_ms >= 0 for r in rows)
    # leaf relations include the scans; each subtree produced rows
    assert all(r.rows >= 0 for r in rows)


def test_run_query_include_breakdown(spark):
    """The runner's includeBreakdown flag lands BreakdownResult rows in
    the result record (results.scala:37-54)."""
    from spark_sql_perf_spark.operators import QUERIES
    from spark_sql_perf_spark.query import Query
    from spark_sql_perf_spark.runner import ExperimentRunner

    q = Query(
        name="flagship_star_agg",
        build=lambda s: QUERIES["flagship_star_agg"](s, SF_DIR_TINY),
    )
    res = ExperimentRunner(spark, results_location=None).run_query(
        q, include_breakdown=True
    )
    assert res.failure is None, res.failure
    assert res.breakdown and len(res.breakdown) > 3
    assert {"node", "index", "depth", "rows", "time_ms"} <= set(res.breakdown[0])


def test_rdd_count_benchmarkable(spark):
    """RDDCount parity (Benchmark.scala:217-269): plain rdd count as a
    Benchmarkable through the runner."""
    from spark_sql_perf_spark.catalog import table
    from spark_sql_perf_spark.modes import COUNT
    from spark_sql_perf_spark.query import Query
    from spark_sql_perf_spark.runner import ExperimentRunner

    q = Query(
        name="rdd_count",
        build=lambda s: table(s, SF_DIR_TINY, "lineitem"),
        mode=COUNT,
    )
    res = ExperimentRunner(spark, results_location="/tmp/unused").run_query(q)
    assert res.failure is None and res.result == 6000


def test_triad_native_vs_pandas_vs_rdd(spark):
    """The DS-vs-DF-vs-RDD benchmark axis (DatasetPerformance.scala:54-141)
    re-expressed as native-expr vs pandas-UDF vs RDD — all three agree."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    from spark_sql_perf_spark.catalog import table

    li = table(spark, SF_DIR_TINY, "lineitem").select("l_quantity")

    native = li.agg(F.sum((F.col("l_quantity") + 1)).alias("s")).collect()[0].s

    @pandas_udf(DoubleType())
    def plus_one(v: pd.Series) -> pd.Series:
        return v + 1.0

    pandas_sum = li.select(plus_one("l_quantity").alias("q")).agg(
        F.sum("q").alias("s")
    ).collect()[0].s

    rdd_sum = li.rdd.map(lambda r: r.l_quantity + 1).sum()

    assert native == pytest.approx(pandas_sum) == pytest.approx(rdd_sum)
