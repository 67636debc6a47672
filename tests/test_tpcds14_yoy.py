"""Year-over-year TPC-DS family (q4/q11/q74) at sf0.1.

These queries require the same customer to be active in two sales
channels in two consecutive years — a data-VOLUME property, not a
predicate-vocabulary one: at sf0.01 the expected store∩web two-year
customer count is ~3 (hash luck), at sf0.1 it is hundreds. So this
family gets its own engine-vs-engine fixture at the larger scale.

Runs after test_tpcds14_suite (pytest module order is alphabetical),
re-registering the shared temp-view names at sf0.1.
"""

from __future__ import annotations

import pytest

from spark_sql_perf_spark.operators.tpcds14_suite import TPCDS14_QUERIES, TPCDS14_YOY

from test_impala_suite import _compare

SCALE = 0.1
YOY_TABLES = ("store_sales", "catalog_sales", "web_sales", "customer", "date_dim")


@pytest.fixture(scope="module")
def corpus_yoy(spark, duck, tmp_path_factory):
    from spark_sql_perf_spark.sources.datagen import gen_tpcds

    root = tmp_path_factory.mktemp("tpcds14_yoy")
    for name in YOY_TABLES:
        path = str(root / name)
        gen_tpcds(spark, name, SCALE).write.mode("overwrite").parquet(path)
        spark.read.parquet(path).createOrReplaceTempView(name)
        duck.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{path}/*.parquet')"
        )
    return spark


@pytest.mark.parametrize("name", sorted(TPCDS14_YOY))
def test_yoy_query_matches_duckdb(corpus_yoy, duck, name):
    sql = TPCDS14_QUERIES[name]
    sp = corpus_yoy.sql(sql).toPandas()
    du = duck.execute(sql).df()
    assert len(sp) > 0, f"{name}: empty result at scale {SCALE}"
    _compare(sp, du, name)
