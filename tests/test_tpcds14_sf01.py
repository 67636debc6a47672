"""Scale-literal degeneracy guard: representative TPC-DS rows
engine-vs-engine at sf0.1 (10x the driver's correctness scale).

Several 1.4 texts carry literals rescaled to the generated data
(tpcds14_suite.py:17-40 — q9's count thresholds, q32/q92 manufact
bands, q37/q82/q40/q21 price bands, q90 char-count window, q45 zip
prefixes). All driver/oracle rows run at sf0.01, so nothing guarded
that those predicates stay structurally NON-EMPTY when the data grows.
This module re-runs the literal-sensitive queries (plus q2 as a plain
heavy control) at sf0.1: every result must be non-empty AND match
DuckDB exactly.

Marked ``slow`` and excluded from the default pytest run (pytest.ini);
run explicitly with ``python -m pytest -m slow tests/test_tpcds14_sf01.py``.
"""

from __future__ import annotations

import pytest

from spark_sql_perf_spark.operators.tpcds14_suite import TPCDS14_QUERIES

from test_impala_suite import _compare

pytestmark = pytest.mark.slow

SCALE = 0.1

# the scale-tuned-literal queries named in the module header, plus q2
# (no tuned literals — a pure 10x-volume control)
SPOT_QUERIES = ["q2", "q9", "q21", "q32", "q37", "q40", "q45", "q82", "q90", "q92"]

# union of the tables those ten queries touch — generating all 24 at
# sf0.1 would double the fixture cost for nothing
SPOT_TABLES = (
    "store_sales", "catalog_sales", "web_sales", "catalog_returns",
    "inventory", "item", "date_dim", "time_dim", "reason", "warehouse",
    "household_demographics", "web_page", "customer", "customer_address",
)


@pytest.fixture(scope="module")
def corpus_sf01(spark, duck, tmp_path_factory):
    from spark_sql_perf_spark.sources.datagen import gen_tpcds

    root = tmp_path_factory.mktemp("tpcds14_sf01")
    for name in SPOT_TABLES:
        path = str(root / name)
        gen_tpcds(spark, name, SCALE).write.mode("overwrite").parquet(path)
        spark.read.parquet(path).createOrReplaceTempView(name)
        duck.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{path}/*.parquet')"
        )
    return spark


@pytest.mark.parametrize("name", SPOT_QUERIES)
def test_tpcds14_sf01_matches_duckdb(corpus_sf01, duck, name):
    sql = TPCDS14_QUERIES[name]
    sp = corpus_sf01.sql(sql).toPandas()
    du = duck.execute(sql).df()
    assert len(sp) > 0, (
        f"{name}: empty at sf0.1 — a rescaled literal went degenerate "
        f"when the data grew (see tpcds14_suite.py header)"
    )
    _compare(sp, du, name)
