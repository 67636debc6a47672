"""TPC-DS 1.4 tranche (beyond the Impala-kit 20): engine-vs-engine
correctness + returns-alignment invariants.

Same oracle model as test_impala_suite: generated tables written to
parquet once, every query runs in BOTH Spark and DuckDB over the same
files, results compared exactly (small tolerance only for decimal/double
division divergence). Additionally asserts the datagen invariant the
sales<->returns queries (q50/q93) depend on: every store_returns row
joins back to a real store_sales line on (ticket_number, item_sk).
"""

from __future__ import annotations

import pytest

from spark_sql_perf_spark.operators.tpcds14_suite import (
    TPCDS14_QUERIES,
    TPCDS14_TABLES,
    TPCDS14_YOY,
)

from test_impala_suite import _compare

SCALE = 0.01

MAY_BE_EMPTY: frozenset[str] = frozenset()


@pytest.fixture(scope="module")
def corpus14(spark, duck, tmp_path_factory):
    from spark_sql_perf_spark.sources.datagen import gen_tpcds

    root = tmp_path_factory.mktemp("tpcds14_corpus")
    for name in TPCDS14_TABLES:
        path = str(root / name)
        gen_tpcds(spark, name, SCALE).coalesce(1).write.mode("overwrite").parquet(path)
        spark.read.parquet(path).createOrReplaceTempView(name)
        duck.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{path}/*.parquet')"
        )
    return spark


@pytest.mark.parametrize("name", sorted(set(TPCDS14_QUERIES) - set(TPCDS14_YOY)))
def test_tpcds14_query_matches_duckdb(corpus14, duck, name):
    sql = TPCDS14_QUERIES[name]
    sp = corpus14.sql(sql).toPandas()
    du = duck.execute(sql).df()
    if name not in MAY_BE_EMPTY:
        assert len(sp) > 0, f"{name}: empty result at scale {SCALE}"
    _compare(sp, du, name)


def test_returns_align_to_sales(corpus14):
    """Every return references a real sales line: the (ticket, item) join
    q50/q93 rely on matches for 100% of store_returns rows, and the
    basket-level keys (customer) carry over — the dsdgen property."""
    orphans = corpus14.sql(
        """
        SELECT count(*) AS n FROM store_returns
        LEFT ANTI JOIN store_sales
          ON sr_ticket_number = ss_ticket_number AND sr_item_sk = ss_item_sk
        """
    ).collect()[0]["n"]
    assert orphans == 0
    mismatched_cust = corpus14.sql(
        """
        SELECT count(*) AS n
        FROM store_returns JOIN store_sales
          ON sr_ticket_number = ss_ticket_number AND sr_item_sk = ss_item_sk
        WHERE sr_customer_sk <> ss_customer_sk
        """
    ).collect()[0]["n"]
    assert mismatched_cust == 0


def test_return_quantity_bounded_by_sold(corpus14):
    """q93's (ss_quantity - sr_return_quantity) is never negative for the
    aligned line: you can't return more than was sold. A ticket can hold
    two lines of the same item, so the invariant is that SOME matched
    line covers the return (the originating one always does)."""
    uncovered = corpus14.sql(
        """
        SELECT count(*) AS n FROM store_returns
        LEFT ANTI JOIN store_sales
          ON sr_ticket_number = ss_ticket_number AND sr_item_sk = ss_item_sk
         AND sr_return_quantity <= ss_quantity
        """
    ).collect()[0]["n"]
    assert uncovered == 0
