"""TPC-DS suite on generated tables: every query runs, produces rows, and
its crc32 fingerprint is stable run-to-run and across AQE on/off — the
reference's HashResults correctness model (ExecutionMode.scala:40-46)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def tpcds(spark):
    from spark_sql_perf_spark.operators.tpcds_suite import register_tpcds

    register_tpcds(spark, scale=0.003)
    return spark


def _queries():
    from spark_sql_perf_spark.operators.tpcds_suite import _QUERIES

    return sorted(_QUERIES)


@pytest.mark.parametrize("name", _queries())
def test_tpcds_query_hash_stable(tpcds, name):
    from spark_sql_perf_spark.modes import HASH
    from spark_sql_perf_spark.operators.tpcds_suite import _QUERIES

    df = tpcds.sql(_QUERIES[name])
    rows = df.limit(5).collect()
    assert len(rows) > 0, f"{name} returned nothing at this scale"
    h1 = HASH.consume(df, name)
    try:
        tpcds.conf.set("spark.sql.adaptive.enabled", "false")
        h2 = HASH.consume(tpcds.sql(_QUERIES[name]), name)
    finally:
        tpcds.conf.set("spark.sql.adaptive.enabled", "true")
    assert h1 == h2, f"{name}: result fingerprint changed with AQE off"


def test_tpcds_star_joins_broadcast(tpcds):
    from spark_sql_perf_spark.operators.tpcds_suite import _QUERIES

    df = tpcds.sql(_QUERIES["tpcds_q52"])
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # dims broadcast in the star
