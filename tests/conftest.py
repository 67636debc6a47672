from __future__ import annotations

import pytest

SF_DIR_TINY = "/root/testdata/sf0.001"
SF_DIR_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from spark_sql_perf_spark.session import build_session

    import tempfile

    spark = build_session(
        app_name="spark-sql-perf-spark-tests",
        master="local[4]",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.enabled": "false",
            "spark.driver.memory": "4g",
            # static conf: managed tables (saveAsTable tests) land in tmp
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-"),
        },
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()
