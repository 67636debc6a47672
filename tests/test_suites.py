"""Benchmark suites over generated data run clean through the runner."""

from __future__ import annotations

import pytest


@pytest.mark.parametrize(
    "suite", ["joinperf", "aggperf", "multijoin", "interactive", "tpcds14"]
)
def test_suite_runs(spark, suite, tmp_path):
    from spark_sql_perf_spark.runner import ExperimentRunner
    from spark_sql_perf_spark.suites import SUITES

    queries = SUITES[suite](spark)
    assert len(queries) >= 3
    runner = ExperimentRunner(spark, results_location=str(tmp_path), timeout_s=300)
    # run a 2-query sample of each suite (full suites are bench-time work)
    for q in queries[:2]:
        res = runner.run_query(q)
        assert res.failure is None, f"{q.name}: {res.failure}"
        assert res.execution_time_ms > 0
