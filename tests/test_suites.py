"""Benchmark suites over generated data run clean through the runner."""

from __future__ import annotations

import pytest


def test_factfact_salting_variation(spark, tmp_path):
    """The salting axis changes only the shuffle distribution: both
    variation options succeed through the runner and agree on the
    (count, checksum) result of the same skewed fact-fact join."""
    from spark_sql_perf_spark.query import Variation
    from spark_sql_perf_spark.runner import ExperimentRunner
    from spark_sql_perf_spark.suites import SALTING_CONF, SUITES

    queries = SUITES["factfact"](spark, rows=200_000)
    runner = ExperimentRunner(spark, results_location=str(tmp_path), timeout_s=300)
    runs = runner.run_experiment(
        queries,
        iterations=1,
        variations=[Variation.conf(SALTING_CONF, ["off", "on"])],
    )
    assert len(runs) == 2
    outcomes = set()
    for run in runs:
        (res,) = run.results
        assert res.failure is None, res.failure
        outcomes.add(res.result)
    assert len(outcomes) == 1, f"salting changed the result: {outcomes}"
    assert outcomes != {None}, "HASH mode must record a content checksum"


@pytest.mark.parametrize(
    "suite", ["joinperf", "aggperf", "multijoin", "interactive", "tpcds14", "pipeline"]
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


def test_layout_suite_variation_is_result_invariant(spark, tmp_path):
    """The layout axis changes only the on-disk organization: all three
    layouts succeed through the runner and agree on the (count,
    checksum) of the same 2-D box aggregate, while the partitioned
    variant's plan prunes directories pre-listing."""
    from spark_sql_perf_spark.query import Variation
    from spark_sql_perf_spark.runner import ExperimentRunner
    from spark_sql_perf_spark.suites import LAYOUT_CONF, SUITES

    queries = SUITES["layout"](spark, rows=100_000)
    runner = ExperimentRunner(spark, results_location=str(tmp_path), timeout_s=300)
    runs = runner.run_experiment(
        queries,
        iterations=1,
        variations=[Variation.conf(LAYOUT_CONF, ["plain", "zorder", "partitioned"])],
    )
    assert len(runs) == 3
    outcomes = set()
    for run in runs:
        (res,) = run.results
        assert res.failure is None, res.failure
        outcomes.add(res.result)
    assert len(outcomes) == 1, f"layout changed the result: {outcomes}"
    assert outcomes != {None}, "HASH mode must record a content checksum"

    # the partitioned layout's scan prunes at the directory level
    spark.conf.set(LAYOUT_CONF, "partitioned")
    try:
        (q,) = queries
        plan = q.build(spark)._jdf.queryExecution().executedPlan().toString()
        scan = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
        assert "_b" in scan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    finally:
        spark.conf.unset(LAYOUT_CONF)
