"""ML battery tests: data generators are deterministic and ground-truthed;
each algorithm fits and produces sane metrics."""

from __future__ import annotations

import pytest


def test_binary_labeled_learnable(spark):
    """The logistic ground truth is recoverable: AUC well above chance."""
    from spark_sql_perf_spark.ml.benchmarks import build_battery

    res = build_battery()["logistic_regression"].run(spark)
    assert res.fit_time_s > 0
    assert res.train_metric > 0.75, res
    assert res.test_metric > 0.70, res


def test_datagen_split_deterministic(spark):
    from spark_sql_perf_spark.ml.datagen import binary_labeled, train_test_split

    df = binary_labeled(spark, 2000, 5)
    tr1, te1 = train_test_split(df)
    tr2, te2 = train_test_split(df)
    assert tr1.count() == tr2.count()
    assert te1.count() == te2.count()
    assert tr1.count() + te1.count() == 2000


def test_gaussian_mixture_clusters(spark):
    from spark_sql_perf_spark.ml.benchmarks import build_battery

    res = build_battery()["kmeans"].run(spark)
    assert res.train_metric > 0.5  # silhouette: well-separated centers


def test_als_with_cold_pruning(spark):
    from spark_sql_perf_spark.ml.benchmarks import build_battery

    res = build_battery()["als"].run(spark)
    assert res.fit_time_s > 0
    assert res.test_metric is not None and res.test_metric < 2.0  # rmse sane


@pytest.mark.parametrize("algo", ["decision_tree", "linear_regression", "glm_regression", "lda"])
def test_battery_fits(spark, algo):
    from spark_sql_perf_spark.ml.benchmarks import build_battery

    res = build_battery()[algo].run(spark)
    assert res.fit_time_s > 0


def test_param_grid_expansion():
    from spark_sql_perf_spark.ml.benchmarks import expand_params

    grid = expand_params({"maxIter": [5, 10], "regParam": [0.0, 0.1, 0.2]})
    assert len(grid) == 6
    assert expand_params({}) == [{}]
