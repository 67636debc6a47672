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


_YAML_CFG = """
output: {out}
timeoutSeconds: 120
common:
  regParam: 0.1
benchmarks:
  - name: logistic_regression
    params:
      maxIter: [2, 3]
      tol: 0.001
  - name: linear_regression
"""


def test_yaml_config_load_semantics(tmp_path):
    """yaml.scala:29-67 semantics: common merges under every benchmark,
    list values expand cartesian, scalars are constants, unknown names
    raise (the strict load)."""
    import pytest as _pytest

    from spark_sql_perf_spark.ml.benchmarks import load_ml_config

    cfg = load_ml_config(_YAML_CFG.format(out=str(tmp_path)))
    assert cfg["output"] == str(tmp_path) and cfg["timeout_s"] == 120
    assert cfg["runs"] == [
        ("logistic_regression", {"maxIter": 2, "regParam": 0.1, "tol": 0.001}),
        ("logistic_regression", {"maxIter": 3, "regParam": 0.1, "tol": 0.001}),
        ("linear_regression", {"regParam": 0.1}),
    ]
    with _pytest.raises(KeyError, match="Cannot find algorithm"):
        load_ml_config("benchmarks:\n  - name: nope\n")


def test_cli_ml_config_runs_grid(spark, tmp_path):
    """--ml-config end-to-end: the YAML grid executes against the
    battery and results land as JSON lines under the config's output."""
    import json as _json

    from spark_sql_perf_spark.cli import run_ml_config_file

    cfg_path = tmp_path / "ml.yaml"
    cfg_path.write_text(
        "output: {out}\n"
        "benchmarks:\n"
        "  - name: logistic_regression\n"
        "    params:\n"
        "      maxIter: [1, 2]\n".format(out=str(tmp_path / "res"))
    )
    results = run_ml_config_file(spark, str(cfg_path))
    assert [r.params["maxIter"] for r in results] == [1, 2]
    assert all(r.fit_time_s > 0 for r in results)
    lines = [
        _json.loads(line)
        for line in (tmp_path / "res" / "ml_results.json").read_text().splitlines()
    ]
    assert len(lines) == 2 and lines[0]["algorithm"] == "logistic_regression"


def test_battery_names_static_set_in_sync(spark):
    from spark_sql_perf_spark.ml.benchmarks import BATTERY_NAMES, build_battery

    assert BATTERY_NAMES == frozenset(build_battery())
