"""ML benchmark battery: generate -> fit -> score train/test with an
evaluator (the BenchmarkAlgorithm.scala:23-47 template), timed via the
harness's MLResult, with cartesian param expansion replacing the YAML
config (mllib/yaml.scala:23-110).

Every algorithm from the reference's §2.11 table is covered:
LogisticRegression, DecisionTree/RandomForest/GBT classification,
LinearRegression, GeneralizedLinearRegression, KMeans, LDA, ALS.
"""

from __future__ import annotations

import itertools
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    ClusteringEvaluator,
    RegressionEvaluator,
)
from pyspark.sql import DataFrame, SparkSession

from . import datagen


@dataclass
class MLResult:
    algorithm: str
    params: dict[str, Any]
    fit_time_s: float
    train_metric: float | None
    test_metric: float | None
    metric_name: str


@dataclass
class MLBenchmark:
    name: str
    make_data: Callable[[SparkSession], tuple[DataFrame, DataFrame]]
    make_estimator: Callable[[dict[str, Any]], Any]
    evaluator: Any | None
    metric_name: str
    default_params: dict[str, Any] = field(default_factory=dict)

    def run(self, spark: SparkSession, params: dict[str, Any] | None = None) -> MLResult:
        p = {**self.default_params, **(params or {})}
        train, test = self.make_data(spark)
        est = self.make_estimator(p)
        t0 = time.perf_counter()
        model = est.fit(train)
        fit_time = time.perf_counter() - t0
        train_m = test_m = None
        if self.evaluator is not None:
            train_m = self.evaluator.evaluate(model.transform(train))
            if test is not None:
                test_m = self.evaluator.evaluate(model.transform(test))
        return MLResult(self.name, p, fit_time, train_m, test_m, self.metric_name)


def expand_params(grid: dict[str, list[Any]]) -> list[dict[str, Any]]:
    """Cartesian parameter expansion (yaml.scala:23-110 semantics)."""
    if not grid:
        return [{}]
    keys = sorted(grid)
    return [dict(zip(keys, combo)) for combo in itertools.product(*[grid[k] for k in keys])]


def cartesian_config(params: dict[str, Any]) -> list[dict[str, Any]]:
    """yaml.scala:88-110 ``cartesian``: list-valued entries expand the
    grid, scalar entries are constants carried into every combination."""
    return expand_params(
        {k: (v if isinstance(v, list) else [v]) for k, v in params.items()}
    )


def load_ml_config(text: str) -> dict[str, Any]:
    """YAML config ingestion — the file-format twin of the reference's
    ``YamlConfig.readString`` (yaml.scala:29-67): top-level keys
    ``output`` / ``timeoutSeconds`` / ``common`` (params merged under
    every benchmark) / ``benchmarks`` (list of {name, params}); each
    benchmark's grid is common ++ params expanded cartesian over its
    list-valued entries, and every name must resolve to an algorithm in
    the standard battery (the reference's strict load).

    Returns {"output", "timeout_s", "runs": [(name, params), ...]} —
    feed ``runs`` to ``run_ml_config``.
    """
    import yaml

    m = yaml.safe_load(text) or {}
    runs: list[tuple[str, dict[str, Any]]] = []
    common = m.get("common") or {}
    for b in m.get("benchmarks") or []:
        name = str(b["name"])
        if name not in BATTERY_NAMES:
            raise KeyError(
                f"Cannot find algorithm {name} in the standard benchmark"
                f" algorithms (have: {sorted(BATTERY_NAMES)})"
            )
        for p in cartesian_config({**common, **(b.get("params") or {})}):
            runs.append((name, p))
    return {
        "output": str(m.get("output", "/tmp/result")),
        "timeout_s": int(m.get("timeoutSeconds", 1200)),
        "runs": runs,
    }


def run_ml_config(spark: SparkSession, runs: list[tuple[str, dict[str, Any]]]) -> list[MLResult]:
    """Execute a loaded config's (name, params) grid against the
    standard battery, in order (the MLLib.scala run loop)."""
    battery = build_battery()
    return [battery[name].run(spark, params) for name, params in runs]


# ---------------------------------------------------------------------------
# the battery
# ---------------------------------------------------------------------------

_N = 5_000  # default benchmark rows (scaled up via params at bench time)
_D = 10


def _classification_data(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    df = datagen.binary_labeled(spark, _N, _D)
    return datagen.train_test_split(df)


def _regression_data(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    df = datagen.regression_labeled(spark, _N, _D)
    return datagen.train_test_split(df)


def _clustering_data(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    return datagen.gaussian_mixture(spark, _N, _D, k=5), None


def _ratings_data(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    df = datagen.ratings(spark, _N, num_users=200, num_items=100)
    train, test = datagen.train_test_split(df)
    return train, datagen.prune_cold(train, test)


def _lda_data(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    from pyspark.ml.feature import CountVectorizer
    from pyspark.sql import functions as F

    from ..sources.datagen import uniform_int

    # random bag-of-words docs over a small vocab (LDA.scala:20-46 shape)
    words = spark.range(_N).select(
        "id",
        F.expr(
            "transform(sequence(1, 20),"
            " i -> concat('w', cast(abs(xxhash64('lda', id, i)) % 50 as string)))"
        ).alias("tokens"),
    )
    _ = uniform_int
    cv = CountVectorizer(inputCol="tokens", outputCol="features", vocabSize=64)
    return cv.fit(words).transform(words), None


# build_battery()'s keys, as a static set: the YAML loader validates
# names WITHOUT a live SparkSession (the evaluators inside the battery
# need an active context). test_ml.py asserts the two stay in sync.
BATTERY_NAMES = frozenset({
    "logistic_regression", "decision_tree", "random_forest", "gbt",
    "linear_regression", "glm_regression", "kmeans", "lda", "als",
})


def build_battery() -> dict[str, MLBenchmark]:
    from pyspark.ml.classification import (
        DecisionTreeClassifier,
        GBTClassifier,
        LogisticRegression,
        RandomForestClassifier,
    )
    from pyspark.ml.clustering import LDA, KMeans
    from pyspark.ml.recommendation import ALS
    from pyspark.ml.regression import GeneralizedLinearRegression, LinearRegression

    auc = BinaryClassificationEvaluator(metricName="areaUnderROC")
    rmse = RegressionEvaluator(metricName="rmse")
    rmse_rating = RegressionEvaluator(metricName="rmse", labelCol="rating")
    silhouette = ClusteringEvaluator()

    return {
        "logistic_regression": MLBenchmark(
            "logistic_regression", _classification_data,
            lambda p: LogisticRegression(**p), auc, "areaUnderROC",
            {"maxIter": 10, "regParam": 0.01, "tol": 1e-6},
        ),
        "decision_tree": MLBenchmark(
            "decision_tree", _classification_data,
            lambda p: DecisionTreeClassifier(**p), auc, "areaUnderROC",
            {"maxDepth": 5},
        ),
        "random_forest": MLBenchmark(
            "random_forest", _classification_data,
            lambda p: RandomForestClassifier(**p), auc, "areaUnderROC",
            {"numTrees": 10, "maxDepth": 5, "seed": 100},
        ),
        "gbt": MLBenchmark(
            "gbt", _classification_data,
            lambda p: GBTClassifier(**p), auc, "areaUnderROC",
            {"maxIter": 5, "maxDepth": 3, "seed": 100},
        ),
        "linear_regression": MLBenchmark(
            "linear_regression", _regression_data,
            lambda p: LinearRegression(**p), rmse, "rmse",
            {"maxIter": 10, "regParam": 0.01},
        ),
        "glm_regression": MLBenchmark(
            "glm_regression", _regression_data,
            lambda p: GeneralizedLinearRegression(**p), rmse, "rmse",
            {"family": "gaussian", "link": "identity", "maxIter": 10},
        ),
        "kmeans": MLBenchmark(
            "kmeans", _clustering_data,
            lambda p: KMeans(**p), silhouette, "silhouette",
            {"k": 5, "seed": 100, "maxIter": 10},
        ),
        "lda": MLBenchmark(
            "lda", _lda_data,
            lambda p: LDA(**p), None, "none",
            {"k": 5, "maxIter": 5, "seed": 100, "optimizer": "online"},
        ),
        "als": MLBenchmark(
            "als", _ratings_data,
            lambda p: ALS(**p), rmse_rating, "rmse",
            {"rank": 8, "maxIter": 5, "seed": 100, "userCol": "user",
             "itemCol": "item", "ratingCol": "rating", "coldStartStrategy": "drop"},
        ),
    }


def run_battery(
    spark: SparkSession,
    algorithms: list[str] | None = None,
    grids: dict[str, dict[str, list[Any]]] | None = None,
) -> list[MLResult]:
    battery = build_battery()
    names = algorithms or sorted(battery)
    results = []
    for name in names:
        bench = battery[name]
        for params in expand_params((grids or {}).get(name, {})):
            results.append(bench.run(spark, params))
    return results
