"""Deterministic ML dataset generators (mllib/data/dataGeneration.scala
re-expressed).

Everything is `spark.range` + hash-derived uniforms assembled into
`pyspark.ml` Vectors via array_to_vector — no RandomRDDs, no Python row
loops, parallelism-invariant like the relational datagen.

Ground truth: the reference builds models with private constructors
(ModelBuilder.scala:14-54) and labels data by applying them; we generate
labels directly from a known linear model expression — same intent
(recoverable ground truth), public API only.
"""

from __future__ import annotations

import math

from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.datagen import uniform, uniform_int


def _feature_cols(idc, num_features: int, seed: str) -> list:
    return [uniform(idc, f"{seed}:f{j}", -1.0, 1.0).alias(f"f{j}") for j in range(num_features)]


def continuous_features(
    spark: SparkSession, n: int, num_features: int, seed: str = "ml"
) -> DataFrame:
    """features: Vector(dense) of uniforms in [-1, 1)."""
    idc = F.col("id")
    df = spark.range(n).select("id", *_feature_cols(idc, num_features, seed))
    return df.select(
        "id",
        array_to_vector(F.array(*[F.col(f"f{j}") for j in range(num_features)])).alias(
            "features"
        ),
    )


def binary_labeled(
    spark: SparkSession, n: int, num_features: int, seed: str = "ml"
) -> DataFrame:
    """Logistic ground truth: label = 1[sigmoid(w.x) > u], w_j = 4(-1)^j/(j+1).

    The x4 weight scale sharpens the sigmoid so the Bayes-optimal AUC is
    high — a learnability check, not a noise-fitting exercise."""
    idc = F.col("id")
    df = spark.range(n).select("id", *_feature_cols(idc, num_features, seed))
    margin = None
    for j in range(num_features):
        w = 4.0 * ((-1) ** j) / (j + 1)
        term = F.col(f"f{j}") * F.lit(w)
        margin = term if margin is None else margin + term
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    label = (prob > uniform(idc, f"{seed}:lbl", 0.0, 1.0)).cast("double")
    return df.select(
        "id",
        array_to_vector(F.array(*[F.col(f"f{j}") for j in range(num_features)])).alias(
            "features"
        ),
        label.alias("label"),
    )


def regression_labeled(
    spark: SparkSession, n: int, num_features: int, noise: float = 0.1, seed: str = "ml"
) -> DataFrame:
    """Linear ground truth with additive uniform noise."""
    idc = F.col("id")
    df = spark.range(n).select("id", *_feature_cols(idc, num_features, seed))
    y = None
    for j in range(num_features):
        term = F.col(f"f{j}") * F.lit(1.0 / (j + 1))
        y = term if y is None else y + term
    y = y + uniform(idc, f"{seed}:noise", -noise, noise)
    return df.select(
        "id",
        array_to_vector(F.array(*[F.col(f"f{j}") for j in range(num_features)])).alias(
            "features"
        ),
        y.alias("label"),
    )


def gaussian_mixture(
    spark: SparkSession, n: int, num_features: int, k: int, seed: str = "ml",
    spread: float = 0.05,
) -> DataFrame:
    """k well-separated centers + per-point jitter (KMeans benchmark data,
    dataGeneration.scala:45-56). Box-Muller on hash-uniforms for the jitter."""
    idc = F.col("id")
    center = uniform_int(idc, f"{seed}:c", 0, k - 1)
    cols = []
    for j in range(num_features):
        # center coordinate: hash of (center, j) in [-1, 1)
        cj = (
            (F.abs(F.xxhash64(F.lit(f"{seed}:center{j}"), center)) % F.lit(1 << 30)).cast(
                "double"
            )
            / F.lit(float(1 << 30))
        ) * 2.0 - 1.0
        u1 = uniform(idc, f"{seed}:u1{j}", 1e-12, 1.0)
        u2 = uniform(idc, f"{seed}:u2{j}", 0.0, 1.0)
        normal = F.sqrt(-2.0 * F.log(u1)) * F.cos(F.lit(2 * math.pi) * u2)
        cols.append((cj + normal * spread).alias(f"f{j}"))
    df = spark.range(n).select("id", center.alias("center"), *cols)
    return df.select(
        "id",
        "center",
        array_to_vector(F.array(*[F.col(f"f{j}") for j in range(num_features)])).alias(
            "features"
        ),
    )


def ratings(
    spark: SparkSession, n: int, num_users: int, num_items: int, seed: str = "ml"
) -> DataFrame:
    """Deduplicated synthetic ratings (RatingGenerator.scala:8-35 shape);
    implicit structure: rating = f(user bucket, item bucket)."""
    idc = F.col("id")
    df = spark.range(n).select(
        uniform_int(idc, f"{seed}:u", 0, num_users - 1).cast("int").alias("user"),
        uniform_int(idc, f"{seed}:i", 0, num_items - 1).cast("int").alias("item"),
    )
    df = df.groupBy("user", "item").agg(F.lit(1).alias("_one")).drop("_one")
    rating = ((F.col("user") % 5) + (F.col("item") % 5) + 1).cast("float") / 2.0
    return df.select("user", "item", rating.alias("rating"))


def train_test_split(
    df: DataFrame, test_fraction: float = 0.2, seed: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Hash-based split — deterministic at any parallelism (the reference
    uses randomSplit, which is partition-dependent). Hashes every column so
    composite-key rows (e.g. user+item ratings) split independently."""
    bucket = F.abs(F.xxhash64(F.lit(seed), *[F.col(c) for c in df.columns])) % 1000
    test = df.where(bucket < int(test_fraction * 1000))
    train = df.where(bucket >= int(test_fraction * 1000))
    return train, test


def prune_cold(train: DataFrame, test: DataFrame) -> DataFrame:
    """Drop test ratings whose user/item never occurs in train — the RDD
    subtractByKey chains of dataGeneration.scala:58-105 as left-semi joins."""
    users = train.select("user").distinct()
    items = train.select("item").distinct()
    return test.join(users, "user", "left_semi").join(items, "item", "left_semi")
