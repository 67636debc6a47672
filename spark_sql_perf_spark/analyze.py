"""Results analysis: per-query timing stats + baseline comparison —
RunBenchmark.scala:150-196 re-expressed over the JSON results store.

The results dataset is the harness's own nested-JSON table (FIXTURES.md
§B6); analysis is the explode/groupBy/agg pattern the reference runs
(A12/A13 in the operator inventory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_results(spark: SparkSession, results_location: str) -> DataFrame:
    """Read every timestamp=<ms> run dir as one DataFrame."""
    return spark.read.json(f"{results_location}/timestamp=*/results.json")


def summarize(results: DataFrame) -> DataFrame:
    """Per-query min/max/avg/stddev of execution time across iterations
    (RunBenchmark.scala:152-174)."""
    exploded = results.select(
        "iteration", F.explode("results").alias("r")
    ).select("iteration", "r.name", "r.execution_time_ms", "r.failure")
    return (
        exploded.where(F.col("failure").isNull())
        .groupBy("name")
        .agg(
            F.count(F.lit(1)).alias("runs"),
            F.min("execution_time_ms").alias("min_ms"),
            F.max("execution_time_ms").alias("max_ms"),
            F.avg("execution_time_ms").alias("avg_ms"),
            F.stddev_samp("execution_time_ms").alias("stddev_ms"),
        )
        .orderBy("name")
    )


def compare_to_baseline(
    current: DataFrame, baseline: DataFrame
) -> DataFrame:
    """percentChange vs a baseline run (RunBenchmark.scala:177-196)."""
    cur = summarize(current).select(
        "name", F.col("avg_ms").alias("current_avg_ms")
    )
    base = summarize(baseline).select(
        "name", F.col("avg_ms").alias("baseline_avg_ms")
    )
    return (
        cur.join(base, "name", "left")
        .withColumn(
            "percent_change",
            F.when(
                F.col("baseline_avg_ms").isNotNull(),
                (F.col("baseline_avg_ms") - F.col("current_avg_ms"))
                / F.col("baseline_avg_ms")
                * 100.0,
            ),
        )
        .orderBy("name")
    )
