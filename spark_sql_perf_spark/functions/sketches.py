"""Mergeable-sketch column library — the 100 TB pattern for cardinality
and frequency questions that exact aggregation answers too expensively.

The reference's corpus only ever counts exactly (COUNT(DISTINCT ...) in
TPCDS_1_4_Queries.scala, a full shuffle of the distinct keys). At
cluster scale the sketch algebra is what makes these queries cheap AND
incremental:

- build a small fixed-size sketch per partition/day/shard (map-side,
  one pass, no shuffle of keys — only sketches move),
- union sketches associatively (a groupBy of kilobyte blobs),
- estimate at the end.

Because union is associative and commutative, per-day sketches roll up
to month/all-time without touching the raw data again — the property
exact distinct counting fundamentally lacks. Spark ships Apache
DataSketches HLL (hll_sketch_agg / hll_union_agg / hll_sketch_estimate)
and a Count-Min sketch; both are deterministic for a given input
multiset, so estimates are stable run to run (tested), just not
exactly equal to the true cardinality (bounded relative error, also
tested).

Everything here is a thin, typed composition of JVM-side aggregates —
no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketch(col: str | Column, lg_k: int = 12) -> Column:
    """HLL sketch of a column's distinct values (~2^lg_k bytes; lg_k=12
    gives ~1.6% relative standard error)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.hll_sketch_agg(c, F.lit(lg_k))


def sketch_estimate(sketch: Column) -> Column:
    """Cardinality estimate from an HLL sketch blob (bigint)."""
    return F.hll_sketch_estimate(sketch)


def grouped_distinct_estimate(
    df: DataFrame, group: str, col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group approximate distinct count: one map-side sketch pass,
    one shuffle of (group, sketch-blob) pairs. Contrast with exact
    COUNT(DISTINCT col), which shuffles every (group, value) pair."""
    return (
        df.groupBy(group)
        .agg(distinct_sketch(col, lg_k).alias("sk"))
        .select(group, sketch_estimate(F.col("sk")).alias("approx_distinct"))
    )


def rollup_distinct_estimate(
    df: DataFrame, fine: str, coarse: Column, col: str, lg_k: int = 12
) -> DataFrame:
    """The incremental-rollup shape: sketch once at the fine grain
    (e.g. day), then union the stored blobs up to the coarse grain
    (e.g. month) WITHOUT rescanning rows — hll_union_agg over blobs.
    Returns (coarse_key, approx_distinct)."""
    fine_sketches = (
        df.groupBy(fine)
        .agg(distinct_sketch(col, lg_k).alias("sk"))
        .withColumn("coarse_key", coarse)  # derived from the fine key
    )
    return (
        fine_sketches.groupBy("coarse_key")
        .agg(F.hll_union_agg(F.col("sk")).alias("sk"))
        .select("coarse_key", sketch_estimate(F.col("sk")).alias("approx_distinct"))
    )


def approx_quantiles(
    df: DataFrame, col: str, probs: list[float], accuracy: int = 10_000
) -> DataFrame:
    """Single-pass mergeable quantiles (Greenwald-Khanna variant):
    per-partition summaries merge, so cost is one pass + tiny shuffle
    vs an exact global sort."""
    return df.agg(
        F.percentile_approx(
            F.col(col), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
        ).alias("quantiles")
    )


def frequency_sketch(
    df: DataFrame, col: str, eps: float = 0.001, confidence: float = 0.99, seed: int = 1
) -> DataFrame:
    """Count-Min sketch blob over a column (point-lookup frequency
    estimates with +eps*N one-sided error). Mergeable across shards the
    same way as HLL; Spark exposes build (count_min_sketch) and the
    estimate is read via the sketch's API downstream — here we keep the
    blob column, the unit tests exercise determinism and size bounds."""
    return df.agg(
        F.count_min_sketch(
            F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms")
    )
