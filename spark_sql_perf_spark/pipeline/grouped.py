"""applyInPandas (GROUPED_MAP) operators — the per-group Arrow-batched
custom-transform surface (SURVEY.md §2.10: PySpark's replacement for the
typed Aggregator / Dataset.map battery).

g1: per-group z-score normalization. Oracle-checkable because the group
mean/std are computed from exact decimal sums, and the per-row arithmetic
is plain IEEE double — identical in both engines after rounding.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import table
from ..operators.registry import query

_ZSCORE_SCHEMA = StructType(
    [
        StructField("p_brand", StringType()),
        StructField("p_partkey", LongType()),
        StructField("p_retailprice", DoubleType()),
        StructField("zscore", DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # exact arithmetic mirror of the SQL oracle: decimal-clean inputs (2dp)
    # summed as scaled integers -> mean/std identical to the decimal SQL
    cents = (pdf["p_retailprice"] * 100).round().astype("int64")
    n = len(cents)
    mean = (cents.sum() / n) / 100.0
    if n > 1:
        sq = (cents * cents).sum() / 10000.0
        s = cents.sum() / 100.0
        var = (sq - s * s / n) / (n - 1)
        std = math.sqrt(var) if var > 0 else 0.0
    else:
        std = 0.0
    z = (pdf["p_retailprice"] - mean) / std if std > 0 else pdf["p_retailprice"] * 0.0
    return pd.DataFrame(
        {
            "p_brand": pdf["p_brand"],
            "p_partkey": pdf["p_partkey"],
            "p_retailprice": pdf["p_retailprice"],
            "zscore": z.round(6),
        }
    )


@query(
    "g5_grouped_zscore",
    oracle="""
    WITH stats AS (
      SELECT p_brand,
             COUNT(*) AS n,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean,
             SQRT((CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))
                            * CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                   - CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                     * CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
                  / (COUNT(*) - 1)) AS std
      FROM part GROUP BY p_brand)
    SELECT p.p_brand, p_partkey, p_retailprice,
           ROUND(CASE WHEN s.n > 1 AND s.std > 0
                      THEN (p_retailprice - s.mean) / s.std
                      ELSE 0.0 END, 6) AS zscore
    FROM part p JOIN stats s ON p.p_brand = s.p_brand
    """,
)
def g5_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand z-score via applyInPandas (GROUPED_MAP): whole groups
    stream through Arrow into pandas and back — the custom-operator escape
    hatch when semantics exceed built-in expressions.

    Scale note: group sizes must fit a pandas frame; brands are bounded
    (25) with rows/brand growing, so at extreme scale this exact pattern
    would switch to the window-function form the oracle uses.
    """
    part = table(spark, sf_dir, "part").select("p_brand", "p_partkey", "p_retailprice")
    return part.groupBy("p_brand").applyInPandas(_zscore_group, schema=_ZSCORE_SCHEMA)
