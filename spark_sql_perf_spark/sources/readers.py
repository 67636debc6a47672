"""File readers for the reference's graph/JSON sources (SURVEY.md §2.1).

S2: SNAP ego-net `*.edges` files — first two whitespace tokens per line
    form an edge; chain lines become sliding-window edges
    (LinearQueryPerformance.scala:18-56, CircleQueryPerformance.scala:20-59).
S3: whitespace edge list (SquareQueryPerformance.scala:25-47).
S4: JSON edge list with schema inference (TwitterQueryPerformance.scala:22-24).

All readers stay declarative (spark.read.text + split/explode) so the
parse is codegen'd and the file scan parallelizes by HDFS split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_edge_pairs(spark: SparkSession, path: str) -> DataFrame:
    """Whitespace-separated `src dst` per line -> (source, target) longs.

    try_element_at/try_cast, not element_at/cast: under ANSI mode (the
    Spark 4 default this repo runs with) a short or non-numeric line
    would THROW from the index/cast instead of reaching the notNull
    skip filter — the malformed-line tolerance the filter exists for
    only works when the extraction itself is null-on-failure."""
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    return (
        lines.where(F.length(F.trim(F.col("value"))) > 0)
        .select(
            F.try_element_at(toks, F.lit(1)).try_cast("long").alias("source"),
            F.try_element_at(toks, F.lit(2)).try_cast("long").alias("target"),
        )
        .where(F.col("source").isNotNull() & F.col("target").isNotNull())
    )


def read_chain_edges(spark: SparkSession, path: str) -> DataFrame:
    """Ego-net chain lines: every ADJACENT token pair on a line is an edge
    (sliding window, the LinearQueryPerformance.scala:45-53 semantics).
    Indexes are in-bounds by the size guard; the casts are try_cast so a
    non-numeric token skips its pairs instead of failing the scan under
    ANSI mode (see read_edge_pairs)."""
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    pairs = F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> struct(try_cast(element_at(toks, i) as long) as source,"
        "            try_cast(element_at(toks, i + 1) as long) as target))"
    )
    return (
        lines.where(F.length(F.trim(F.col("value"))) > 0)
        .select(toks.alias("toks"))
        .where(F.size("toks") >= 2)
        .select(F.explode(pairs).alias("e"))
        .select("e.source", "e.target")
        .where(F.col("source").isNotNull() & F.col("target").isNotNull())
    )


def read_json_edges(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines edges with schema inference (S4)."""
    return spark.read.json(path)
