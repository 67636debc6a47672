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
    """Whitespace-separated `src dst` per line -> (source, target) longs."""
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    return (
        lines.where(F.length(F.trim(F.col("value"))) > 0)
        .select(
            F.element_at(toks, 1).cast("long").alias("source"),
            F.element_at(toks, 2).cast("long").alias("target"),
        )
        .where(F.col("source").isNotNull() & F.col("target").isNotNull())
    )


def read_chain_edges(spark: SparkSession, path: str) -> DataFrame:
    """Ego-net chain lines: every ADJACENT token pair on a line is an edge
    (sliding window, the LinearQueryPerformance.scala:45-53 semantics)."""
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    pairs = F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> struct(cast(element_at(toks, i) as long) as source,"
        "            cast(element_at(toks, i + 1) as long) as target))"
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
