"""Named benchmark suites — the reference's Benchmark subclasses
(JoinPerformance, AggregationPerformance, Linear/Star/Circle/Square
QueryPerformance, TPCDS) as Query-list builders over GENERATED data.

Each suite returns `list[Query]` ready for ExperimentRunner, with the
reference's variation axes reproduced: payload size (varyDataSize),
match multiplicity (varyNumMatches), group count (intsN), graph shape,
and skew.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .query import Query
from .sources.datagen import (
    gen_edges,
    grouped_ints,
    ints_table,
    two_groups,
    vary_data_size,
    vary_num_matches,
)


def join_performance(
    spark: SparkSession,
    rows: int = 1_000_000,
    data_sizes: tuple[int, ...] = (1, 128, 256),
    num_matches: tuple[int, ...] = (1, 2, 4),
) -> list[Query]:
    """JoinPerformance.scala:38-70: single-key joins with payload-size and
    match-multiplicity scaling."""
    queries: list[Query] = []

    def _join_count(df: DataFrame) -> DataFrame:
        other = ints_table(spark, rows).withColumnRenamed("id", "id2")
        return df.join(other, df.id == other.id2).agg(F.count(F.lit(1)).alias("n"))

    for n_bytes in data_sizes:
        queries.append(
            Query(
                name=f"join_datasize_{n_bytes}",
                build=lambda s, nb=n_bytes: _join_count(
                    vary_data_size(ints_table(s, rows), nb)
                ),
            )
        )
    for n in num_matches:
        queries.append(
            Query(
                name=f"join_matches_{n}",
                build=lambda s, k=n: _join_count(vary_num_matches(ints_table(s, rows), k)),
            )
        )
    for how in ("inner", "left", "right", "full_outer"):
        queries.append(
            Query(
                name=f"join_{how}",
                build=lambda s, h=how: ints_table(s, rows)
                .join(
                    ints_table(s, rows // 2).withColumnRenamed("id", "id2"),
                    F.col("id") == F.col("id2"),
                    h,
                )
                .agg(F.count(F.lit(1)).alias("n")),
            )
        )
    return queries


def aggregation_performance(
    spark: SparkSession, group_counts: tuple[int, ...] = (10, 1_000, 100_000)
) -> list[Query]:
    """AggregationPerformance.scala:13-66: grouped avg over varied group
    counts, two-group sums, complex-input aggregates."""
    queries = [
        Query(
            name=f"agg_groups_{n}",
            build=lambda s, g=n: grouped_ints(s, g).groupBy("a").agg(F.avg("b").alias("avg_b")),
        )
        for n in group_counts
    ]
    queries.append(
        Query(
            name="agg_twogroups",
            build=lambda s: two_groups(s, 1_000_000).groupBy("a").agg(F.sum("b").alias("s")),
        )
    )
    queries.append(
        Query(
            name="agg_complex_input",
            build=lambda s: two_groups(s, 1_000_000).agg(
                F.sum(
                    reduce(lambda a, b: a + b, [F.col("b")] * 10)
                ).alias("sum10")
            ),
        )
    )
    return queries


def multijoin_performance(
    spark: SparkSession,
    n_nodes: int = 20_000,
    n_edges: int = 160_000,
    skews: tuple[float, ...] = (0.0, 0.8),
) -> list[Query]:
    """Linear/Star/Circle/Square QueryPerformance over generated edges,
    uniform and skewed (the TrafficEstimation skew axis)."""
    queries: list[Query] = []

    def edges(s: SparkSession, skew: float) -> DataFrame:
        return gen_edges(s, n_nodes, n_edges, seed=f"mj{skew}", skew=skew)

    def chain(s: SparkSession, skew: float) -> DataFrame:
        g = edges(s, skew)
        a, b, c = g.alias("a"), g.alias("b"), g.alias("c")
        return (
            a.join(b, F.col("a.target") == F.col("b.source"))
            .join(c, F.col("b.target") == F.col("c.source"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def star(s: SparkSession, skew: float) -> DataFrame:
        g = edges(s, skew)
        a, b, c = g.alias("a"), g.alias("b"), g.alias("c")
        return (
            a.join(b, F.col("a.source") == F.col("b.source"))
            .join(c, F.col("b.source") == F.col("c.source"))
            .where(
                (F.col("a.target") < F.col("b.target"))
                & (F.col("b.target") < F.col("c.target"))
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def triangle(s: SparkSession, skew: float) -> DataFrame:
        g = edges(s, skew)
        a, b, c = g.alias("a"), g.alias("b"), g.alias("c")
        return (
            a.join(b, F.col("a.target") == F.col("b.source"))
            .join(c, F.col("b.target") == F.col("c.source"))
            .where(
                (F.col("c.target") == F.col("a.source"))
                & (F.col("a.source") < F.col("b.source"))
                & (F.col("b.source") < F.col("c.source"))
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )

    for skew in skews:
        tag = f"skew{skew}" if skew else "uniform"
        queries += [
            Query(name=f"mj_chain_{tag}", build=lambda s, k=skew: chain(s, k)),
            Query(name=f"mj_star_{tag}", build=lambda s, k=skew: star(s, k)),
            Query(name=f"mj_triangle_{tag}", build=lambda s, k=skew: triangle(s, k)),
        ]
    return queries


def tpcds_performance(spark: SparkSession, scale: float = 0.01) -> list[Query]:
    from .operators.tpcds_suite import register_tpcds, tpcds_queries

    register_tpcds(spark, scale)
    return tpcds_queries()


def _impala(suite: str | None):
    def build(spark: SparkSession, scale: float = 0.01) -> list[Query]:
        from .operators.impala_suite import impala_queries
        from .operators.tpcds_suite import register_tpcds

        register_tpcds(spark, scale)
        return impala_queries(suite)

    return build


def tpcds14_performance(spark: SparkSession, scale: float = 0.01) -> list[Query]:
    from .operators.tpcds14_suite import register_tpcds14, tpcds14_queries

    register_tpcds14(spark, scale)
    return tpcds14_queries()


SUITES = {
    "joinperf": join_performance,
    "aggperf": aggregation_performance,
    "multijoin": multijoin_performance,
    "tpcds": tpcds_performance,
    "tpcds14": tpcds14_performance,
    # the Impala-kit dashboard suites (ImpalaKitQueries.scala:1465-1469)
    "impala": _impala(None),
    "interactive": _impala("interactive"),
    "reporting": _impala("reporting"),
    "deep_analytic": _impala("deep_analytic"),
}
