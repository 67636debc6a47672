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
    gen_table,
    grouped_ints,
    ints_table,
    two_groups,
    uniform_int,
    vary_data_size,
    vary_num_matches,
)

# conf key for the fact-fact skew suite's salting variation axis:
#   python -m spark_sql_perf_spark.cli -b suite:factfact \
#       --variations spark_sql_perf.join.salting=off|on
SALTING_CONF = "spark_sql_perf.join.salting"

# conf key for the scan-layout suite's layout variation axis:
#   python -m spark_sql_perf_spark.cli -b suite:layout \
#       --variations spark_sql_perf.scan.layout=plain|zorder|partitioned
LAYOUT_CONF = "spark_sql_perf.scan.layout"


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


def factfact_performance(
    spark: SparkSession,
    rows: int = 4_000_000,
    hot_denom: int = 8,
    n_salts: int = 16,
) -> list[Query]:
    """Fact-fact equi-join with a planted hot key — the reference's
    HyperCube-shuffle motivation (RunBenchmark.scala:102-105) answered
    with stock Spark. 1/hot_denom of the left rows share key 0, so one
    reducer receives that whole slab in a plain shuffle join. The
    ``SALTING_CONF`` variation axis switches the same query between:

    - ``off``: plain join — AQE's skew-join splitting is the first line
      of defense (it can split a skewed SMJ partition at runtime);
    - ``on``: explicit salting via ``plans.layout.salt_join`` — left
      rows get a deterministic salt, right rows replicate across all
      salts; exact same join output, hot key spread over n_salts
      reducers. This is the tool for the cases AQE cannot split
      (aggregate skew, broadcast-ineligible many-to-many).

    The queries read the conf at build time, so the axis composes with
    the runner's variation cartesian like any conf-backed variation.
    """
    from .plans.layout import salt_join

    key_domain = max(rows // 10, 10)

    def left(s: SparkSession) -> DataFrame:
        return gen_table(s, rows, {
            "k": lambda idc: F.when(
                uniform_int(idc, "hot", 0, hot_denom - 1) == 0, F.lit(0).cast("long")
            ).otherwise(uniform_int(idc, "k", 1, key_domain)),
            "v": lambda idc: uniform_int(idc, "v", 0, 1_000_000),
        })

    def right(s: SparkSession) -> DataFrame:
        return gen_table(s, rows // 4, {
            "k2": lambda idc: uniform_int(idc, "k2", 0, key_domain),
            "w": lambda idc: uniform_int(idc, "w", 0, 1_000_000),
        })

    def build(s: SparkSession) -> DataFrame:
        lf, rt = left(s), right(s)
        if s.conf.get(SALTING_CONF, "off") == "on":
            j = salt_join(lf, rt, "k", "k2", n_salts=n_salts)
        else:
            j = lf.join(rt, lf["k"] == rt["k2"])
        return j.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") + F.col("w")).alias("chk"),
        )

    from .modes import HASH

    # HASH mode: the runner records a content checksum, so a variation
    # sweep verifies the salted and plain plans agree on the answer
    return [Query(name="factfact_skew_join", build=build, mode=HASH)]


_LAYOUT_MEMO: dict[int, str] = {}


def _layout_root(spark: SparkSession, rows: int) -> str:
    """Write the three layouts of the same generated fact once per
    (rows, process): plain (insertion order), Z-ordered on (k1,k2),
    hash-bucket directory-partitioned on k1's bucket."""
    if rows in _LAYOUT_MEMO:
        return _LAYOUT_MEMO[rows]
    import atexit
    import shutil
    import tempfile

    from .operators.layout_query import morton_code

    root = tempfile.mkdtemp(prefix="spark_sql_perf_layouts_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    fact = gen_table(spark, rows, {
        "k1": lambda idc: uniform_int(idc, "ly1", 0, 1023),
        "k2": lambda idc: uniform_int(idc, "ly2", 0, 1023),
        "v": lambda idc: (uniform_int(idc, "lyv", 0, 1_000_000) / 100.0),
        "pay": lambda idc: F.repeat(
            F.conv(uniform_int(idc, "lyp", 0, (1 << 62)).cast("string"), 10, 16), 4
        ),
    })
    fact.repartition(32).write.mode("overwrite").parquet(f"{root}/plain")
    z = morton_code(F.col("k1"), F.col("k2"))
    (fact.withColumn("_z", z).repartitionByRange(32, "_z")
        .sortWithinPartitions("_z").drop("_z")
        .write.mode("overwrite").parquet(f"{root}/zorder"))
    # range-partition k1 into 16 directories of 64 values each: a k1
    # range predicate maps to a directory range (modulo would not prune)
    (fact.withColumn("_b", F.floor(F.col("k1") / 64)).repartition(16, "_b")
        .write.mode("overwrite").partitionBy("_b").parquet(f"{root}/partitioned"))
    _LAYOUT_MEMO[rows] = root
    return root


def layout_performance(spark: SparkSession, rows: int = 2_000_000) -> list[Query]:
    """Scan-layout suite: ONE 2-D box aggregate over three on-disk
    layouts of the same rows — the l3/l4 layout operators as a harness
    suite. The ``LAYOUT_CONF`` variation axis picks the layout at build
    time (plain | zorder | partitioned), so a variation sweep times the
    identical logical query against each physical layout, and HASH mode's
    content checksum proves layout never changes the answer:

    - ``plain``: insertion-order files — every row group decoded;
    - ``zorder``: Morton-clustered on (k1,k2) — row groups outside the
      box are skipped on footer min/max for BOTH keys;
    - ``partitioned``: Hive directories on k1's bucket — the k1
      predicate prunes directories before listing (PartitionFilters),
      the k2 predicate then skips row groups within survivors.
    """
    from .modes import HASH

    def build(s: SparkSession) -> DataFrame:
        root = _layout_root(s, rows)
        layout = s.conf.get(LAYOUT_CONF, "plain")
        df = s.read.parquet(f"{root}/{layout}")
        if layout == "partitioned":
            # implied by k1 <= 101 (directories hold 64 k1-values each);
            # stated explicitly so the scan prunes directories pre-listing
            df = df.where(F.col("_b") <= 101 // 64).drop("_b")
        return (
            df.where(F.col("k1").between(0, 101) & F.col("k2").between(0, 101))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length("pay")).alias("pay_bytes"),
                F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s"),
            )
        )

    return [Query(name="layout_box_scan", build=build, mode=HASH)]


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



def pipeline_performance(
    spark: SparkSession, sf_dir: str | None = None
) -> list[Query]:
    """The LLM-data pipeline family (dedup / curation / text / ANN) as a
    runner suite over the testdata documents+embeddings tables, so the
    harness surface (variations, phase timing, modes, breakdown) applies
    to the north-star operators exactly as to the TPC corpora.

    ``sf_dir`` defaults to $SPARK_GRAFT_SF_DIR, falling back to sf0.01.
    Cheap queries lead so budgeted samples stay fast.
    """
    import os

    from .operators import QUERIES

    sf = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names = [
        "c3_hash_split",
        "t3_token_count",
        "t6_unigram_logprob",
        "c2_blocklist_filter",
        "c5_domain_mixture",
        "q6_quality_filter",
        "c4_repetition_filter",
        "c6_sequence_packing",
        "d1_dedup_exact",
        "d3_dedup_simhash",
        "c1_decontaminate_4gram",
        "d2_dedup_minhash_lsh",
        "c7_fuzzy_decontaminate",
        "d6_dedup_components",
        "sim2_lsh_bucketed_ann",
        "sim3_ivf_ann",
    ]
    return [Query(name=n, build=lambda s, n=n: QUERIES[n](s, sf)) for n in names]


SUITES = {
    "joinperf": join_performance,
    "aggperf": aggregation_performance,
    "factfact": factfact_performance,
    "layout": layout_performance,
    "multijoin": multijoin_performance,
    "tpcds": tpcds_performance,
    "tpcds14": tpcds14_performance,
    "pipeline": pipeline_performance,
    # the Impala-kit dashboard suites (ImpalaKitQueries.scala:1465-1469)
    "impala": _impala(None),
    "interactive": _impala("interactive"),
    "reporting": _impala("reporting"),
    "deep_analytic": _impala("deep_analytic"),
}
