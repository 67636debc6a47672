"""Graph-pattern multi-join corpus (SURVEY.md §2.3 J4-J7, the fork's soul).

The reference runs chain/star/circle(triangle)/square pattern queries as
self-joins over a 2-column edge table (LinearQueryPerformance.scala:58-65,
SquareQueryPerformance.scala:69-89, CircleQueryPerformance.scala:77-93).
We derive a deterministic pseudo-random edge table from `orders` so the
same graph exists in Spark and the DuckDB oracle:

    n_nodes = max(|orders| / 8, 25)          -- keeps avg degree ~8 at any
    src     = md5('s'||o_orderkey) % n_nodes    scale factor, so pattern
    dst     = md5('d'||o_orderkey) % n_nodes    counts stay O(|orders|)

md5 is the one hash both engines share bit-for-bit. Self-loops removed,
edges deduplicated.

Scale notes: pattern joins are the classic shuffle-explosion workload —
the reference's HyperCube shuffle existed for exactly this. Our stock-Spark
answer: keep the edge relation skinny (two longs), let AQE pick
sort-merge vs broadcast per join, and count without materializing (the
final agg is partial). The statistics-driven join planner in
``plans/multijoin.py`` layers the strategy choice on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .registry import query

_EDGES_SQL = """
    WITH nn AS (
      SELECT GREATEST(COUNT(*) // 8, 25) AS n FROM orders),
    edges AS (
      SELECT DISTINCT
        CAST(('0x' || SUBSTR(md5('s' || CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % nn.n AS src,
        CAST(('0x' || SUBSTR(md5('d' || CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % nn.n AS dst
      FROM orders, nn),
    g AS (SELECT src, dst FROM edges WHERE src <> dst)
"""


def edge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic edge list (src, dst) derived from orders."""
    orders = table(spark, sf_dir, "orders")
    # floor division on both sides — DuckDB's CAST(double AS BIGINT) rounds
    # while Spark's truncates, so the derivation must stay integral.
    nn = orders.agg(
        F.greatest(F.floor(F.count(F.lit(1)) / 8).cast("bigint"), F.lit(25).cast("bigint")).alias("n")
    )

    def h(prefix: str) -> F.Column:
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), F.col("o_orderkey").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint") % F.col("n")

    return (
        orders.crossJoin(F.broadcast(nn))
        .select(h("s").alias("src"), h("d").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


@query(
    "g1_chain3_count",
    oracle=_EDGES_SQL
    + """
    SELECT COUNT(*) AS n_chains
    FROM g a JOIN g b ON a.dst = b.src JOIN g c ON b.dst = c.src
    """,
)
def g1_chain3_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: 3-chain pattern `a.target=b.source AND b.target=c.source`
    (LinearQueryPerformance.scala:77-91)."""
    g = edge_table(spark, sf_dir)
    a, b, c = g.alias("a"), g.alias("b"), g.alias("c")
    return (
        a.join(b, F.col("a.dst") == F.col("b.src"))
        .join(c, F.col("b.dst") == F.col("c.src"))
        .agg(F.count(F.lit(1)).alias("n_chains"))
    )


@query(
    "g2_star3_count",
    oracle=_EDGES_SQL
    + """
    SELECT COUNT(*) AS n_stars
    FROM g a JOIN g b ON a.src = b.src JOIN g c ON b.src = c.src
    WHERE a.dst < b.dst AND b.dst < c.dst
    """,
)
def g2_star3_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: 3-star pattern, leaves ordered so each star counts once
    (StarQueryPerformance.scala:77-91)."""
    g = edge_table(spark, sf_dir)
    a, b, c = g.alias("a"), g.alias("b"), g.alias("c")
    return (
        a.join(b, F.col("a.src") == F.col("b.src"))
        .join(c, F.col("b.src") == F.col("c.src"))
        .where((F.col("a.dst") < F.col("b.dst")) & (F.col("b.dst") < F.col("c.dst")))
        .agg(F.count(F.lit(1)).alias("n_stars"))
    )


@query(
    "g3_triangle_count",
    oracle=_EDGES_SQL
    + """
    SELECT COUNT(*) AS n_triangles
    FROM g a JOIN g b ON a.dst = b.src JOIN g c ON b.dst = c.src
    WHERE c.dst = a.src AND a.src < b.src AND b.src < c.src
    """,
)
def g3_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: ordered triangle (cycle) pattern — chain + closing edge +
    `a.source < b.source < c.source` (CircleQueryPerformance.scala:77-93,
    TwitterQueryPerformance.scala:36-40)."""
    g = edge_table(spark, sf_dir)
    a, b, c = g.alias("a"), g.alias("b"), g.alias("c")
    return (
        a.join(b, F.col("a.dst") == F.col("b.src"))
        .join(c, F.col("b.dst") == F.col("c.src"))
        .where(
            (F.col("c.dst") == F.col("a.src"))
            & (F.col("a.src") < F.col("b.src"))
            & (F.col("b.src") < F.col("c.src"))
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


@query(
    "g4_square_count",
    oracle=_EDGES_SQL
    + """
    SELECT COUNT(*) AS n_squares
    FROM g a JOIN g b ON a.dst = b.src JOIN g c ON b.dst = c.src
             JOIN g d ON c.dst = d.src
    WHERE d.dst = a.src
      AND a.src < b.src AND a.src < c.src AND a.src < d.src AND b.src < d.src
    """,
)
def g4_square_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: 4-cycle (square) pattern with distinctness/canonicalization
    filters (SquareQueryPerformance.scala:72-80)."""
    g = edge_table(spark, sf_dir)
    a, b, c, d = g.alias("a"), g.alias("b"), g.alias("c"), g.alias("d")
    return (
        a.join(b, F.col("a.dst") == F.col("b.src"))
        .join(c, F.col("b.dst") == F.col("c.src"))
        .join(d, F.col("c.dst") == F.col("d.src"))
        .where(
            (F.col("d.dst") == F.col("a.src"))
            & (F.col("a.src") < F.col("b.src"))
            & (F.col("a.src") < F.col("c.src"))
            & (F.col("a.src") < F.col("d.src"))
            & (F.col("b.src") < F.col("d.src"))
        )
        .agg(F.count(F.lit(1)).alias("n_squares"))
    )
