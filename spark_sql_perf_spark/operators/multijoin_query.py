"""The statistics-driven multi-join planner as an oracle-checked query —
the `strategiesChoosing` variation (SURVEY.md §2.3 J16) producing
verifiably identical results to the declarative join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..plans.multijoin import JoinEdge, plan_and_join
from .registry import query


@query(
    "mj1_stats_planned_join",
    oracle="""
    SELECT n_name, COUNT(*) AS n_lineitems
    FROM nation
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders   ON o_custkey   = c_custkey
      JOIN lineitem ON l_orderkey  = o_orderkey
    GROUP BY n_name
    """,
)
def mj1_stats_planned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J16: the 4-relation chain joined in the ORDER THE PLANNER CHOOSES
    from sampled statistics (row counts + approx NDVs -> greedy smallest-
    intermediate-first + broadcast hints). Same semantics as j4_chain_join;
    different — planned — physical shape."""
    rels = {
        name: table(spark, sf_dir, name)
        for name in ("lineitem", "orders", "customer", "nation")
    }
    edges = [
        JoinEdge("lineitem", "orders", "l_orderkey", "o_orderkey"),
        JoinEdge("orders", "customer", "o_custkey", "c_custkey"),
        JoinEdge("customer", "nation", "c_nationkey", "n_nationkey"),
    ]
    joined, _plan = plan_and_join(rels, edges, enabled=True)
    return joined.groupBy("n_name").agg(F.count(F.lit(1)).alias("n_lineitems"))
