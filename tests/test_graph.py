"""Graph-operator gates beyond the oracle equivalence (which
test_oracle_sf0001.py covers for g1-g6): semantic invariants of the
fixed-point PageRank."""

from __future__ import annotations

from tests.conftest import SF_DIR_TINY

def test_g6_pagerank_invariants(spark):
    """Fixed-point PageRank: total mass never exceeds SCALE (dangling +
    truncation only lose mass), every rank is at least the teleport
    floor, and hubs outrank the floor."""
    from spark_sql_perf_spark.operators.graph import _PR_SCALE, edge_table, pagerank_df

    from pyspark.sql import functions as F

    r = pagerank_df(edge_table(spark, SF_DIR_TINY))
    agg = r.agg(
        F.sum("rank_fp").alias("mass"),
        F.min("rank_fp").alias("lo"),
        F.max("rank_fp").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert agg["mass"] <= _PR_SCALE
    floor = ((_PR_SCALE * 3) // 20) // agg["n"]
    assert agg["lo"] >= floor
    assert agg["hi"] > floor  # somebody has in-links
