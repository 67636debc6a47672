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


def test_triangle_both_strategies_agree(spark):
    """The naive broadcast chain and the degree-ordered wedge enumeration
    are pure plan decisions — same count either way."""
    from spark_sql_perf_spark.operators.graph import edge_table, triangle_count_df

    g = edge_table(spark, SF_DIR_TINY)
    naive = triangle_count_df(g, degree_ordered=False).collect()[0][0]
    ordered = triangle_count_df(g, degree_ordered=True).collect()[0][0]
    assert naive == ordered


def test_square_both_strategies_agree(spark):
    """Wedge-diagonal join vs Chiba-Nishizeki wedge-pair enumeration:
    identical square counts (the CN path additionally bounds the hub-mid
    2-path intermediate at O(arboricity * m))."""
    from spark_sql_perf_spark.operators.graph import edge_table, square_count_df

    g = edge_table(spark, SF_DIR_TINY)
    diag = square_count_df(g, cn_ordered=False).collect()[0][0]
    cn = square_count_df(g, cn_ordered=True).collect()[0][0]
    assert diag == cn


def test_naive_pattern_threshold_tracks_conf(spark):
    """The naive-vs-ordered strategy flip derives from the session's
    autoBroadcastJoinThreshold instead of a hard-coded row count."""
    from spark_sql_perf_spark.operators.graph import (
        _parse_size_bytes,
        naive_pattern_max_edges,
    )

    assert _parse_size_bytes("64m") == 64 * 1024 * 1024
    assert _parse_size_bytes("10485760b") == 10485760
    assert _parse_size_bytes("1g") == 1 << 30
    assert _parse_size_bytes("512kb") == 512 * 1024
    # fractional size strings are valid Spark conf values — int('1.5')
    # would raise and silently fall back to the 64m-derived default
    assert _parse_size_bytes("1.5g") == int(1.5 * (1 << 30))
    assert _parse_size_bytes("0.5m") == 512 * 1024

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1m")
        assert naive_pattern_max_edges(spark) == (1 << 20) // 16
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert naive_pattern_max_edges(spark) == 0  # broadcast disabled
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert naive_pattern_max_edges(None) > 0  # sessionless fallback


def test_cn_square_plan_quality(spark):
    """The forced Chiba-Nishizeki square plan must (a) never contain a
    CartesianProduct, (b) read the support pairs from the materialized
    localCheckpoint (one edge-derivation execution, not one per branch),
    and (c) keep the candidate-pair generation as a streamed two-step
    explode (two Generate nodes), not a single per-row buffered
    flatten."""
    from spark_sql_perf_spark.operators.graph import edge_table, square_count_df

    df = square_count_df(edge_table(spark, SF_DIR_TINY), cn_ordered=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "ExistingRDD" in plan  # localCheckpoint'd support pairs
    assert plan.count("Generate explode") + plan.count("Generate posexplode") >= 2
