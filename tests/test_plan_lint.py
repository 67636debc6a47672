"""Corpus-wide physical-plan lint: every registry query's plan must obey
the scale invariants, not just the headline queries test_plans.py audits
by hand.

For each of the ~121 registered queries we build the plan at sf0.001
(build only — no execution; the initial AQE plan is enough for lint) and
assert:

- **no CartesianProduct, ever** — an unconstrained cross product is the
  one operator with no 100 TB story. Tiny-frame cross joins must come in
  as ``F.broadcast`` (compiling to BroadcastNestedLoopJoin), and even
  those are whitelisted per query.
- **no row-at-a-time Python** (BatchEvalPython) — Python in the hot path
  must be Arrow-vectorized (ArrowEvalPython / MapInPandas /
  FlatMapGroupsInPandas) and only in the pipeline queries that genuinely
  need it, each whitelisted.
- **whole-stage codegen somewhere in the plan** — a plan with zero
  codegen spans fell off the Tungsten path entirely.

A new query that violates an invariant fails here by default; adding it
to a whitelist is a reviewed, visible decision.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_TINY

# queries allowed a BroadcastNestedLoopJoin: every one is a broadcast of
# a 1-row aggregate or a deliberately tiny frame (documented at the site)
BNLJ_OK = {
    "a4_complex_input_agg",     # 1-row global agg joined back
    "q6_forecast_revenue",      # 1-row scalar
    "q9_case_scalar_buckets",   # 1-row scalar subqueries in CASE
    "sub1_uncorrelated_scalar", # broadcast 1-row scalar (subqueries.py:43)
    "t5_tfidf_top_term",        # broadcast 1-row doc-count (tfidf.py:65)
    "t6_unigram_logprob",       # broadcast 1-row corpus totals
    "sim1_cosine_topk",         # broadcast tiny query set (similarity.py:76)
    "sim2_lsh_bucketed_ann",    # broadcast query-side signatures
    "sim3_ivf_ann",             # broadcast 16 centroids (ivf.py:108)
    "sim5_pq_adc_ann",          # broadcast 5-query ADC lookup tables (pq.py)
    "sim4_ivf_kmeans_ann",      # broadcast trained centroids
    "sim4_recall_vs_exact",     # compares the two ANN frames above
    "ml1_kmeans_cluster_sizes", # broadcast k Lloyd centroids per step
    "c5_domain_mixture",        # broadcast per-domain rates
    "c6_sequence_packing",      # broadcast partition offsets
    "w7_cumulative_vs_total",   # broadcast 1-row grand total
    "set_nfold_union_multiplicity",  # broadcast 1-row counts
    "f5_crc32_fingerprint",     # 1-row checksum
    "a14_pivot",
    "q2_week_pivot_compare",
    "g1_chain3_count",          # broadcast 1-row node-count (graph.py:61)
    "sql7_recursive_cte",       # same 1-row node-count broadcast via edge_table
    "g2_star3_count",
    "g3_triangle_count",
    "g4_square_count",
    "mj1_stats_planned_join",   # planner may broadcast sampled-small side
    "g6_pagerank",              # broadcast 1-row dangling-mass total
    "e5_funnel_conversion",     # broadcast 1-row stage counts
    "set_multiset_ops",         # broadcast 1-row except-all counts
    "sql6_materialized_cte",    # broadcast 1-row totals CTE (sqlpath.py)
    "q15_top_supplier",         # broadcast 1-row MAX over the revenue view
    "q22_inactive_customers",   # broadcast 1-row positive-balance average
}

# queries allowed Arrow-vectorized Python (the pipeline's pandas/
# mapInPandas operators); everything else must stay fully JVM-side
ARROW_OK = {
    "a10_udaf_geomean",         # pandas GROUPED_AGG UDAF
    "g5_grouped_zscore",        # applyInPandas per group
    "m1_multimodal_decode",     # mapInPandas binary decode
    "m2_frame_sample",
    "m3_byte_histogram",
    "m4_resize_thumbs",
    "sim4_ivf_kmeans_ann",      # k-means training iterations
    "sim4_recall_vs_exact",
}


def _all_queries():
    from spark_sql_perf_spark.operators import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _all_queries())
def test_plan_invariants(spark, name):
    from spark_sql_perf_spark.operators import QUERIES

    # AQE off for the lint: an un-executed adaptive plan prints
    # isFinalPlan=false with no codegen spans; the static compiled plan
    # shows the operators and codegen decisions without executing.
    # Fire the one-time session tuning FIRST — it re-enables AQE and
    # would otherwise silently override this conf inside the first
    # query build of the session (order-dependent lint results).
    from spark_sql_perf_spark.catalog import tune_session

    tune_session(spark)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = QUERIES[name](spark, SF_DIR_TINY)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")

    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"

    if "BroadcastNestedLoopJoin" in plan:
        assert name in BNLJ_OK, (
            f"{name}: BroadcastNestedLoopJoin not whitelisted — broadcast"
            f" of a non-tiny frame?\n{plan}"
        )

    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the plan\n{plan}"
    )
    arrow_ops = (
        "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas",
        "AggregateInPandas", "ArrowAggregatePython",
    )
    has_arrow = any(op in plan for op in arrow_ops)
    if has_arrow:
        assert name in ARROW_OK, (
            f"{name}: Arrow-Python operator not whitelisted\n{plan}"
        )

    # Python aggregates/maps can't codegen; everything else must
    if not has_arrow:
        assert "WholeStageCodegen" in plan or "*(" in plan, (
            f"{name}: no whole-stage codegen span anywhere\n{plan}"
        )


def test_t8_zero_shuffle_projection(spark):
    """t8's whole point at 100 TB: per-document repetition metrics must
    ride the scan stage as an in-row projection — no Exchange, no
    Generate, no join; one codegen span over the parquet scan."""
    from spark_sql_perf_spark.operators import QUERIES

    df = QUERIES["t8_repetition_metrics"](spark, SF_DIR_TINY)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan
    assert "Join" not in plan, plan
