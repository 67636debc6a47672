#!/usr/bin/env python
"""Write PLANS.md: finalized physical plans for the headline queries at
the bench scale factor — the plan-quality evidence trail (pushed filters,
broadcast choices, codegen spans, AQE decisions). A generated index table
at the top maps each query to its line anchor and a one-line plan digest
so a reviewer can triage without scrolling 2,800 lines."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from spark_sql_perf_spark.operators import QUERIES  # noqa: E402
from spark_sql_perf_spark.session import build_session  # noqa: E402

EXTRA = [
    "asof1_last_click_before_purchase",
    "mj1_stats_planned_join",
    "g4_square_count",
    "c1_decontaminate_4gram",
    "c6_sequence_packing",
    "g6_pagerank",
    "d6_dedup_components",
    "d5_dedup_embedding",
    "l3_partition_pruned_scan",
    "l4_zorder_range_scan",
    "e5_funnel_conversion",
    "sql5_lateral_topn",
    "sql6_materialized_cte",
    "asof2_tolerance",
    # r6 rotation (VERDICT r5 task #7): the queries whose driver greens
    # were oldest entering round 6 — their plans are now snapshotted so
    # plan drift on old queries is as visible as correctness drift
    "a6_multi_column_distinct",
    "d1_dedup_exact",
    "d3_dedup_simhash",
    "d4_ngram_jaccard_blocked",
    "g5_grouped_zscore",
    "j12_semi_join",
    "ml1_kmeans_cluster_sizes",
    "n1_explode_wordcount",
    "n2_json_extract",
    "q6_quality_filter",
    "q9_case_scalar_buckets",
    "set_nfold_union_multiplicity",
    "sim3_ivf_ann",
    "sim4_ivf_kmeans_ann",
    "sql1_correlated_scalar",
    "sql2_exists_not_exists",
    "sql3_scalar_in_case",
    "sql4_intersect_pattern",
    "sub3_in_subquery_agg",
    "t5_tfidf_top_term",
    "w3_window_max",
    "w4_avg_over_agg",
    # r6 TPC-H pattern completion (tpch2.py) — the structurally novel
    # plans: EXISTS+NOT EXISTS on one fact (q21), filtered outer + double
    # agg (q13), 8-way share join (q8), cross-table-interval semi (q4)
    "q4_order_priority",
    "q8_market_share",
    "q13_order_count_distribution",
    "q21_waiting_supplier",
    # r6 PQ ANN: codes projection + ADC broadcast join + re-rank
    "sim5_pq_adc_ann",
    # r6 pipeline additions: the two shuffle-bearing ones (c8/t7 are
    # single-Generate scans, nothing to review)
    "d7_segment_dedup",
    "fz1_fuzzy_join_levenshtein",
    # r6 time-series: per-series LOCF window, day-partitioned sweep,
    # shared-exchange OHLC windows, single-shuffle TWA
    "ts1_gapfill_locf",
    "ts2_interval_concurrency",
    "ts3_ohlc_bars",
    "ts4_time_weighted_avg",
    # r7 additions: LSH-bucket self-join kNN graph, gaps-and-islands SCD2
    # windows, per-stratum priority-sampling top-k, recursive-CTE BFS
    "sim6_knn_graph",
    "cdc1_scd2_compress",
    "c9_priority_sample",
    "sql7_recursive_cte",
    # r8 rotation: the remaining r4-green queries not yet snapshotted
    # (l3/l4/g6/d6/d5/sql5 already appear above), plus the round's new
    # serving-probe query
    "c7_fuzzy_decontaminate",
    "m3_byte_histogram",
    "sim4_recall_vs_exact",
    "sim7_ann_serve",
    # r9: the at-rest serving probe — the plan must show the sig_part
    # partition filter reaching the parquet scan (PartitionFilters)
    "sim8_ann_serve_at_rest",
    # r9 pipeline additions: the narrow-explode epoch up-sampler
    # (Generate below every Exchange) and the grouped two-pass cumsum
    # budget selection (rangepartitioning, no SinglePartition);
    # d8_duplicated_spans snapshots via HEADLINE
    "c11_epoch_upsample",
    "c12_token_budget_select",
    # the excision half of d8: digest window + covered-word explode +
    # per-doc anti-join/reassembly
    "d9_span_excise",
    # the composed mix assembler: both cumsum stages' exchanges and the
    # explode between them in ONE plan
    "c13_e2e_mix",
    # r10: the ExactSubstr cut composed between exact dedup and the
    # split — the plan must show the deduped-corpus checkpoint (Scan
    # ExistingRDD) with the cov-set delivery as a broadcast hash join
    "c14_dedup_excise_split",
    # r11: the leakage-safe split's token join (skinny (doc_id, tok)
    # projection, no text column past the scan) and the Gopher
    # repetition cut — the plan must show the in-row fold BELOW the md5
    # dedup exchange with zero Generate and zero joins
    "c15_leakage_safe_split",
    "c16_repetition_cut_split",
    # r11: the incremental probe — every join must broadcast the
    # batch-derived side (zero SortMergeJoin; the index relations never
    # shuffle on batch keys)
    "d10_incremental_lsh_probe",
    # r12: the grown-index probe (d11) — same broadcast-probe plan
    # family as d10 over the unioned (corpus + accepted novels) index
    "d11_grown_index_probe",
]


def digest(plan: str) -> str:
    """One-line plan summary for the index: join strategies, codegen
    spans, exchanges, scan-pushdown evidence — the things a plan review
    checks first."""
    spans = len(set(re.findall(r"\*\(\d+\)", plan)))
    parts = [f"{spans} codegen span{'s' if spans != 1 else ''}"]
    for op, label in (
        ("BroadcastHashJoin", "BHJ"),
        ("SortMergeJoin", "SMJ"),
        ("ShuffledHashJoin", "SHJ"),
        ("BroadcastNestedLoopJoin", "BNLJ"),
        ("CartesianProduct", "CARTESIAN!"),
    ):
        n = len(re.findall(rf"\b{op}\b", plan))
        if n:
            parts.append(f"{label} x{n}")
    if re.search(r"PushedFilters: \[[^\]]", plan):
        parts.append("pushed filters")
    if "InMemoryTableScan" in plan or "Scan ExistingRDD" in plan:
        parts.append("reused/materialized subtree")
    if "AQEShuffleRead" in plan:
        parts.append("AQE coalesce")
    return ", ".join(parts)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("plan-snapshot")
    spark.sparkContext.setLogLevel("ERROR")

    sections: list[tuple[str, str]] = []
    # dict.fromkeys: a query in both lists (d8 joined HEADLINE after its
    # EXTRA entry landed) must snapshot once, not produce two identical
    # sections with colliding index anchors
    for name in dict.fromkeys(HEADLINE + EXTRA):
        df = QUERIES[name](spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        sections.append((name, plan.rstrip()))

    # forced scale-path plans (at bench scale the auto chooser picks the
    # naive/diagonal paths; these are the >broadcast-threshold strategies)
    from spark_sql_perf_spark.operators.graph import (
        edge_table,
        square_count_df,
        triangle_count_df,
    )

    for title, df in (
        (
            "g3_triangle_count (forced degree_ordered=True)",
            triangle_count_df(edge_table(spark, sf_dir), degree_ordered=True),
        ),
        (
            "g4_square_count (forced cn_ordered=True)",
            square_count_df(edge_table(spark, sf_dir), cn_ordered=True),
        ),
    ):
        df.collect()
        sections.append((title, df._jdf.queryExecution().executedPlan().toString().rstrip()))

    header = [
        "# PLANS — finalized physical plans for the headline queries",
        "",
        f"Scale: `{sf_dir}`. Plans captured AFTER execution (AQE final plans;",
        "`*(n)` prefixes are whole-stage-codegen spans).",
        "",
        "## Index",
        "",
        "| query | line | plan digest |",
        "|---|---|---|",
    ]
    # index rows + blank line precede the body; compute anchors exactly
    index_len = len(header) + len(sections) + 1
    body: list[str] = []
    rows: list[str] = []
    body_lines = 0
    for name, plan in sections:
        anchor = index_len + body_lines + 1  # 1-based line of the `## name` heading
        rows.append(f"| {name} | L{anchor} | {digest(plan)} |")
        body += [f"## {name}", "", "```", plan, "```", ""]
        body_lines += 5 + plan.count("\n") + 1
    out = header + rows + [""] + body
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md with {len(sections)} plans")
    spark.stop()


if __name__ == "__main__":
    main()
