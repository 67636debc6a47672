#!/usr/bin/env python
"""Write PLANS.md: finalized physical plans for the headline queries at
the bench scale factor — the plan-quality evidence trail (pushed filters,
broadcast choices, codegen spans, AQE decisions)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from spark_sql_perf_spark.operators import QUERIES  # noqa: E402
from spark_sql_perf_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("plan-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — finalized physical plans for the headline queries",
        "",
        f"Scale: `{sf_dir}`. Plans captured AFTER execution (AQE final plans;",
        "`*(n)` prefixes are whole-stage-codegen spans).",
        "",
    ]
    extra = [
        "asof1_last_click_before_purchase",
        "mj1_stats_planned_join",
        "g4_square_count",
        "c1_decontaminate_4gram",
        "c6_sequence_packing",
        "g6_pagerank",
        "d6_dedup_components",
        "l3_partition_pruned_scan",
        "l4_zorder_range_scan",
        "e5_funnel_conversion",
        "sql5_lateral_topn",
        "asof2_tolerance",
    ]
    for name in HEADLINE + extra:
        df = QUERIES[name](spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        out += [f"## {name}", "", "```", plan.rstrip(), "```", ""]
    # the forced degree-ordered triangle plan (the >broadcast-threshold
    # strategy; at bench scale the auto path picks the naive chain)
    from spark_sql_perf_spark.operators.graph import edge_table, triangle_count_df

    df = triangle_count_df(edge_table(spark, sf_dir), degree_ordered=True)
    df.collect()
    out += [
        "## g3_triangle_count (forced degree_ordered=True)",
        "",
        "```",
        df._jdf.queryExecution().executedPlan().toString().rstrip(),
        "```",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md with {len(HEADLINE) + len(extra) + 1} plans")
    spark.stop()


if __name__ == "__main__":
    main()
