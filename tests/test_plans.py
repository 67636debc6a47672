"""Physical-plan quality gates (the 100-TB design checks).

Each assertion encodes a property that matters at scale:
- filters reach the parquet scan (PushedFilters) — I/O scales with
  selectivity, not table size
- column pruning (ReadSchema lists only needed columns)
- small dims broadcast (no shuffle of the fact table for dim joins)
- orderBy+limit compiles to TakeOrderedAndProject (no global sort)
- aggregations are partial (map-side combine before the shuffle)
- hot paths stay inside WholeStageCodegen
"""

from __future__ import annotations

from tests.conftest import SF_DIR_TINY


def _plan(df, execute: bool = False) -> str:
    if execute:
        # AQE shows WholeStageCodegen spans only in the finalized plan, and
        # only on THIS DataFrame's own QueryExecution (a write would spawn
        # a separate command QE)
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _q(spark, name):
    from spark_sql_perf_spark.operators import QUERIES

    return QUERIES[name](spark, SF_DIR_TINY)


def test_flagship_pushdown_and_broadcast(spark):
    plan = _plan(_q(spark, "flagship_star_agg"), execute=True)
    # the date predicate reaches the orders scan (DataFilters on the FileScan)
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l]
    assert any("o_orderdate" in l and "DataFilters" in l for l in scan_lines), plan
    assert "BroadcastHashJoin" in plan  # part dim broadcast
    assert "HashAggregate" in plan
    # whole-stage codegen spans show as "*(n)" operator prefixes
    assert "*(" in plan and "isFinalPlan=true" in plan


def test_q6_full_pushdown(spark):
    plan = _plan(_q(spark, "q6_forecast_revenue"))
    scan = next(l for l in plan.splitlines() if "FileScan" in l and "lineitem" in l or "l_shipdate" in l)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in scan, scan


def test_column_pruning(spark):
    plan = _plan(_q(spark, "a1_grouped_avg"))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_returnflag" in read_schema and "l_extendedprice" in read_schema
    assert "l_comment" not in read_schema and "l_shipdate" not in read_schema


def test_orderby_limit_is_topk(spark):
    plan = _plan(_q(spark, "s1_orderby_limit"))
    assert "TakeOrderedAndProject" in plan  # per-partition heap, no global sort


def test_partial_aggregation(spark):
    plan = _plan(_q(spark, "a2_low_cardinality_group"))
    # two HashAggregates around the exchange = map-side partial agg
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_semi_anti_join_operators(spark):
    assert "LeftSemi" in _plan(_q(spark, "j12_semi_join"))
    assert "LeftAnti" in _plan(_q(spark, "j12_anti_join"))


def test_broadcast_hint_respected(spark):
    plan = _plan(_q(spark, "j9_broadcast_star"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_exact_decimal_aggs_stay_jvm(spark):
    # no Python UDF in the hot path of the headline aggregation
    plan = _plan(_q(spark, "q1_pricing_summary"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_split_with_clauses_parses_whole_corpus():
    """The CTE lifter's paren-balance parser handles every query text in
    the TPC-DS corpus: parsed names match a regex scan of the WITH
    prologue, bodies are non-empty and balanced, and the remainder is a
    SELECT."""
    import re

    from spark_sql_perf_spark.operators.tpcds14_suite import (
        TPCDS14_QUERIES,
        TPCDS14_SHARED_CTES,
    )
    from spark_sql_perf_spark.plans.cte import split_with_clauses

    for name, sql in TPCDS14_QUERIES.items():
        ctes, body = split_with_clauses(sql)
        has_with = re.match(r"\s*with\s", sql, re.I) is not None
        assert bool(ctes) == has_with, name
        for cte_name, cte_body in ctes:
            assert cte_body.strip(), (name, cte_name)
            assert cte_body.count("(") == cte_body.count(")"), (name, cte_name)
        assert re.match(r"\s*\(?\s*select\s", body, re.I), (name, body[:80])
        for shared in TPCDS14_SHARED_CTES.get(name, ()):
            assert shared in {n for n, _ in ctes}, (name, shared)


def test_runtime_bloom_filter_join_pruning(spark):
    """Runtime filtering (Spark's bloom-filter join, the stock-Spark
    answer to semi-join reduction): a selective dim-side predicate is
    turned into a bloom filter applied to the fact side BEFORE the join
    shuffle, so at cluster scale the shuffle carries only probable
    matches. Thresholds are lowered because local test data is tiny; at
    real scale the defaults (10MB creation side / 10GB application side)
    fire on their own."""
    from pyspark.sql import functions as F

    from spark_sql_perf_spark.catalog import table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = table(spark, SF_DIR_TINY, "lineitem")
        orders = table(spark, SF_DIR_TINY, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        df = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_returnflag")
            .count()
        )
        plan = _plan(df)
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
        # semantics unchanged vs the unfiltered plan
        n = df.count()
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
        li2 = table(spark, SF_DIR_TINY, "lineitem")
        o2 = table(spark, SF_DIR_TINY, "orders").filter(F.col("o_totalprice") > 400000)
        assert (
            li2.join(o2, li2.l_orderkey == o2.o_orderkey).groupBy("l_returnflag").count().count()
            == n
        )
    finally:
        for k, v in saved.items():
            try:
                if v is not None:
                    spark.conf.set(k, v)
                else:
                    spark.conf.unset(k)
            except Exception:
                pass


def test_plans_md_index_is_valid():
    """PLANS.md (tools/snapshot_plans.py output) stays internally
    consistent: every index row's line anchor lands exactly on its
    query's `## name` heading, no digest reports a CartesianProduct,
    and every snapshot set member has an index row — so the plan
    evidence trail can be trusted without re-running the tool."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md")) as f:
        lines = f.read().splitlines()
    rows = [
        m.groups()
        for line in lines
        if (m := re.match(r"\| (\S[^|]*?) \| L(\d+) \| (.*) \|$", line))
    ]
    assert len(rows) >= 50  # headline + extras + forced scale paths
    for name, anchor, dig in rows:
        target = lines[int(anchor) - 1]
        assert target == f"## {name}", (name, anchor, target)
        assert "CARTESIAN" not in dig, (name, dig)

    import sys

    sys.path.insert(0, os.path.join(repo, "tools"))
    from snapshot_plans import EXTRA

    from bench import HEADLINE

    indexed = {name for name, _, _ in rows}
    missing = (set(HEADLINE) | set(EXTRA)) - indexed
    assert not missing, missing
