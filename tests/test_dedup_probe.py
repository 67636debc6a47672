"""d10 incremental-probe gates beyond oracle equivalence: the planted
batch semantics (near-dups match their source, reversed docs are novel)
and the 100-TB plan property — every probe join broadcasts the
batch-derived side, so the corpus index relations never sort-merge or
reshuffle on batch keys."""

from __future__ import annotations

from tests.conftest import SF_DIR_TINY


def _df(spark):
    from spark_sql_perf_spark.operators import QUERIES

    return QUERIES["d10_incremental_lsh_probe"](spark, SF_DIR_TINY)


def test_d10_probe_semantics(spark):
    rows = {r["batch_id"]: r for r in _df(spark).collect()}
    near = {b: r for b, r in rows.items() if b < 2_000_000}
    novel = {b: r for b, r in rows.items() if b >= 2_000_000}
    assert near and novel
    # every reversed doc is novel: same vocabulary, disjoint 3-shingle
    # set — the probe must not be fooled by unigram overlap
    assert all(r["is_novel"] for r in novel.values()), [
        r for r in novel.values() if not r["is_novel"]
    ]
    # suffix near-dups overwhelmingly match, and a match's best
    # candidate includes the true source (min id can only be <= it)
    matched = [r for r in near.values() if r["n_match"] > 0]
    assert len(matched) >= 0.9 * len(near), (len(matched), len(near))
    for r in matched:
        assert r["match_id_min"] <= r["batch_id"] - 1_000_000, r
        assert r["best_jaccard"] >= 0.6, r
        assert not r["is_novel"]
    # candidate counts stay near-dup-bounded, not corpus-bounded: the
    # banded buckets must not degenerate into scanning the index
    assert all(r["n_cand"] <= 5 for r in rows.values()), max(
        r["n_cand"] for r in rows.values()
    )


def test_d10_probe_plan_broadcasts_batch_side(spark):
    df = _df(spark)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final, final
    assert final.count("BroadcastHashJoin") >= 6, final
    assert "CartesianProduct" not in final, final


def _d11(spark):
    from spark_sql_perf_spark.operators import QUERIES

    return QUERIES["d11_grown_index_probe"](spark, SF_DIR_TINY)


def test_d11_grown_index_semantics(spark):
    """The grown relations must actually serve: every match of a
    near-dup-of-grown doc resolves to a grown id (>= 2e6 — the corpus
    alone cannot produce it), and fresh reversed docs stay novel
    against corpus and grown docs alike."""
    rows = {r["batch_id"]: r for r in _d11(spark).collect()}
    near = {b: r for b, r in rows.items() if b < 4_000_000}
    fresh = {b: r for b, r in rows.items() if b >= 4_000_000}
    assert near and fresh
    matched = [r for r in near.values() if r["n_match"] > 0]
    assert len(matched) >= 0.9 * len(near), (len(matched), len(near))
    for r in matched:
        assert r["match_id_min"] >= 2_000_000, r
        assert r["match_id_min"] <= r["batch_id"] - 1_000_000, r
    # fresh docs: novel barring natural near-dup pairs in the corpus
    novel = [r for r in fresh.values() if r["is_novel"]]
    assert len(novel) >= 0.9 * len(fresh), (len(novel), len(fresh))


def test_d11_plan_broadcasts_batch_side(spark):
    """Same 100-TB property as d10, over the UNIONED (grown) index:
    no sort-merge join, no cartesian product, batch side broadcast."""
    df = _d11(spark)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final, final
    assert final.count("BroadcastHashJoin") >= 6, final
    assert "CartesianProduct" not in final, final
