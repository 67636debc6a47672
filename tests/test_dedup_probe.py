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
