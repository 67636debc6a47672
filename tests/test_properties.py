"""Property-based tests (hypothesis) for the pure-Python planning and
harness logic — no SparkSession in the loop, so hundreds of examples run
in milliseconds."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.lists(st.integers(0, 5), min_size=1, max_size=4, unique=True),
        max_size=4,
    )
)
def test_expand_params_is_cartesian(grid):
    from spark_sql_perf_spark.ml.benchmarks import expand_params

    out = expand_params(grid)
    expected = 1
    for v in grid.values():
        expected *= len(v)
    assert len(out) == expected
    assert all(set(d) == set(grid) for d in out)
    # each combo is unique
    assert len({tuple(sorted(d.items())) for d in out}) == len(out)


@settings(deadline=None)
@given(st.integers(1, 10).flatmap(lambda n: st.lists(st.integers(1, 5), min_size=n, max_size=n)))
def test_variation_cartesian_product_size(option_counts):
    from spark_sql_perf_spark.query import Variation, cartesian

    vs = [
        Variation(name=f"v{i}", options=list(range(c)), setup=lambda s, o: None)
        for i, c in enumerate(option_counts)
    ]
    combos = cartesian(vs)
    expected = 1
    for c in option_counts:
        expected *= c
    assert len(combos) == expected


@settings(deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 10_000_000), st.integers(1, 100_000)),
        min_size=2,
        max_size=6,
    )
)
def test_plan_joins_connects_every_relation(rel_specs):
    """The greedy planner always produces a plan covering every relation
    reachable through the edge set, with monotone join steps."""
    from spark_sql_perf_spark.plans.multijoin import JoinEdge, RelStats, plan_joins

    names = [f"r{i}" for i in range(len(rel_specs))]
    stats = {
        n: RelStats(n, rows, {"k": max(1, min(rows, ndv))})
        for n, (rows, ndv) in zip(names, rel_specs)
    }
    # chain topology r0-r1-...-rn
    edges = [JoinEdge(names[i], names[i + 1], "k", "k") for i in range(len(names) - 1)]
    plan = plan_joins(stats, edges)
    assert set(plan.order) == set(names)
    assert len(plan.steps) == len(names) - 1
    assert plan.order[0] == min(stats.values(), key=lambda s: s.rows).name
    for step in plan.steps:
        assert step.est_rows >= 1


@settings(deadline=None)
@given(st.integers(1, 1_000_000), st.integers(1, 1_000), st.integers(1, 1_000_000), st.integers(1, 1_000))
def test_estimate_join_bounds(l_rows, l_ndv, r_rows, r_ndv):
    """Estimate never exceeds the cross product and never goes below 1."""
    from spark_sql_perf_spark.plans.multijoin import RelStats, estimate_join

    right = RelStats("r", r_rows, {"k": min(r_ndv, r_rows)})
    est = estimate_join(l_rows, min(l_ndv, l_rows), right, "k")
    assert 1 <= est <= l_rows * r_rows
