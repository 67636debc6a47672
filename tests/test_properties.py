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


def _brute_canonical_squares(edges: set[tuple[int, int]]) -> int:
    """Directed 4-cycles s->t->u->v->s with s the id-minimum and t < v —
    exactly g4's oracle predicate (operators/graph.py _EDGES_SQL chain:
    a.src < b.src, c.src, d.src AND b.src < d.src)."""
    nodes = sorted({x for e in edges for x in e})
    n = 0
    for s in nodes:
        for t in nodes:
            if t <= s or (s, t) not in edges:
                continue
            for u in nodes:
                if u in (s, t) or u < s or (t, u) not in edges:
                    continue
                for v in nodes:
                    if v in (s, t, u) or v <= t:
                        continue
                    if (u, v) in edges and (v, s) in edges:
                        n += 1
    return n


def _windowed_squares(edges: set[tuple[int, int]]) -> int:
    """Pure-Python twin of operators/graph._square_count_cn — the SAME
    derivation (support pairs -> rank orientation -> CN wedges -> the
    two-running-sum case split), so the property test validates the
    MATH independently of Spark execution."""
    from collections import Counter, defaultdict

    pairs: dict[tuple[int, int], list[bool]] = {}
    for a, b in edges:
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        f = pairs.setdefault((lo, hi), [False, False])
        f[0 if a < b else 1] = True
    deg: Counter = Counter()
    for lo, hi in pairs:
        deg[lo] += 1
        deg[hi] += 1

    def rk(x: int) -> tuple[int, int]:
        return (-deg[x], x)

    half = []
    for (lo, hi), (fwd, rev) in pairs.items():
        half.append((lo, hi, fwd, rev))
        half.append((hi, lo, rev, fwd))
    by_u = defaultdict(list)
    for a, b, fab, fba in half:
        by_u[a].append((b, fab, fba))
    wedges = defaultdict(list)
    for v, u, f_vu, f_uv in half:
        if rk(v) < rk(u):
            for w, f_uw, f_wu in by_u[u]:
                if w != v and rk(v) < rk(w):
                    wedges[(v, w)].append((u, f_vu, f_uv, f_uw, f_wu))
    total = 0
    for (v, w), mids in wedges.items():
        e_lo = min(v, w)
        rows = []
        for u, f_vu, f_uv, f_uw, f_wu in mids:
            if v < w:
                f_lo_u, f_u_lo, f_hi_u, f_u_hi = f_vu, f_uv, f_wu, f_uw
            else:
                f_lo_u, f_u_lo, f_hi_u, f_u_hi = f_wu, f_uw, f_vu, f_uv
            rows.append((u, f_lo_u and f_u_hi, f_hi_u and f_u_lo))
        rows.sort()
        cum_a_gt = cum_b_lt = 0
        for u, a_flag, b_flag in rows:
            if b_flag:
                total += cum_a_gt
            if a_flag:
                total += cum_b_lt
            if a_flag and u > e_lo:
                cum_a_gt += 1
            if b_flag and u < e_lo:
                cum_b_lt += 1
    return total


@settings(deadline=None, max_examples=300)
@given(
    st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
        max_size=40,
    )
)
def test_windowed_square_count_matches_brute_force(edges):
    """The closed-form derivation (per-mid predicate factoring + id-order
    case split) counts exactly the canonical directed 4-cycles, on any
    digraph — including multi-hub, antiparallel-edge, and degenerate
    shapes hypothesis finds that the hand-built test graphs miss."""
    assert _windowed_squares(edges) == _brute_canonical_squares(edges)
