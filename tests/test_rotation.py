"""The driver-verification rotation invariant (see __spark_entry__'s
module docstring): with a ~50-row driver budget over ~150 registered
queries, oldest-green-first rotation keeps every query's latest green
round within ceil(n/budget) ~ 3 rounds of the newest committed round.
These tests run over the COMMITTED CORRECTNESS_r*.json artifacts, so a
_cost_order regression (cheapest-first starvation, a dropped rotation
key) fails here instead of surfacing as judge-visible staleness a round
later. No Spark session needed — pure artifact checks.
"""

from __future__ import annotations

import os
import re

import __spark_entry__ as entry

# The floor the docstring promises. Derivation: ~153 queries / ~50-row
# budget -> 4 rotating classes -> a green row is at most 3 rounds old
# once every query has been verified at least once (true since r7).
MAX_STALENESS = 3


def _latest_round() -> int:
    rounds = [
        int(re.search(r"_r(\d+)", os.path.basename(p)).group(1))
        for p in entry._correctness_files()
    ]
    return max(rounds)


def test_committed_greens_within_staleness_floor():
    greens = entry._green_rounds()
    assert greens, "no committed CORRECTNESS artifacts found"
    latest = _latest_round()
    stale = {n: r for n, r in greens.items() if r < latest - MAX_STALENESS}
    assert not stale, (
        f"queries whose latest green predates r{latest - MAX_STALENESS}: "
        f"{stale} — the _cost_order rotation is not clearing the backlog"
    )


def test_cost_order_rotates_oldest_green_first():
    """_cost_order's contract: never-verified (or impl-changed) queries
    first, then previously-green queries by ascending green round — the
    property that makes the staleness floor achievable at all."""
    from spark_sql_perf_spark.operators import QUERIES

    names = list(QUERIES)
    ordered = entry._cost_order(names)
    assert sorted(ordered) == sorted(names), "order must be a permutation"
    greens = entry._green_rounds()

    def klass(n: str) -> int:
        if n not in greens or greens[n] < entry._IMPL_CHANGED.get(n, 0):
            return 0
        return greens[n]

    klasses = [klass(n) for n in ordered]
    assert klasses == sorted(klasses), (
        "queries must sort never-verified first, then oldest green round "
        f"first; got class sequence {klasses}"
    )


def test_coverage_histogram_is_fresh():
    """COVERAGE.md's committed green-round histogram must match a clean
    regeneration at HEAD (the doc drifted one state behind the
    _IMPL_CHANGED flags in both r7 and r8 — generated before the flag
    edits landed). Same validate-the-committed-doc pattern as
    test_plans.py's PLANS.md index check."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    from green_histogram import BEGIN, END, render

    with open(os.path.join(repo, "COVERAGE.md")) as f:
        doc = f.read()
    assert BEGIN in doc and END in doc, "histogram block missing"
    committed = doc.split(BEGIN, 1)[1].split(END, 1)[0]
    fresh = render().split(BEGIN, 1)[1].split(END, 1)[0]
    assert committed == fresh, (
        "COVERAGE.md's green-round histogram is stale — rerun"
        " tools/green_histogram.py after editing _IMPL_CHANGED or"
        " committing a CORRECTNESS round"
    )


def test_every_registered_query_reaches_the_driver():
    """queries() must expose the full registry (a silent filter would
    permanently starve whatever it drops) and every oracle key must
    have a matching query."""
    from spark_sql_perf_spark.operators import ORACLES, QUERIES

    qs = entry.queries()
    assert set(qs) == set(QUERIES)
    assert set(entry.oracle_sql()) == set(ORACLES)
    assert set(ORACLES) <= set(QUERIES)
