"""Capture-proofing for the per-round bench artifact (r9, after
BENCH_r08.json lost its raw ``queries`` block to the driver's ~2 KB
stdout-tail window): the compact core line bench.py prints LAST must
stay comfortably inside that window for the full headline set, and the
round inference for the DETAIL side file must track the committed
history. Pure artifact-shape checks — no Spark session."""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

# The driver's stdout-tail capture observed on BENCH_r08.json (~2 KB);
# the core line must fit with slack for a trailing newline and any
# stray log line the tail also swallows.
TAIL_WINDOW = 2048
CORE_BUDGET = 1400


def test_core_line_fits_tail_window():
    # worst-case widths: every headline query at a 4-digit-seconds time
    core = {
        "metric": "headline_queries_total",
        "value": 99999.999,
        "unit": "sec",
        "queries": {q: 9999.999 for q in bench.HEADLINE},
        "thermo": {q: 9999.999 for q in bench.THERMOMETERS},
        "sf": 0.1,
        "detail": "BENCH_DETAIL_r99.json",
        "median_shift": 1.094,
        "value_normalized": 99999.999,
    }
    line = json.dumps(core)
    assert len(line) <= CORE_BUDGET < TAIL_WINDOW, (
        f"core line is {len(line)} bytes — trim HEADLINE or the core keys"
        " before it outgrows the driver's tail capture again"
    )


def test_detail_round_is_latest_committed_plus_one():
    files = bench._committed_bench_files()
    assert files, "committed BENCH_r*.json history expected"
    latest = max(
        int(re.search(r"_r(\d+)", os.path.basename(p)).group(1)) for p in files
    )
    assert bench._this_round() == latest + 1


def test_previous_times_skip_truncated_artifacts():
    """The normalization baseline must come out of the committed history
    as raw per-query seconds even when the NEWEST artifact is truncated
    (BENCH_r08.json's tail begins mid-JSON — the r8 capture accident):
    the loader walks newest-first to the first file that parses."""
    prev = bench.load_previous_times()
    assert prev is not None, "no committed artifact yielded per-query times"
    name, times = prev
    assert times, f"no per-query times recovered from {name}"
    assert all(isinstance(v, (int, float)) and v > 0 for v in times.values())
    # most headline queries should overlap the recovered baseline
    assert len(set(times) & set(bench.HEADLINE)) >= 10


def test_shape_medians_exclude_current_round_impl_changed(monkeypatch):
    """r10 ADVICE: a calibration query flagged _IMPL_CHANGED for the
    measured round must not feed its shape median — its ratio measures
    the plan change, not box drift. With d8 excluded and only one other
    explode ratio shared, the class falls back to the global median
    instead of resting on d8's (here deliberately absurd) 10x ratio."""
    shared = {
        q: 1.0
        for q in bench.CAL_SHAPES["scan_join_agg"]
        + ["w2_running_total", "e3_session_window", "thermo_window_sort"]
    }
    prev_times = dict(shared, d8_duplicated_spans=1.0, thermo_explode_hash=1.0)
    times = dict(shared, d8_duplicated_spans=10.0)
    thermo = {"thermo_explode_hash": 1.0}

    monkeypatch.setattr(bench, "_current_impl_changed", lambda: set())
    n = bench.normalize_vs_previous(times, ("BENCH_r99.json", prev_times), thermo)
    # not excluded: the 2-element explode median is dragged to 5.5
    assert n["calibration"]["shape_medians"]["explode_shuffle"] == 5.5
    assert n["calibration"]["shape_basis"]["explode_shuffle"] == "2_shared"

    monkeypatch.setattr(
        bench, "_current_impl_changed", lambda: {"d8_duplicated_spans"}
    )
    n = bench.normalize_vs_previous(times, ("BENCH_r99.json", prev_times), thermo)
    # excluded: one ratio left -> fallback to the (undragged) global
    assert n["calibration"]["shape_basis"]["explode_shuffle"] == "fallback_global"
    assert n["calibration"]["shape_medians"]["explode_shuffle"] == 1.0
    # the excluded ratio stays auditable
    assert n["calibration"]["ratios"]["d8_duplicated_spans"] == 10.0
