#!/usr/bin/env python
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (mirrors the reference dashboard's discipline,
performance.dashboard.scala:26-28 — median of 4 iterations dropping 1
warmup): one untimed flagship warmup for JVM JIT, then each headline query
executed five times with the MIN reported (first run pays that query's own
codegen compilation; the min is the steady-state number a repeated
workload sees, and min-of-5 cuts the ±15% run-to-run scheduler noise a
min-of-3 still carries on this box). Consumption is the noop sink — full execution, no
driver-side transfer (the ExecutionMode.ForeachResults analog).

Cross-round comparability caveat (root cause of the r3 `w2_running_total`
"regression"): absolute numbers swing ±30% between rounds with ZERO code
changes — r4 runs on an otherwise-idle box measured flagship_star_agg at
1.24-1.25 s vs r3's 0.877 s and q1 at 1.64-1.72 s vs 1.253 s, with the
same plans and git-identical query code. The box (VM) is simply slower
some rounds. Per-query regressions are only meaningful relative to the
same round's other queries; w2's r3 uptick (+24%) matched the box-wide
drift, not a plan change.

As of round 5 that relative discipline is computed, not just prescribed:
the output carries a ``normalized`` block — every per-query time divided
by the MEDIAN per-query shift against the latest committed BENCH_r*.json
— so a future reader compares ``value_normalized`` across rounds and a
genuine plan regression shows up as a query whose normalized ratio
stands off the 1.0 line while box drift cancels out. (Measured in this
round's session: back-to-back runs of identical code printed raw totals
18.3 s then 11.1 s — cold page cache after a 20-minute pytest churn —
while the normalized totals told the true story, 9.92 s vs r4's 9.98 s.)

Round 6 adds the variance receipt: any query whose normalized ratio vs
the previous round shifts >20% is re-sampled three more times and its
raw sample list is emitted under ``variance`` — residual sub-second box
noise now ships with its own evidence instead of reading as a plan
regression (the r5 sim1/e3 false alarms).

Round 8 fixes the calibration itself (the r7 artifact's root cause): the
box-drift median was computed over ALL shared headline queries, so
queries indirectly accelerated by shared infrastructure (the r7
graph-edge memo sped g4 −18% raw, d2/c1 −29%/−20% raw with zero direct
code change) dragged the median to 0.871 and manufactured phantom
+13-16% "normalized regressions" on raw-flat queries (flagship, q1, q5,
e3 — two rounds running for e3). The median is now pinned to
``CALIBRATION``: the TPC-H-shaped scan/join/agg/window queries whose
plans share NO cross-query memoized state (no graph-edge memo, no LSH
checkpoint reuse) and that rebuild their inputs from the parquet scan
every iteration — the closest thing the headline set has to pure
box-drift thermometers. Every shared query's raw ratio is emitted under
``calibration.ratios`` so a dragged median is auditable instead of
silent, and the variance-receipt threshold drops 20% -> 10% so ANY
normalized shift a reader would flag ships with its own re-sampled
evidence. ``notes`` carries measurement-basis caveats that are true by
construction (the graph memo one below).

Round 9 splits the output so the artifact can never be truncated again
(BENCH_r08.json lost its raw ``queries`` block when the enriched payload
outgrew the driver's ~2 KB stdout-tail capture): stdout now ENDS with a
compact core line (metric/value/queries/median_shift, <1 KB — asserted
in tests/test_bench_artifact.py) and the full receipt (calibration
ratios, variance samples, notes) is written to a committed
``BENCH_DETAIL_r{N}.json`` side file the core line names.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_sql_perf_spark.operators import QUERIES  # noqa: E402
from spark_sql_perf_spark.session import build_session  # noqa: E402

# Representative spread: scan-agg, star joins, fact-fact join, rollup,
# windows, graph multi-join, dedup, ANN, sessionization.
HEADLINE = [
    "flagship_star_agg",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "j2_compound_key",
    "j4_chain_join",
    "a8_rollup_grouping",
    "w2_running_total",
    "g3_triangle_count",
    "d2_dedup_minhash_lsh",
    "sim1_cosine_topk",
    "e3_session_window",
    # r6: the two heaviest r4/r5 additions, previously invisible to
    # round-over-round tracking (VERDICT r5 task #4)
    "g4_square_count",
    "c1_decontaminate_4gram",
    # r7: the adaptive-LSH kNN-graph self-join and the gaps-and-islands
    # SCD2 window chain — the round's two new heavy shapes
    "sim6_knn_graph",
    "cdc1_scd2_compress",
    # r9: the duplicated-span extraction — shingle explode + digest
    # winner agg + doc-partitioned islands, the round's new heavy shape
    "d8_duplicated_spans",
]

# Box-drift thermometers: headline queries whose plans read the parquet
# tables directly every iteration and touch NO cross-query memoized state
# (graph.py's persisted edge relation, similarity's localCheckpointed
# signed relation / dim memo). Only these feed the normalization median;
# everything else is normalized BY it but cannot drag it. Excluded and
# why: g3/g4 (memoized edge relation — min-of-N measures warm cache),
# d2/sim1/sim6/c1 (shared pipeline infrastructure that rounds routinely
# touch indirectly), cdc1 (r7-new, one round of history).
CALIBRATION = [
    "flagship_star_agg",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "j2_compound_key",
    "j4_chain_join",
    "a8_rollup_grouping",
    "w2_running_total",
    "e3_session_window",
]

# Measurement-basis facts a cross-round reader needs (shipped in the
# output so the caveat lives WITH the numbers, not in a round's memo):
NOTES = [
    "g1-g6 (incl. headline g3/g4) share a per-corpus memoized persisted"
    " edge relation since r7 (operators/graph.py): min-of-N times measure"
    " the warm-cache steady state, so graph-query comparisons against"
    " pre-r7 rounds conflate caching with operator changes.",
    "normalization median is computed over CALIBRATION only (see"
    " docstring); per-query ratios for ALL shared queries are under"
    " calibration.ratios.",
    "q1_pricing_summary is the most scan-bandwidth-bound headline query"
    " and its min-of-N wobbles hardest when the page cache is cold"
    " relative to the join-shaped calibration peers (r9: +17% normalized"
    " on a 26% internal sample spread, with the executed plan"
    " byte-identical to the r8 PLANS.md snapshot and zero source"
    " changes) — read its normalized shifts against its variance"
    " samples before calling a regression.",
]

# Variance-receipt threshold: any query whose normalized ratio vs the
# previous round shifts more than this is re-sampled (+3) and ships its
# raw sample list. 0.10 since r8 — the bar a reader would flag anyway.
SHIFT_RECEIPT = 0.10


def consume(df) -> None:
    """Execute fully without collecting (noop datasource sink)."""
    df.write.format("noop").mode("overwrite").save()


def _this_round() -> int:
    """Round number for the DETAIL side file: latest committed
    BENCH_r*.json + 1 (the driver names the current round's artifact the
    same way) — computed from the file LIST, not from the normalization
    baseline, which deliberately skips past truncated artifacts. Falls
    back to 0 (-> BENCH_DETAIL_r0.json, clearly out-of-band) when no
    history exists."""
    import re

    rounds = [
        int(m.group(1))
        for p in _committed_bench_files()
        if (m := re.search(r"_r(\d+)", os.path.basename(p)))
    ]
    return (max(rounds) + 1) if rounds else 0


def _committed_bench_files() -> list[str]:
    """Committed BENCH_r*.json paths, round order. Committed files only:
    the driver writes the CURRENT round's BENCH_r{N}.json into the repo
    before committing it, so a bare glob would let a same-round re-run
    normalize against its own round (median ~1.0) and silently drop the
    cross-round baseline. git ls-files sees only prior rounds until the
    round-end commit lands."""
    import glob

    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        import subprocess

        names = subprocess.run(
            ["git", "-C", repo, "ls-files", "BENCH_r*.json"],
            capture_output=True, text=True, timeout=10, check=True,
        ).stdout.split()
        return sorted(os.path.join(repo, n) for n in names)
    except Exception:
        return sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")))


def load_previous_times() -> tuple[str, dict[str, float]] | None:
    """(basename, per-query times) of the newest committed BENCH_r*.json
    that actually carries per-query times (see the skip note below)."""
    prev_files = _committed_bench_files()
    # Newest-first, skipping past artifacts that yield no per-query
    # times (BENCH_r08.json is committed but truncated — its tail begins
    # mid-JSON — and without the skip the whole normalization chain
    # would silently die the round after any such capture accident).
    for path in reversed(prev_files):
        try:
            with open(path) as f:
                doc = json.load(f)
            if "queries" not in doc and isinstance(doc.get("parsed"), dict):
                # driver-recorded shape with the core line pre-parsed
                doc = doc["parsed"]
            if "queries" not in doc and "tail" in doc:
                # driver-recorded shape: our JSON line is embedded in the
                # captured stdout tail
                for line in doc["tail"].splitlines():
                    if line.startswith("{") and '"queries"' in line:
                        doc = json.loads(line)
                        break
            prev = doc.get("queries") or {}
        except Exception:
            continue
        if prev:
            return os.path.basename(path), prev
    return None


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def normalize_vs_previous(
    times: dict[str, float], previous: tuple[str, dict[str, float]] | None
) -> dict | None:
    """Box-drift normalization: divide this run by the median per-query
    shift against the latest committed BENCH_r*.json. The ±30% cross-
    round VM drift (docstring above) shows up as a near-uniform shift
    across queries, so the median ratio estimates the box factor and
    ``total_normalized`` is the plan-quality signal: a single query
    regressing stands out against the normalized baseline instead of
    being buried in (or mistaken for) box noise.

    The median is taken over the CALIBRATION subset only (queries with no
    cross-query memoized state — see module docstring); if fewer than 5
    calibration queries overlap the previous round's file, it falls back
    to the all-query median (flagged in the output). ``ratios`` carries
    every shared query's raw ratio so the calibration itself is auditable.
    """
    if previous is None:
        return None
    vs, prev = previous
    ratios = {
        q: times[q] / prev[q] for q in times if q in prev and prev[q] > 0
    }
    if not ratios:
        return None
    cal = [r for q, r in ratios.items() if q in CALIBRATION]
    basis = "calibration" if len(cal) >= 5 else "all_shared"
    med = _median(cal if basis == "calibration" else list(ratios.values()))
    return {
        "vs": vs,
        "median_shift": round(med, 3),
        "value_normalized": round(sum(times.values()) / med, 3),
        "queries_normalized": {q: round(t / med, 3) for q, t in times.items()},
        "calibration": {
            "basis": basis,
            "queries": [q for q in CALIBRATION if q in ratios],
            "ratios": {q: round(r, 3) for q, r in sorted(ratios.items())},
        },
    }


def main() -> None:
    t_start = time.perf_counter()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = build_session(app_name="spark-sql-perf-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    consume(QUERIES["flagship_star_agg"](spark, sf_dir))  # warmup (JIT/codegen)

    def sample(name: str, n: int) -> list[float]:
        out = []
        for _ in range(n):
            t0 = time.perf_counter()
            consume(QUERIES[name](spark, sf_dir))
            out.append(round(time.perf_counter() - t0, 3))
        return out

    samples: dict[str, list[float]] = {name: sample(name, 5) for name in HEADLINE}
    times = {name: min(s) for name, s in samples.items()}

    # Variance receipt (r5 lesson: sim1 +35% / e3 +12% normalized on
    # UNTOUCHED sub-second queries — box noise, but nothing in the
    # artifact proved it). Any query whose box-drift-removed ratio vs the
    # previous round stands >SHIFT_RECEIPT off the 1.0 line gets three
    # MORE samples; the min over all eight plus the raw sample list land
    # in the output so a shift either self-corrects or ships with the
    # evidence that it is real.
    previous = load_previous_times()
    normalized = normalize_vs_previous(times, previous)
    variance: dict[str, dict] = {}
    if normalized is not None:
        _, prev = previous
        shifted = [
            q for q, t_norm in normalized["queries_normalized"].items()
            if q in prev and prev[q] > 0
            and abs(t_norm / prev[q] - 1.0) > SHIFT_RECEIPT
        ]
        for q in shifted:
            samples[q].extend(sample(q, 3))
            times[q] = min(samples[q])
            variance[q] = {"samples": samples[q]}
        if variance:
            # recompute against the refreshed minima
            normalized = normalize_vs_previous(times, previous)
    times = {q: round(t, 3) for q, t in times.items()}

    total = round(sum(times.values()), 3)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "notes": NOTES,
    }
    if normalized is not None:
        payload["normalized"] = normalized
        if variance:
            for q, v in variance.items():
                v["normalized_after"] = normalized["queries_normalized"].get(q)
            payload["variance"] = variance
    # Bench wall-clock self-report: 17 queries x min-of-5 plus receipt
    # re-samples. The re-sample tier only triggers on shifted queries, so
    # the bound is ~(17*5 + shifted*3) executions; if every query shifted
    # (a box-wide event the calibration median would absorb first), the
    # run grows ~60% — acceptable, and now visible.
    payload["bench_runtime_sec"] = round(time.perf_counter() - t_start, 1)

    # Capture-proofing (r8 lesson: the enriched payload outgrew the
    # driver's ~2 KB stdout-tail window, so BENCH_r08.json's tail begins
    # MID-JSON and the raw per-query seconds were lost from the committed
    # artifact). Split the output: the FULL receipt (calibration ratios,
    # variance samples, notes) goes to a committed side file, and stdout
    # ends with a compact core line — metric/value/queries/median_shift,
    # well under 1 KB — so the tail capture always holds a complete,
    # parseable JSON line with the raw numbers.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"BENCH_DETAIL_r{_this_round()}.json",
    )
    with open(detail_path, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    core = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "queries": payload["queries"],
        "sf": payload["sf"],
        "detail": os.path.basename(detail_path),
    }
    if normalized is not None:
        core["median_shift"] = normalized["median_shift"]
        core["value_normalized"] = normalized["value_normalized"]
    print(json.dumps(core))
    spark.stop()


if __name__ == "__main__":
    main()
