"""Statistics-driven multi-join planner (the HyperCube fork's decision
layer, re-expressed — SURVEY.md §4 option 1).

Pipeline:
  1. `sample_stats`     — per-relation sampled row count + per-key
                          approx_count_distinct (the `sampleCardinality`
                          analog; one cheap job per relation).
  2. `estimate_join`    — classic |A||B| / max(ndv) equi-join estimate.
  3. `plan_joins`       — greedy smallest-intermediate-first join order
                          over the join graph (the strategy-choice analog
                          of `sketchTries` enumeration), with broadcast
                          hints where a side fits the threshold.
  4. `apply_plan`       — build the DataFrame with F.broadcast hints in
                          the chosen order; Catalyst/AQE still picks the
                          physical operators.

At 100 TB the wins are join-order (keeping intermediates small) and
broadcast decisions made from *observed* sampled stats instead of static
file sizes — exactly the gap AQE can't close for multiway chains, because
AQE only reorders what Catalyst already materialized stage-by-stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SAMPLE_ROWS = 1_000  # the reference's sampleCardinality default
DEFAULT_BROADCAST_ROWS = 1_000_000  # est. rows below which a side broadcasts


@dataclass
class RelStats:
    name: str
    rows: int
    ndv: dict[str, int]  # per join-key approx distinct counts

    def ndv_of(self, key: str) -> int:
        return max(1, self.ndv.get(key, self.rows))


@dataclass
class JoinEdge:
    left: str
    right: str
    left_key: str
    right_key: str


@dataclass
class JoinStep:
    """One planned binary join: (current intermediate) |><| relation."""

    relation: str
    left_key: str
    right_key: str
    broadcast: bool
    est_rows: int


@dataclass
class JoinPlan:
    order: list[str]
    steps: list[JoinStep] = field(default_factory=list)

    def describe(self) -> str:
        parts = [self.order[0]]
        for s in self.steps:
            hint = "broadcast" if s.broadcast else "shuffle"
            parts.append(f"{hint}({s.relation}) on {s.left_key}={s.right_key} ~{s.est_rows}")
        return " -> ".join(parts)


def _estimate_rows(df: DataFrame) -> int:
    """Row-count estimate without a full count job.

    For file-backed relations, sum exact row counts from the parquet
    footers (pure metadata — no Spark job, no data read; at 100 TB a
    per-relation `df.count()` before planning would dominate the query it
    plans). For filtered/derived relations this is an upper bound, which
    is the safe direction for a greedy smallest-first planner. Falls back
    to `count()` only when the plan has no file scan underneath.
    """
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        try:
            import pyarrow.parquet as pq

            total = 0
            for f in files:
                path = f[7:] if f.startswith("file://") else f
                total += pq.ParquetFile(path).metadata.num_rows
            return total
        except Exception:
            pass
    return df.count()


def sample_stats(
    relations: dict[str, DataFrame],
    join_keys: dict[str, list[str]],
    sample_rows: int = DEFAULT_SAMPLE_ROWS,
) -> dict[str, RelStats]:
    """Sampled per-relation stats: one count + one agg job per relation.

    The NDV estimate scales the sampled distinct count by the sampling
    ratio's distinct-preservation bound (min(ndv_sample / fraction, rows)),
    which is the right cheap estimator when keys are roughly uniform —
    the same regime the reference's sketches target.
    """
    out: dict[str, RelStats] = {}
    for name, df in relations.items():
        rows = _estimate_rows(df)
        keys = join_keys.get(name, [])
        if not keys or rows == 0:
            out[name] = RelStats(name, rows, {})
            continue
        fraction = min(1.0, sample_rows / max(rows, 1))
        sampled = df.sample(fraction=fraction, seed=100) if fraction < 1.0 else df
        aggs = [F.approx_count_distinct(k).alias(k) for k in keys]
        row = sampled.agg(*aggs).collect()[0]
        ndv = {}
        for k in keys:
            sampled_ndv = max(1, row[k])
            ndv[k] = min(rows, int(sampled_ndv / max(fraction, 1e-9)) if fraction < 1.0 else sampled_ndv)
        out[name] = RelStats(name, rows, ndv)
    return out


def estimate_join(
    left_rows: int, left_ndv: int, right: RelStats, right_key: str
) -> int:
    """|L |><| R| ~= |L| * |R| / max(ndv_L, ndv_R) (uniformity assumption)."""
    denom = max(left_ndv, right.ndv_of(right_key), 1)
    return max(1, (left_rows * right.rows) // denom)


def plan_joins(
    stats: dict[str, RelStats],
    edges: list[JoinEdge],
    broadcast_rows: int = DEFAULT_BROADCAST_ROWS,
) -> JoinPlan:
    """Greedy smallest-intermediate-first ordering over the join graph.

    Start from the smallest relation; repeatedly take the connected edge
    whose estimated output is smallest. Left-deep by construction — the
    shape Catalyst executes without extra exchanges.
    """
    if not edges:
        raise ValueError("no join edges")
    start = min(stats.values(), key=lambda s: s.rows).name
    joined = {start}
    order = [start]
    steps: list[JoinStep] = []
    cur_rows = stats[start].rows
    remaining = list(edges)

    def bare(key: str) -> str:
        return key.split(".", 1)[-1]

    def key_owner(e: JoinEdge, key: str) -> str:
        return e.left if key == e.left_key else e.right

    # NDV of each qualified join key *within the accumulated intermediate*.
    # Seeded from the start relation; after each join the matched key's NDV
    # collapses to min(left, right) and every key is capped by the
    # intermediate's estimated row count. Without this the estimator always
    # used the right side's base-table NDV as the left NDV, so the
    # intermediate's (usually much smaller) key cardinality never informed
    # the smallest-first ordering.
    cur_ndv: dict[str, int] = {}
    for e in edges:
        for k in (e.left_key, e.right_key):
            if key_owner(e, k) == start:
                cur_ndv[k] = stats[start].ndv_of(bare(k))

    while remaining:
        candidates = []
        for e in remaining:
            if e.left in joined and e.right not in joined:
                rel, lk, rk = e.right, e.left_key, e.right_key
            elif e.right in joined and e.left not in joined:
                rel, lk, rk = e.left, e.right_key, e.left_key
            else:
                continue
            left_ndv = min(
                cur_ndv.get(lk, stats[key_owner(e, lk)].ndv_of(bare(lk))),
                max(cur_rows, 1),
            )
            est = estimate_join(cur_rows, left_ndv, stats[rel], bare(rk))
            candidates.append((est, e, rel, lk, rk, left_ndv))
        if not candidates:
            # disconnected edge set: keep remaining edges as post-filters
            break
        est, edge, rel, lk, rk, left_ndv = min(candidates, key=lambda c: c[0])
        steps.append(
            JoinStep(
                relation=rel,
                left_key=lk,
                right_key=rk,
                broadcast=stats[rel].rows <= broadcast_rows,
                est_rows=est,
            )
        )
        joined.add(rel)
        order.append(rel)
        cur_rows = est
        # matched keys collapse to the smaller side's NDV; keys the new
        # relation brings in enter at their base NDV; everything is capped
        # by the intermediate's row estimate
        matched = min(left_ndv, stats[rel].ndv_of(bare(rk)))
        cur_ndv[lk] = cur_ndv[rk] = matched
        for e2 in edges:
            for k in (e2.left_key, e2.right_key):
                if key_owner(e2, k) == rel and k not in cur_ndv:
                    cur_ndv[k] = stats[rel].ndv_of(bare(k))
        for k in cur_ndv:
            cur_ndv[k] = min(cur_ndv[k], max(cur_rows, 1))
        remaining = [e for e in remaining if not (e.left in joined and e.right in joined)]

    return JoinPlan(order=order, steps=steps)


def apply_plan(
    relations: dict[str, DataFrame], plan: JoinPlan
) -> DataFrame:
    """Materialize the planned left-deep join tree with broadcast hints."""
    df = relations[plan.order[0]].alias(plan.order[0])
    for step in plan.steps:
        right = relations[step.relation].alias(step.relation)
        if step.broadcast:
            right = F.broadcast(right)
        df = df.join(right, F.col(step.left_key) == F.col(step.right_key))
    return df


def plan_and_join(
    relations: dict[str, DataFrame],
    edges: list[JoinEdge],
    join_keys: dict[str, list[str]] | None = None,
    sample_rows: int = DEFAULT_SAMPLE_ROWS,
    broadcast_rows: int = DEFAULT_BROADCAST_ROWS,
    enabled: bool = True,
) -> tuple[DataFrame, JoinPlan | None]:
    """The `strategiesChoosing` toggle: enabled=True plans from sampled
    stats; enabled=False joins in declaration order with no hints (the
    baseline the reference compares against, RunTPCDSBenchmark.scala:128-166).
    """
    if not enabled:
        names = list(relations)
        df = relations[names[0]].alias(names[0])
        used = {names[0]}
        remaining = list(edges)
        while remaining:
            progressed = False
            for e in list(remaining):
                if e.left in used and e.right not in used:
                    rel, lk, rk = e.right, e.left_key, e.right_key
                elif e.right in used and e.left not in used:
                    rel, lk, rk = e.left, e.right_key, e.left_key
                else:
                    remaining.remove(e)
                    continue
                df = df.join(relations[rel].alias(rel), F.col(lk) == F.col(rk))
                used.add(rel)
                remaining.remove(e)
                progressed = True
            if not progressed:
                break
        return df, None

    if join_keys is None:
        join_keys = {}
        for e in edges:
            join_keys.setdefault(e.left, []).append(e.left_key.split(".", 1)[-1])
            join_keys.setdefault(e.right, []).append(e.right_key.split(".", 1)[-1])
    stats = sample_stats(relations, join_keys, sample_rows)
    plan = plan_joins(stats, edges, broadcast_rows)
    return apply_plan(relations, plan), plan
