"""Per-operator metrics from the executed plan — the degraded-fidelity
replacement for the reference's per-subtree re-execution breakdown
(Query.scala:86-116), which needs SparkPlan.execute() and is not reachable
idiomatically from Python (SURVEY.md §7 'what's hard').

After an action runs, every physical node carries SQL metrics (rows
output, time in exchange/scan/agg, spill sizes). We walk the JVM plan tree
via py4j and collect them — observed numbers from the actual run, rather
than re-executing each subtree like the reference does.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame


@dataclass
class NodeMetrics:
    node: str
    depth: int
    metrics: dict[str, int] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {"node": self.node, "depth": self.depth, "metrics": self.metrics}


def _walk(jnode, depth: int, out: list[NodeMetrics]) -> None:
    m: dict[str, int] = {}
    it = jnode.metrics().iterator()
    while it.hasNext():
        entry = it.next()
        metric = entry._2()
        m[str(entry._1())] = int(metric.value())
    name = jnode.nodeName()
    out.append(NodeMetrics(node=name, depth=depth, metrics=m))
    # AQE stage wrappers (ShuffleQueryStage / BroadcastQueryStage /
    # ResultQueryStage) hold their subplan as a member, not a child
    if "QueryStage" in name:
        _walk(jnode.plan(), depth + 1, out)
        return
    cit = jnode.children().iterator()
    while cit.hasNext():
        _walk(cit.next(), depth + 1, out)


def plan_metrics(df: DataFrame) -> list[NodeMetrics]:
    """Collect per-node SQL metrics from the (executed) physical plan.

    Call AFTER an action — metrics are zero until the plan ran. With AQE
    the final plan is used when available.
    """
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan()
    # unwrap AdaptiveSparkPlanExec to its finalized plan if present
    if plan.nodeName() == "AdaptiveSparkPlan":
        plan = plan.executedPlan()
    out: list[NodeMetrics] = []
    _walk(plan, 0, out)
    return out


def rows_by_operator(df: DataFrame) -> dict[str, int]:
    """Rows produced per operator type — the quick skew/explosion check."""
    agg: dict[str, int] = {}
    for nm in plan_metrics(df):
        rows = nm.metrics.get("numOutputRows")
        if rows is not None:
            agg[nm.node] = agg.get(nm.node, 0) + rows
    return agg
