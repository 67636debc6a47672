"""Query / Variation / result dataclasses (harness core).

Parity map (SURVEY.md §2.12):
  Query            Query.scala:29-35  (name, builder, sqlText, description, mode)
  Variation        Benchmark.scala:272-290 (name, options, setup side-effect)
  BenchmarkResult  results.scala:69-85 (per-phase times, joinTypes, tables,
                   result value, failure)
  ExperimentRun    results.scala:28-33
"""

from __future__ import annotations

import itertools
from collections.abc import Callable, Iterable, Sequence
from dataclasses import asdict, dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .modes import FOREACH, ExecutionMode


@dataclass
class Query:
    """A named, lazily-built DataFrame with an execution mode."""

    name: str
    build: Callable[[SparkSession], DataFrame]
    sql_text: str | None = None
    description: str = ""
    mode: ExecutionMode = FOREACH

    @classmethod
    def from_sql(
        cls,
        name: str,
        sql_text: str,
        description: str = "",
        mode: ExecutionMode = FOREACH,
    ) -> "Query":
        return cls(
            name=name,
            build=lambda spark: spark.sql(sql_text),
            sql_text=sql_text,
            description=description,
            mode=mode,
        )


@dataclass
class Variation:
    """A config axis; experiments run the cartesian product of all axes.

    `setup(spark, option)` applies the option (usually spark.conf.set) —
    the semantics of Benchmark.scala:272-290.
    """

    name: str
    options: Sequence[Any]
    setup: Callable[[SparkSession, Any], None]
    conf_key: str | None = None  # set for conf-backed variations -> runner
    # snapshots & restores the key after the experiment

    @classmethod
    def conf(cls, conf_key: str, options: Sequence[Any], name: str | None = None) -> "Variation":
        return cls(
            name=name or conf_key.rsplit(".", 1)[-1],
            options=options,
            setup=lambda spark, opt: spark.conf.set(conf_key, str(opt)),
            conf_key=conf_key,
        )


def cartesian(variations: Iterable[Variation]) -> list[list[tuple[Variation, Any]]]:
    """All combinations of variation options (Benchmark.scala:331-334)."""
    vs = list(variations)
    if not vs:
        return [[]]
    return [
        list(zip(vs, combo))
        for combo in itertools.product(*[v.options for v in vs])
    ]


@dataclass
class BenchmarkResult:
    name: str
    mode: str
    parameters: dict[str, Any] = field(default_factory=dict)
    join_types: list[str] = field(default_factory=list)
    tables: list[str] = field(default_factory=list)
    parsing_time_ms: float | None = None
    analysis_time_ms: float | None = None
    optimization_time_ms: float | None = None
    planning_time_ms: float | None = None
    execution_time_ms: float | None = None
    result: int | None = None
    query_execution: str | None = None
    failure: str | None = None
    # ML benchmarkables (results.scala:82-84 mlParams/mlResult parity)
    ml_params: dict[str, Any] | None = None
    ml_result: dict[str, Any] | None = None
    # per-subtree breakdown rows (results.scala:37-54 BreakdownResult)
    breakdown: list[dict[str, Any]] | None = None
    # sampled CPU profile (CpuProfile.scala re-expression, profiler.py):
    # {"n_ticks": int, "hz": float, "collapsed": [top stack lines]}
    profile: dict[str, Any] | None = None

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


@dataclass
class ExperimentRun:
    timestamp: int
    iteration: int
    tags: dict[str, str]
    configuration: dict[str, Any]
    results: list[BenchmarkResult]

    def to_dict(self) -> dict[str, Any]:
        d = asdict(self)
        d["results"] = [r.to_dict() if isinstance(r, BenchmarkResult) else r for r in self.results]
        return d
