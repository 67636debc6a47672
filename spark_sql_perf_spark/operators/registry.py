"""Query registry + cross-engine exactness helpers.

Replaces the reference's reflection-based query discovery
(Benchmark.scala:151-167) with an explicit decorator registry.

Exactness strategy (why the ``dec``/``money_sum`` helpers exist): the
driver hash-compares Spark output against a DuckDB oracle. Floating-point
SUM/AVG is order-dependent, and Spark and DuckDB will generally not add
partitions in the same order — so any double aggregate would be a hash
mismatch waiting to happen. All testdata money columns are 2-decimal clean
(verified in tests), so we aggregate in DECIMAL (exact, order-independent,
identical in both engines) and cast the final value back to DOUBLE. This
is also the *right* answer at 100 TB: decimal partial aggregation is
JVM-side, whole-stage-codegen'd, and gives run-to-run stable results.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is equivalent DuckDB SQL.

    Queries with no oracle (non-SQL-expressible ops) get the driver's
    weaker rows-only check — keep those to a minimum.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# exact-aggregation helpers (Spark side). The DuckDB oracle mirrors these
# textually: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE).
# ---------------------------------------------------------------------------

def dec(col: str | Column, prec: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def money_sum(col: str | Column, alias: str, prec: int = 18, scale: int = 2) -> Column:
    """Order-independent exact SUM of a monetary double column."""
    return F.sum(dec(col, prec, scale)).cast("double").alias(alias)


def money_avg(col: str | Column, alias: str, prec: int = 18, scale: int = 2) -> Column:
    """AVG as exact-decimal SUM / COUNT, evaluated in double at the end.

    Deterministic across engines because both compute the identical exact
    sum, cast it to the identical double, and do one IEEE division.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, prec, scale)).cast("double") / F.count(c)).alias(alias)


def money_sum_sql(expr: str, alias: str, prec: int = 18, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE) AS {alias}"


def money_avg_sql(expr: str, alias: str, prec: int = 18, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
