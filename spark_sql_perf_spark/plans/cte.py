"""Materialized-CTE execution for multi-branch WITH queries.

Spark inlines every WITH-clause CTE into each referencing branch, so a
query like TPC-DS q14a (reference shape: TPCDS_1_4_Queries.scala:609-713)
re-executes ``cross_items``/``avg_sales`` once per channel branch — three
scans of item/store_sales per CTE. At 100x scale the re-executed
aggregation dominates the query. The scale-mode fix: run each shared CTE
once, cache it, register it as a temp view, and run the remainder of the
query against the views — one scan per CTE, identical results (the CTE
bodies are unchanged; only their execution count drops).

Cached frames and registered views are handed to the module-memo
registry, so ``ExperimentRunner``'s per-iteration cleanup / teardown
drains them like every other operator memo (see ``memo.py``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .. import memo

# (spark, view_name, cached_frame_or_None) triples awaiting cleanup
_LIVE: list[tuple[SparkSession, str, DataFrame | None]] = []


def _evict_materialized() -> None:
    while _LIVE:
        spark, name, df = _LIVE.pop()
        if df is not None:
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass


memo.register_evictor(_evict_materialized)


def split_with_clauses(sql: str) -> tuple[list[tuple[str, str]], str]:
    """Parse ``WITH a AS (...), b AS (...) <body>`` into CTEs + body.

    Paren-balance parsing, sufficient for this corpus (no parentheses
    inside string literals in any TPC-DS text). Returns ``([], sql)``
    when the query has no WITH clause.
    """
    m = re.match(r"\s*with\s+", sql, re.I)
    if not m:
        return [], sql
    i = m.end()
    ctes: list[tuple[str, str]] = []
    while True:
        m = re.match(r"\s*([A-Za-z_]\w*)\s+as\s*\(", sql[i:], re.I)
        if not m:
            break
        name = m.group(1)
        j = i + m.end()
        depth, k = 1, j
        while depth:
            if k >= len(sql):
                raise ValueError(
                    f"unbalanced parentheses parsing CTE {name!r} "
                    "(paren inside a string literal, or truncated SQL?)"
                )
            c = sql[k]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        ctes.append((name, sql[j : k - 1]))
        i = k
        m2 = re.match(r"\s*,", sql[i:])
        if not m2:
            break
        i += m2.end()
    return ctes, sql[i:]


def materialize_ctes(
    spark: SparkSession, sql: str, shared: tuple[str, ...] = ()
) -> DataFrame:
    """Run ``sql`` with its WITH-clause CTEs lifted into temp views.

    Every CTE is registered as a temp view in definition order (so later
    CTEs can reference earlier ones, e.g. q23's best_ss_customer ->
    max_store_sales); the names in ``shared`` — the ones referenced by
    more than one branch — are cached so each executes exactly once.
    CTE-name scoping is preserved for OTHER queries: a plain WITH query
    whose CTE happens to share a name resolves its own CTE first (SQL
    scoping beats temp views); the views are dropped at the next memo
    eviction regardless.
    """
    ctes, body = split_with_clauses(sql)
    for name, cte_body in ctes:
        df = spark.sql(cte_body)
        cached = None
        if name in shared:
            df = df.cache()
            cached = df
        df.createOrReplaceTempView(name)
        _LIVE.append((spark, name, cached))
    return spark.sql(body)
