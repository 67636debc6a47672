"""Operator corpus registry (SURVEY.md §2 inventory).

Each submodule registers named queries via the ``@query`` decorator from
``.registry``. A query is a callable ``(spark, sf_dir) -> DataFrame`` plus,
when SQL-expressible, a DuckDB oracle string run by the driver against the
same parquet tables. The aggregate dicts here back
``__spark_entry__.queries()`` / ``oracle_sql()``.
"""

from __future__ import annotations

from . import (  # noqa: F401  (import for registration side effects)
    aggregations,
    asof,
    graph,
    joins,
    layout_query,
    multijoin_query,
    nested,
    projections,
    scalars,
    scalars2,
    setops,
    sorts,
    sqlpath,
    subqueries,
    timeseries,
    tpch,
    tpch2,
    windows,
    windows2,
)
from ..pipeline import (  # noqa: F401
    curation,
    dedup,
    grouped,
    ivf,
    linkage,
    multimodal,
    pq,
    quality,
    similarity,
    textstats,
    tfidf,
)
from ..streaming import dedup as stream_dedup  # noqa: F401
from ..streaming import windows as event_windows  # noqa: F401
from .registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
