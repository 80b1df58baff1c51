"""Bounded session ledger for caller-owned operator caches.

Operators here persist intermediates with CALLER-OWNED lifetimes (the
triangle_count / dedup_clusters discipline): ``persist`` is plan-keyed,
so a repeated invocation over the same inputs re-matches the warm
InMemoryRelation instead of re-deriving the subtree. The flip side
(r14 VERDICT item 3 / ADVICE): nothing in a query path ever
unpersists, so a long-lived session iterating over many inputs — the
186-query bench, a real multi-query driver — accumulates live
InMemoryRelations without bound. Every later plan then pays the cache
manager's canonicalized-plan lookup against a growing list, and the
storage memory fills with relations nobody will match again.

:func:`cached` is the fix: a ``persist`` that also registers the
relation in a session-wide LRU ledger keyed by the plan's semantic
hash. Re-registering the same plan (a warm re-invocation) refreshes
recency instead of duplicating; pushing the ledger past
``SPARK_GRAFT_CACHE_LEDGER_CAP`` (default 48) unpersists the
least-recently-registered relation. Consequences:

- IN-QUERY and adjacent-invocation reuse is untouched — a single
  query registers a handful of relations, far below the cap, and the
  bench's warm best-of-3 passes re-match entries registered seconds
  earlier;
- CROSS-QUERY leakage is bounded: after ~cap distinct cached plans,
  old entries are released, so live-cache count (and the per-plan
  cache-manager lookup cost every later query pays) plateaus instead
  of growing with suite length;
- eviction is a PERFORMANCE event, never a correctness one: an
  unpersisted relation recomputes from lineage (Spark re-compiles
  dependent cached plans on non-cascading unpersist).

Operators that explicitly ``unpersist`` their own handles are
unaffected — eviction of an already-released entry is a no-op.
"""

from __future__ import annotations

import os
from collections import OrderedDict

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

#: live-entry cap; env-overridable for drivers with different cache
#: budgets (0 or negative disables eviction — unbounded, the pre-r15
#: behavior)
_CAP = int(os.environ.get("SPARK_GRAFT_CACHE_LEDGER_CAP", "48"))

_LEDGER: OrderedDict[object, DataFrame] = OrderedDict()


def _plan_key(df: DataFrame) -> object:
    """Semantic hash of the analyzed plan — the same canonicalized
    identity the cache manager matches persists by, so a re-built
    identical DAG refreshes its existing ledger entry instead of
    appending a duplicate."""
    try:
        return df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:  # noqa: BLE001 — identity fallback, never fatal
        return id(df)


def cached(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """``df.persist(level)`` + LRU-ledger registration (module
    docstring). Returns ``df`` for chaining."""
    df.persist(level)
    key = _plan_key(df)
    _LEDGER.pop(key, None)
    _LEDGER[key] = df
    if _CAP > 0:
        while len(_LEDGER) > _CAP:
            _, old = _LEDGER.popitem(last=False)
            try:
                old.unpersist(blocking=False)
            except Exception:  # noqa: BLE001 — stale session handles
                pass
    return df


def cached_deser(df: DataFrame) -> DataFrame:
    """:func:`cached` at ``persist()``'s default level
    (MEMORY_AND_DISK_DESER) — drop-in for bare ``.persist()`` sites
    via ``.transform(cached_deser)``."""
    return cached(df, StorageLevel.MEMORY_AND_DISK_DESER)


def cached_disk(df: DataFrame) -> DataFrame:
    """:func:`cached` at DISK_ONLY — drop-in for
    ``.persist(StorageLevel.DISK_ONLY)`` sites."""
    return cached(df, StorageLevel.DISK_ONLY)


def release(df: DataFrame) -> None:
    """Explicit release that keeps the ledger consistent (for
    operators that still manage their own cache lifetime)."""
    _LEDGER.pop(_plan_key(df), None)
    try:
        df.unpersist(blocking=False)
    except Exception:  # noqa: BLE001
        pass


def live_count() -> int:
    """Number of ledger-tracked live entries (test surface)."""
    return len(_LEDGER)
