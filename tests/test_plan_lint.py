"""Registry-wide physical-plan lint — the anti-pattern sweep, machine
form. Every batch contract query's plan is built (not executed) at
sf0.001 and scanned for the operators a 100 TB engine must never plan
in a hot path:

- ``CartesianProduct`` — an unbounded n×m join. Allowlisted only for
  the eval harnesses whose GROUND-TRUTH side is brute force by design
  (documented in their docstrings; the production path they evaluate
  is blocked/bounded).
- ``BatchEvalPython`` / ``ArrowEvalPython`` — row-at-a-time (or
  scalar-vectorized) Python UDF nodes. The engine's contract is ZERO
  scalar Python in any query: Python crosses the boundary only
  through ``MapInPandas`` / ``FlatMapGroupsInPandas`` (Arrow-batched,
  allowed, and only where semantics demand it).

- Plan SIZE (r12 verdict ask #4, promoted from the round-close
  checklist to a machine gate): an unrolled loop that references
  prior state more than ~twice grows its lazy plan multiplicatively
  (kcore_decomposition hit 18,868 BroadcastHashJoins and 19.6 s of
  pure planning before its localCheckpoint fix; verified: with
  checkpointing no-op'd the same plan prints >20k lines and this
  gate fires). Every batch query's executedPlan must print under
  ``MAX_PLAN_LINES``; the documented combinatorial graph ops with
  legitimately large fixed-round plans carry explicit higher caps in
  ``PLAN_LINES_ALLOWANCE`` — grow one past its cap and the gate
  demands either lineage truncation or a reviewed allowance bump.

Streaming queries (``streaming_*``) are skipped here: building their
result requires actually running the stream, and their batch twins
cover the same logical plans.
"""

from __future__ import annotations

import pytest

from institutional_fx_etl_spark.plans import driver_queries

SF_DIR = "/root/testdata/sf0.001"

#: brute-force-by-design ground-truth sides of evaluation harnesses
CARTESIAN_ALLOWED = {
    "dedup_recall_eval",  # blocking-free exact-Jaccard truth (n²)
}

#: default ceiling on executedPlan().toString() line count at sf0.001
#: (measured registry max outside the allowance: ~910 lines; the
#: blowup class this catches prints tens of thousands)
MAX_PLAN_LINES = 1000

#: documented fixed-round iterative graph ops whose unrolled-but-
#: truncated plans legitimately exceed the default (measured r13:
#: modularity 2318, clustering_coefficient 1499 — constant per round
#: count, NOT multiplicative; the gate still bounds them)
PLAN_LINES_ALLOWANCE = {
    # r14: +600 — the shared co-purchase edge relation is now
    # materialized ONCE at the query level (persist + count barrier;
    # kills the 4× re-evaluation of the basket pair emission), which
    # adds one InMemoryRelation nesting level whose cached child
    # prints inline under both the detector and scorer subtrees
    "graph_modularity": 3600,
    "clustering_coefficient": 2000,
}

_BATCH_QUERIES = [
    n for n in driver_queries.REGISTRY if not n.startswith("streaming_")
]


@pytest.fixture(autouse=True)
def _clean_cache_baseline(spark):
    """Plan STRINGS are cache-state-dependent: an InMemoryRelation
    left by an earlier test (or test file) prints its entire cached
    child plan inline, inflating a 467-line sssp plan to 5k+ lines in
    a full-suite session. Clear the cache before EVERY query (r14:
    module-scope clearing stopped being enough once operators gained
    construction-time count barriers — those MATERIALIZE caches
    mid-module, and a materialized relation left by one query's
    construction inflated a later query's print ~10×, e.g.
    graph_modularity 3.5k → 31k lines). Per-test clearing makes each
    size a clean-room, order-independent measurement."""
    spark.catalog.clearCache()
    yield


@pytest.mark.parametrize("name", _BATCH_QUERIES)
def test_plan_has_no_forbidden_operators(spark, name):
    fn, _ = driver_queries.REGISTRY[name]
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    if name not in CARTESIAN_ALLOWED:
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian"
    assert "BatchEvalPython" not in plan, f"{name} plans a Python UDF"
    assert "ArrowEvalPython" not in plan, f"{name} plans a scalar UDF"
    cap = PLAN_LINES_ALLOWANCE.get(name, MAX_PLAN_LINES)
    n_lines = plan.count("\n")
    assert n_lines <= cap, (
        f"{name} plans {n_lines} lines (cap {cap}) — an unrolled or"
        " self-joined lineage needs localCheckpoint truncation (see"
        " ROADMAP round-12 perf lessons), or a reviewed allowance"
    )


def test_rotation_lists_have_no_typos():
    """_reorder_registry silently skips names missing from REGISTRY —
    a typo in the rotation lists would silently shrink the driver
    window. Every listed name must resolve."""
    from institutional_fx_etl_spark.plans.driver_queries import (
        _HEAD,
        _TAIL,
        REGISTRY,
    )

    missing = [n for n in _HEAD + _TAIL if n not in REGISTRY]
    assert not missing, missing
    assert len(set(_HEAD)) == len(_HEAD)
    assert len(set(_TAIL)) == len(_TAIL)
    assert not (set(_HEAD) & set(_TAIL))


def test_driver_window_is_full():
    """The driver certifies the FIRST 50 registry entries — the window
    must actually hold 50 distinct queries."""
    from institutional_fx_etl_spark.plans.driver_queries import REGISTRY

    window = list(REGISTRY)[:50]
    assert len(window) == 50 and len(set(window)) == 50
