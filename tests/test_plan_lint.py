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

_BATCH_QUERIES = [
    n for n in driver_queries.REGISTRY if not n.startswith("streaming_")
]


@pytest.mark.parametrize("name", _BATCH_QUERIES)
def test_plan_has_no_forbidden_operators(spark, name):
    fn, _ = driver_queries.REGISTRY[name]
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    if name not in CARTESIAN_ALLOWED:
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian"
    assert "BatchEvalPython" not in plan, f"{name} plans a Python UDF"
    assert "ArrowEvalPython" not in plan, f"{name} plans a scalar UDF"
