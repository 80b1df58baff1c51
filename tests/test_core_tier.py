"""Core reference-parity tier gate (r11 verdict task #7).

The registry keeps growing around the SURVEY.md §2 surface, and the
50-slot driver window rotates on staleness — so a §2 query can sit
out of the driver window for up to MAX_STALE rounds. This gate makes
the core tier (``plans/driver_queries.py::CORE_TIER`` — the §2
operator surface + flagship pipeline family) re-certify EVERY round
regardless of window composition:

- queries IN the upcoming window are about to get a fresh driver row
  at sf0.01 — nothing extra to run;
- queries OUT of the window get the same sf0.01 oracle check here,
  in pytest — strictly stronger than the sf0.001 tail gate (scale-
  sensitive regressions can hide below the tail gate's corpus size).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from check_contract import compare, duck_connection  # noqa: E402

from institutional_fx_etl_spark.plans import driver_queries  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

_WINDOW = set(list(driver_queries.REGISTRY)[:50])
_OUT_OF_WINDOW_CORE = [
    n for n in driver_queries.CORE_TIER if n not in _WINDOW
]


def test_core_tier_is_registered():
    missing = [
        n for n in driver_queries.CORE_TIER
        if n not in driver_queries.REGISTRY
    ]
    assert not missing, f"core-tier names missing from registry: {missing}"


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", _OUT_OF_WINDOW_CORE)
def test_core_query_matches_oracle_at_sf001(spark, duck, name):
    fn, oracle = driver_queries.REGISTRY[name]
    sdf = fn(spark, SF_DIR).toPandas()
    if oracle is None:
        assert len(sdf) >= 0
        return
    ddf = duck.sql(oracle).df()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: {problems}"
