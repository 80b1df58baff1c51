"""Out-of-window contract gate (round-2 verdict ask #4 / ADVICE).

The driver's correctness gate checks only the FIRST 50 registry
entries; the rotation policy (plans/driver_queries.py `_HEAD`/`_TAIL`)
demotes queries with fresh green rows past the window each round.
This test keeps an automated oracle check on the demoted set anyway —
a regression in a tail query fails CI instead of shipping unnoticed
until its next rotation. (The tail size floats with the registry:
len(REGISTRY) − 50 entries, all green in the previous round's window.)

Runs at sf0.001 (the smallest driver-generated testdata) through the
same Spark-vs-DuckDB compare the local contract mirror uses.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from check_contract import compare, duck_connection  # noqa: E402

from institutional_fx_etl_spark.plans import driver_queries  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


#: everything past the driver's 50-entry window — the declared _TAIL
#: plus any middle entries the head growth pushed out this round
_OUT_OF_WINDOW = list(driver_queries.REGISTRY)[50:]


@pytest.mark.parametrize("name", _OUT_OF_WINDOW)
def test_tail_query_matches_oracle(spark, duck, name):
    fn, oracle = driver_queries.REGISTRY[name]
    sdf = fn(spark, SF_DIR).toPandas()
    if oracle is None:
        assert len(sdf) >= 0
        return
    ddf = duck.sql(oracle).df()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: {problems}"
