"""Registry-wide Spark-vs-DuckDB output-type-width audit (round-7
verdict ask #2).

The driver's correctness hash is sensitive to the Arrow width of the
values, not just their numeric equality: round 7 went hash-red on six
value-exact queries because DuckDB returns ``SUM(integer)`` as HUGEINT
(INT128) while Spark returns BIGINT, and one Spark query emitted INT
where its oracle emitted BIGINT. This test makes the whole class
unrepresentable: for every oracle-paired registry entry it compares
the Spark analysis-time schema (no job runs) against the DuckDB
LIMIT-0 Arrow schema and fails on ANY width disagreement — HUGEINT,
DECIMAL-vs-DOUBLE, INT-vs-BIGINT, DATE-vs-TIMESTAMP alike.

Runs at sf0.001; the Spark side never executes, so the whole audit is
a few minutes of DuckDB LIMIT-0 plans.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from check_contract import duck_connection, type_mismatches  # noqa: E402

from institutional_fx_etl_spark.plans import driver_queries  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

_ORACLE_PAIRED = [
    name for name, (_, oracle) in driver_queries.REGISTRY.items() if oracle
]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLE_PAIRED)
def test_output_widths_match_oracle(spark, duck, name):
    fn, oracle = driver_queries.REGISTRY[name]
    sdf = fn(spark, SF_DIR)
    rel = duck.sql(f"SELECT * FROM ({oracle}) __q LIMIT 0")
    mism = type_mismatches(sdf, rel)
    assert not mism, (
        f"{name}: Spark/DuckDB output width mismatch {mism} — the "
        "driver hash is width-sensitive; CAST one side to mirror the "
        "other (see round-7 verdict)"
    )
