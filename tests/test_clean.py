"""validate_and_clean (F4-F6) semantics, including audit tags and the
null-safety traps (SURVEY.md §2.3, §2.9)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from institutional_fx_etl_spark.operators.clean import validate_and_clean


def ts(s):
    return datetime.fromisoformat(s)


def mk(spark, rows):
    return spark.createDataFrame(
        rows,
        "datetime timestamp, open double, high double, low double,"
        " close double, volume double, spread double",
    )


def test_inverted_candle_dropped_and_audited(spark):
    df = mk(
        spark,
        [
            (ts("2024-01-01 10:00:00"), 1.0, 1.1, 0.9, 1.05, 5.0, 0.01),
            (ts("2024-01-01 10:01:00"), 1.0, 0.9, 1.1, 1.0, 5.0, 0.01),  # low > high
        ],
    )
    clean, audit = validate_and_clean(df, spike_threshold=10.0)
    assert clean.count() == 1
    a = audit.collect()
    assert len(a) == 1 and a[0]["reason"] == "dropped_inverted"
    assert a[0]["datetime"] == ts("2024-01-01 10:01:00")


def test_structure_fix_rewrites_high_low_and_ffills_spread(spark):
    df = mk(
        spark,
        [
            (ts("2024-01-01 10:00:00"), 1.0, 1.1, 0.9, 1.05, 5.0, 0.01),
            # close above high → fixed, spread nulled then ffilled from prev row
            (ts("2024-01-01 10:01:00"), 1.0, 1.1, 0.9, 1.3, 5.0, 0.07),
        ],
    )
    clean, audit = validate_and_clean(df, spike_threshold=10.0)
    rows = {r["datetime"]: r for r in clean.collect()}
    fixed = rows[ts("2024-01-01 10:01:00")]
    assert fixed["high"] == 1.3  # greatest(open, close, high)
    assert fixed["low"] == 0.9
    assert fixed["spread"] == 0.01  # ffilled from the previous row
    a = audit.collect()
    assert len(a) == 1 and a[0]["reason"] == "fixed_structure_integrity"
    assert a[0]["high"] == 1.1  # audit logs PRE-fix values


def test_no_structure_fix_leaves_preexisting_null_spread(spark):
    # the reference only ffills spread when ≥1 row was actually fixed
    df = mk(
        spark,
        [
            (ts("2024-01-01 10:00:00"), 1.0, 1.1, 0.9, 1.05, 5.0, 0.01),
            (ts("2024-01-01 10:01:00"), 1.0, 1.1, 0.9, 1.0, 5.0, None),
        ],
    )
    clean, _ = validate_and_clean(df, spike_threshold=10.0)
    rows = {r["datetime"]: r for r in clean.collect()}
    assert rows[ts("2024-01-01 10:01:00")]["spread"] is None


def test_volatility_spike_amplitude_and_jump(spark):
    df = mk(
        spark,
        [
            (ts("2024-01-01 10:00:00"), 1.0, 1.001, 0.999, 1.0, 5.0, 0.01),
            # amplitude (high-low)/open = 0.02 > 0.005 → dropped
            (ts("2024-01-01 10:01:00"), 1.0, 1.02, 1.0, 1.001, 5.0, 0.01),
            # jump: |pct_change| vs row above = |1.1/1.001 - 1| ≈ 0.099 → dropped
            (ts("2024-01-01 10:02:00"), 1.1, 1.1005, 1.0995, 1.1, 5.0, 0.01),
            # then this one ALSO jumps vs 1.1? no: pct_change is computed once
            # on the pre-drop series; 1.1 -> 1.1001 is fine → kept
            (ts("2024-01-01 10:03:00"), 1.1, 1.1005, 1.0995, 1.1001, 5.0, 0.01),
        ],
    )
    clean, audit = validate_and_clean(df, spike_threshold=0.005)
    kept = sorted(r["datetime"] for r in clean.collect())
    assert kept == [ts("2024-01-01 10:00:00"), ts("2024-01-01 10:03:00")]
    reasons = [r["reason"] for r in audit.collect()]
    assert reasons.count("dropped_volatility_spike") == 2


def test_first_row_null_pct_change_kept(spark):
    # trap T3: first row's pct_change is NULL → NULL > θ must keep the row
    df = mk(spark, [(ts("2024-01-01 10:00:00"), 1.0, 1.001, 0.999, 1.0, 5.0, 0.01)])
    clean, _ = validate_and_clean(df, spike_threshold=0.005)
    assert clean.count() == 1


def test_null_close_rows_survive_spike_filter(spark):
    # trap T1 family: NULL amplitude/jump (null open or close) keeps rows
    df = mk(
        spark,
        [
            (ts("2024-01-01 10:00:00"), None, 1.1, 0.9, None, 5.0, 0.01),
            (ts("2024-01-01 10:01:00"), 1.0, 1.001, 0.999, 1.0, 5.0, 0.01),
        ],
    )
    clean, _ = validate_and_clean(df, spike_threshold=0.005)
    assert clean.count() == 2
