"""Unit tests for the scalar/window/merge function layer, with pandas
as the independent semantics oracle (the reference's behavior is defined
by pandas 2.x — SURVEY.md §1.2, §2.6, §2.9)."""

from datetime import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.merge import combine_first
from institutional_fx_etl_spark.functions.nullsafe import drop_where
from institutional_fx_etl_spark.functions.timeutils import fx_offsession_mask, time_spine
from institutional_fx_etl_spark.functions.windows import (
    ffill,
    pct_change,
    rolling_median_centered,
)


def ts(s):
    return datetime.fromisoformat(s)


# --- null-safe predicates (traps T1/T3) -------------------------------


def test_drop_where_keeps_null_condition_rows(spark):
    df = spark.createDataFrame(
        [(1, 0.5), (2, None), (3, 2.0)], "id int, v double"
    )
    out = drop_where(df, F.col("v") < 1.0)
    assert sorted(r.id for r in out.collect()) == [2, 3]


# --- calendar mask (trap T2: dayofweek convention shift) ---------------


def test_fx_offsession_mask_matches_pandas_convention(spark):
    # 2024-01-05 is a Friday; -06 Saturday; -07 Sunday; -08 Monday.
    rows = [
        (ts("2024-01-05 21:59:00"), False),  # Fri before 22:00 — kept
        (ts("2024-01-05 22:00:00"), True),   # Fri 22:00 — dropped
        (ts("2024-01-06 12:00:00"), True),   # Saturday — dropped
        (ts("2024-01-07 20:59:00"), True),   # Sun before 21:00 — dropped
        (ts("2024-01-07 21:00:00"), False),  # Sun 21:00 — kept
        (ts("2024-01-08 00:00:00"), False),  # Monday — kept
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "t timestamp")
    got = [
        r["m"] for r in df.select(fx_offsession_mask(F.col("t")).alias("m")).collect()
    ]
    assert got == [exp for _, exp in rows]

    # cross-check the whole truth table against the pandas-convention mask
    idx = pd.DatetimeIndex([t for t, _ in rows])
    pandas_mask = (
        (idx.dayofweek == 5)
        | ((idx.dayofweek == 4) & (idx.hour >= 22))
        | ((idx.dayofweek == 6) & (idx.hour < 21))
    )
    assert got == list(pandas_mask)


# --- window helpers (W1-W3) -------------------------------------------


def test_ffill_matches_pandas_and_leaves_leading_nulls(spark):
    vals = [None, None, 1.0, None, 2.0, None, None]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, v double"
    )
    out = (
        df.withColumn("f", ffill("v", order_cols=("i",)))
        .orderBy("i")
        .collect()
    )
    expected = pd.Series(vals).ffill()
    for row, exp in zip(out, expected):
        assert (row["f"] is None) == pd.isna(exp)
        if row["f"] is not None:
            assert row["f"] == exp


def test_pct_change_matches_pandas(spark):
    vals = [1.0, 1.1, None, 1.3, 1.2]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v double")
    out = df.withColumn("p", pct_change("v", order_cols=("i",))).orderBy("i").collect()
    # pandas pct_change with default fill_method deprecated; compute manually:
    # (x - prev)/prev with prev = previous ROW's value (not previous valid).
    prevs = [None] + vals[:-1]
    for row, v, prev in zip(out, vals, prevs):
        if v is None or prev is None:
            assert row["p"] is None
        else:
            assert row["p"] == pytest.approx((v - prev) / prev)


def test_rolling_median_centered_matches_pandas(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 100.0, 6.0, 7.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v double")
    out = (
        df.withColumn("m", rolling_median_centered("v", order_cols=("i",)))
        .orderBy("i")
        .collect()
    )
    expected = (
        pd.Series(vals).rolling(window=5, center=True, min_periods=1).median()
    )
    assert [r["m"] for r in out] == pytest.approx(list(expected))


# --- combine_first (J3, trap T8: cell-level) ---------------------------


def test_combine_first_is_cell_level(spark):
    p = spark.createDataFrame(
        [(1, None, 10.0), (2, 2.0, None)], "k int, a double, b double"
    )
    f = spark.createDataFrame(
        [(1, 111.0, 222.0), (3, 3.0, 30.0)], "k int, a double, b double"
    )
    out = {r["k"]: (r["a"], r["b"]) for r in combine_first(p, f, on=["k"]).collect()}
    # row 1 present on primary but its NaN cell 'a' filled from fallback
    assert out[1] == (111.0, 10.0)
    # row 2 primary-only values kept, missing cell stays null
    assert out[2] == (2.0, None)
    # row 3 added wholesale from fallback
    assert out[3] == (3.0, 30.0)

    # cross-check against pandas combine_first
    pdf = pd.DataFrame({"a": [None, 2.0], "b": [10.0, None]}, index=[1, 2])
    fdf = pd.DataFrame({"a": [111.0, 3.0], "b": [222.0, 30.0]}, index=[1, 3])
    exp = pdf.combine_first(fdf)
    for k, (a, b) in out.items():
        assert (a is None) == pd.isna(exp.loc[k, "a"])
        assert (b is None) == pd.isna(exp.loc[k, "b"])
        if a is not None:
            assert a == exp.loc[k, "a"]
        if b is not None:
            assert b == exp.loc[k, "b"]


# --- time spine (J4) ---------------------------------------------------


def test_time_spine_is_gapless_inclusive(spark):
    df = spark.createDataFrame(
        [(ts("2024-01-01 10:00:30"),), (ts("2024-01-01 10:05:10"),)],
        "datetime timestamp",
    )
    # bounds are raw min/max (the reference reindexes on raw timestamps;
    # minute-truncation happens upstream at the candle stage)
    got = [r["datetime"] for r in time_spine(df).orderBy("datetime").collect()]
    assert got[0] == ts("2024-01-01 10:00:30")
    assert got[-1] == ts("2024-01-01 10:04:30")
    assert len(got) == 5
