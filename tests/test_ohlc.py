"""Tumbling OHLC aggregation vs the pandas resample oracle
(SURVEY.md §2.5 A1-A3; the reference semantics are defined by
``resample('1min', label='left', closed='left')``)."""

from datetime import datetime

import pandas as pd
import pytest

from institutional_fx_etl_spark.operators.ohlc import ticks_to_candles


def ts(s):
    return datetime.fromisoformat(s)


TICKS = [
    # (datetime, ask, bid) — out of order inside the minute on purpose
    (ts("2024-01-01 10:00:55"), 1.2006, 1.2004),
    (ts("2024-01-01 10:00:05"), 1.2002, 1.2000),
    (ts("2024-01-01 10:00:30"), 1.2010, 1.2008),
    (ts("2024-01-01 10:01:10"), 1.2008, 1.2006),
    (ts("2024-01-01 10:01:10"), 1.2008, 1.2006),  # identical-ts duplicate
    (ts("2024-01-01 10:03:59"), 1.2001, 1.1999),  # minute with one tick
    (ts("2024-01-01 10:04:00"), None, 1.2000),    # null ask: volume 0, no price
]


def test_ohlc_matches_pandas_resample(spark):
    df = spark.createDataFrame(TICKS, "datetime timestamp, ask double, bid double")
    got = {
        r["datetime"]: r.asDict()
        for r in ticks_to_candles(df).collect()
    }

    pdf = pd.DataFrame(TICKS, columns=["datetime", "ask", "bid"]).set_index("datetime")
    pdf.sort_index(inplace=True)
    pdf["mid"] = (pdf["ask"] + pdf["bid"]) / 2
    pdf["spread"] = pdf["ask"] - pdf["bid"]
    rs = pdf.resample("1min", label="left", closed="left")
    exp = pd.DataFrame(
        {
            "open": rs["mid"].ohlc()["open"],
            "high": rs["mid"].ohlc()["high"],
            "low": rs["mid"].ohlc()["low"],
            "close": rs["mid"].ohlc()["close"],
            "volume": rs["ask"].count(),
            "spread": rs["spread"].mean(),
        }
    ).dropna(subset=["close"])

    assert set(got) == set(exp.index.to_pydatetime())
    for t, row in exp.iterrows():
        g = got[t.to_pydatetime()]
        for c in ["open", "high", "low", "close", "volume"]:
            assert g[c] == pytest.approx(row[c]), (t, c)
        assert g["spread"] == pytest.approx(row["spread"])


def test_ohlc_null_price_minute_dropped(spark):
    # a minute containing ONLY null-mid ticks has no close → dropped,
    # like pandas dropna(subset=['close']) after the resample
    df = spark.createDataFrame(
        [(ts("2024-01-01 10:00:05"), None, 1.0)],
        "datetime timestamp, ask double, bid double",
    )
    assert ticks_to_candles(df).count() == 0


def test_ohlc_single_tick_minute(spark):
    df = spark.createDataFrame(
        [(ts("2024-01-01 10:00:05"), 1.2, 1.0)],
        "datetime timestamp, ask double, bid double",
    )
    row = ticks_to_candles(df).collect()[0]
    assert row["open"] == row["high"] == row["low"] == row["close"] == 1.1
    assert row["volume"] == 1.0
    assert row["spread"] == pytest.approx(0.2)


def test_awkward_column_names_quoted(spark):
    """Caller-supplied column names needing backticks (spaces, dots,
    hyphens) must parse as identifiers in the selectExpr-built subtree
    — `a.b` would otherwise parse as a struct access (ADVICE r3)."""
    from datetime import datetime

    from institutional_fx_etl_spark.operators.ohlc import ticks_to_candles
    from institutional_fx_etl_spark.operators.similarity import pq_encode

    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 10, 0, s), 1.2, 1.0) for s in range(3)],
        "`time stamp` timestamp, `ask.px` double, `bid-px` double",
    )
    out = ticks_to_candles(
        df, ts_col="time stamp", ask_col="ask.px", bid_col="bid-px"
    ).collect()
    assert len(out) == 1 and out[0]["close"] == 1.1

    emb = spark.createDataFrame(
        [(1, [0.1] * 64)], "`doc id` long, `emb.vec` array<float>"
    )
    enc = pq_encode(emb, vec_col="emb.vec", id_col="doc id").collect()
    assert enc[0]["id"] == 1 and enc[0]["code_0"] >= 0
