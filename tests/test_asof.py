"""As-of join semantics: simultaneity, no-predecessor NULLs, whole-row
atomicity, per-partition isolation."""

from datetime import datetime, timedelta

from institutional_fx_etl_spark.operators.asof import asof_join

T0 = datetime(2024, 1, 1, 10, 0)


def ts(m, s=0):
    return T0 + timedelta(minutes=m, seconds=s)


def test_asof_basic_and_edges(spark):
    left = spark.createDataFrame(
        [(1, ts(0)), (2, ts(1)), (3, ts(2)), (4, ts(5))],
        "trade_id long, datetime timestamp",
    )
    right = spark.createDataFrame(
        [
            (ts(0, 30), 100.0, "a"),
            (ts(2), 200.0, "b"),     # exactly simultaneous with trade 3
            (ts(4), 300.0, None),    # null field must travel with its row
        ],
        "datetime timestamp, px double, src string",
    )
    out = {r["trade_id"]: r for r in asof_join(left, right).collect()}
    assert out[1]["px_asof"] is None          # nothing at or before ts(0)
    assert out[2]["px_asof"] == 100.0
    assert out[3]["px_asof"] == 200.0         # simultaneous right row visible
    assert out[3]["src_asof"] == "b"
    # trade 4 takes the WHOLE latest row — px 300 with its null src,
    # never a mix of (300.0, "b")
    assert out[4]["px_asof"] == 300.0 and out[4]["src_asof"] is None


def test_asof_partitioned(spark):
    left = spark.createDataFrame(
        [("A", 1, ts(1)), ("B", 2, ts(1))],
        "sym string, trade_id long, datetime timestamp",
    )
    right = spark.createDataFrame(
        [("A", ts(0), 1.0), ("B", ts(0), 2.0)],
        "sym string, datetime timestamp, px double",
    )
    out = {
        r["trade_id"]: r["px_asof"]
        for r in asof_join(left, right, partition_cols=("sym",)).collect()
    }
    assert out == {1: 1.0, 2: 2.0}  # no cross-symbol leakage


def test_asof_nearest_picks_closer_side_and_tie_goes_earlier(spark):
    """direction='nearest': closest right row on either side wins;
    an exact-distance tie takes the earlier row; edges fall back to
    the only available side."""
    from datetime import datetime, timedelta

    from institutional_fx_etl_spark.operators.asof import asof_join_nearest

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, t0), (2, t0 + timedelta(seconds=100)),
         (3, t0 + timedelta(seconds=250))],
        "id long, datetime timestamp",
    )
    right = spark.createDataFrame(
        [(t0 + timedelta(seconds=90), 10.0),
         (t0 + timedelta(seconds=110), 20.0),
         (t0 + timedelta(seconds=400), 30.0)],
        "datetime timestamp, q double",
    )
    out = {
        r["id"]: r["q_near"]
        for r in asof_join_nearest(left, right, suffix="_near").collect()
    }
    assert out[1] == 10.0          # only earlier side... nearest is +90
    assert out[2] == 10.0          # tie (10 vs 10) -> earlier row
    assert out[3] == 20.0          # -140 beats +150
