"""Property-based tests (hypothesis): random tick streams and candle
series must satisfy the reference semantics on every draw — the
randomized arm of the §5 test strategy."""

from datetime import datetime, timedelta, timezone

import pandas as pd
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from institutional_fx_etl_spark.operators.clean import validate_and_clean
from institutional_fx_etl_spark.operators.densify import (
    densify_gaps_explode,
    densify_grid,
)
from institutional_fx_etl_spark.operators.ohlc import ticks_to_candles

T0 = datetime(2024, 1, 1, 10, 0, 0)

prices = st.one_of(
    st.none(), st.floats(min_value=0.5, max_value=2.0, allow_nan=False)
)

# unique timestamps: for same-timestamp ticks the pandas oracle is
# order-dependent (the reference's own nondeterminism, trap T5) while
# the engine tie-breaks deterministically by value — an intentional
# divergence covered by test_ohlc.py, not a property to enforce here
tick_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3600),  # seconds offset
        prices,  # ask
        prices,  # bid
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda r: r[0],
)

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(rows=tick_rows)
@SETTINGS
def test_ohlc_matches_pandas_on_random_ticks(spark, rows):
    data = [(T0 + timedelta(seconds=s), a, b) for s, a, b in rows]
    df = spark.createDataFrame(data, "datetime timestamp, ask double, bid double")
    got = {r["datetime"]: r.asDict() for r in ticks_to_candles(df).collect()}

    pdf = pd.DataFrame(data, columns=["datetime", "ask", "bid"]).set_index("datetime")
    pdf = pdf.astype({"ask": "float64", "bid": "float64"})  # all-None → object otherwise
    pdf.sort_index(inplace=True)
    pdf["mid"] = (pdf["ask"] + pdf["bid"]) / 2
    pdf["spread"] = pdf["ask"] - pdf["bid"]
    rs = pdf.resample("1min", label="left", closed="left")
    ohlc = rs["mid"].ohlc()
    exp = pd.DataFrame(
        {
            "open": ohlc["open"],
            "high": ohlc["high"],
            "low": ohlc["low"],
            "close": ohlc["close"],
            "volume": rs["ask"].count(),
            "spread": rs["spread"].mean(),
        }
    ).dropna(subset=["close"])

    assert set(got) == set(exp.index.to_pydatetime())
    for t, row in exp.iterrows():
        g = got[t.to_pydatetime()]
        for c in ["open", "high", "low", "close", "volume", "spread"]:
            if pd.isna(row[c]):
                assert g[c] is None, (t, c)
            else:
                assert g[c] == pytest.approx(row[c], rel=1e-12), (t, c)


candle_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=120),  # minute offset (gaps arise)
        st.floats(min_value=0.5, max_value=2.0, allow_nan=False),  # open
        st.floats(min_value=0.5, max_value=2.0, allow_nan=False),  # high
        st.floats(min_value=0.5, max_value=2.0, allow_nan=False),  # low
        st.floats(min_value=0.5, max_value=2.0, allow_nan=False),  # close
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda r: r[0],
)


two_candle_sets = st.tuples(candle_rows, candle_rows)


@given(sides=two_candle_sets)
@SETTINGS
def test_fused_merge_equals_chain_on_random_candles(spark, sides):
    """Property form of test_operator_equivalence: the fused
    consensus+combine_first join must equal the standalone chain for
    arbitrary overlapping candle sets."""
    from institutional_fx_etl_spark.functions.merge import combine_first
    from institutional_fx_etl_spark.operators.consensus import consensus_filter
    from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark
    from institutional_fx_etl_spark.sources.schemas import CANDLE_COLS

    tick_rows_, m1_rows = sides
    mk = lambda rows: spark.createDataFrame(
        [
            (T0 + timedelta(minutes=m), o, h, lo, c, 1.0, 0.001)
            for m, o, h, lo, c in rows
        ],
        "datetime timestamp, open double, high double, low double,"
        " close double, volume double, spread double",
    )
    ticks, m1 = mk(tick_rows_), mk(m1_rows)

    kept, _ = consensus_filter(ticks, m1, threshold=0.3)
    merged_chain = combine_first(kept, m1, on=["datetime"], cols=CANDLE_COLS)

    eng = HybridMergerSpark(consensus_threshold=0.3)
    # reach into the fused path: merge() up to the repair stage is not
    # separable, so compare the final outputs of both routes instead
    from institutional_fx_etl_spark.operators.spread import repair_spread
    from institutional_fx_etl_spark.operators.clean import validate_and_clean
    from institutional_fx_etl_spark.operators.densify import densify_gaps_explode
    from institutional_fx_etl_spark.plans.pipeline import cast_final

    repaired = repair_spread(merged_chain, kept, smooth=True)
    clean, _ = validate_and_clean(repaired, spike_threshold=1e9)
    dense, _ = densify_gaps_explode(clean)
    legacy = sorted(
        (r.asDict() for r in cast_final(dense).collect()),
        key=lambda r: r["datetime"],
    )

    eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=0.3)
    final, _ = eng.merge(m1, ticks)
    fused = sorted(
        (r.asDict() for r in final.collect()), key=lambda r: r["datetime"]
    )
    assert fused == legacy


@given(rows=candle_rows)
@SETTINGS
def test_clean_output_invariants(spark, rows):
    data = [
        (T0 + timedelta(minutes=m), o, h, lo, c, 1.0, 0.001)
        for m, o, h, lo, c in rows
    ]
    df = spark.createDataFrame(
        data,
        "datetime timestamp, open double, high double, low double,"
        " close double, volume double, spread double",
    )
    clean, audit = validate_and_clean(df, spike_threshold=1e9)
    out = clean.collect()
    for r in out:
        assert r["low"] <= r["high"] + 1e-12
        assert r["low"] <= min(r["open"], r["close"]) + 1e-12
        assert r["high"] >= max(r["open"], r["close"]) - 1e-12
    # conservation: every input row is either kept or audited as dropped
    dropped = {
        r["datetime"]
        for r in audit.collect()
        if r["reason"] in ("dropped_inverted", "dropped_volatility_spike")
    }
    assert len(out) + len(dropped) == len(data)


asof_sides = st.tuples(
    st.lists(st.integers(min_value=0, max_value=600), min_size=1, max_size=25),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=600),
            st.floats(min_value=0.0, max_value=10.0, allow_nan=False),
        ),
        min_size=0,
        max_size=25,
    ),
)


@given(sides=asof_sides)
@SETTINGS
def test_asof_join_matches_pandas_merge_asof(spark, sides):
    import pandas as pd

    from institutional_fx_etl_spark.operators.asof import asof_join

    left_secs, right_rows = sides
    left = spark.createDataFrame(
        [(i, T0 + timedelta(seconds=s)) for i, s in enumerate(left_secs)],
        "lid long, datetime timestamp",
    )
    right_rows = list({s: v for s, v in right_rows}.items())  # unique ts
    if right_rows:
        right = spark.createDataFrame(
            [(T0 + timedelta(seconds=s), v) for s, v in right_rows],
            "datetime timestamp, px double",
        )
    else:
        right = spark.createDataFrame([], "datetime timestamp, px double")

    got = {r["lid"]: r["px_asof"] for r in asof_join(left, right).collect()}

    lp = pd.DataFrame(
        {"lid": range(len(left_secs)),
         "datetime": [T0 + timedelta(seconds=s) for s in left_secs]}
    ).sort_values("datetime", kind="stable")
    rp = pd.DataFrame(
        right_rows and
        {"datetime": [T0 + timedelta(seconds=s) for s, _ in right_rows],
         "px": [v for _, v in right_rows]}
        or {"datetime": pd.Series(dtype="datetime64[ns]"),
            "px": pd.Series(dtype="float64")}
    ).sort_values("datetime")
    exp = pd.merge_asof(lp, rp, on="datetime", direction="backward")
    for _, row in exp.iterrows():
        g = got[row["lid"]]
        if pd.isna(row["px"]):
            assert g is None
        else:
            assert g == row["px"]


@given(rows=candle_rows)
@SETTINGS
def test_densify_strategies_agree_and_grid_gapless(spark, rows):
    data = [
        (T0 + timedelta(minutes=m), o, h, lo, c, 1.0, 0.001)
        for m, o, h, lo, c in rows
    ]
    df = spark.createDataFrame(
        data,
        "datetime timestamp, open double, high double, low double,"
        " close double, volume double, spread double",
    )
    a, _ = densify_gaps_explode(df)
    b, _ = densify_grid(df)
    ra = sorted((r.asDict() for r in a.collect()), key=lambda r: r["datetime"])
    rb = sorted((r.asDict() for r in b.collect()), key=lambda r: r["datetime"])
    assert ra == rb  # the shuffle-free strategy is value-identical

    times = [r["datetime"] for r in ra]
    assert len(times) == int((times[-1] - times[0]).total_seconds() // 60) + 1
    for r in ra:
        if r["is_flat"] == 1:
            assert r["volume"] == 0.0
            assert r["open"] == r["high"] == r["low"] == r["close"]


# candle frames with planted anomalies: occasional inversions
# (low>high), structure breaks (open/close outside [low,high]), null
# spreads and price jumps — every clean-stage predicate can fire
_candle_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=600),  # minute offset
        st.floats(min_value=0.5, max_value=2.0, allow_nan=False),  # base
        st.sampled_from(["ok", "ok", "ok", "inverted", "badoc", "jump"]),
        st.one_of(st.none(), st.floats(min_value=0.001, max_value=0.2)),
    ),
    min_size=1,
    max_size=50,
    unique_by=lambda r: r[0],
)


def _candles(spark, rows, kind_field=True):
    data = []
    for m, base, kind, sp in rows:
        o, h, l, c = base, base + 0.01, base - 0.01, base + 0.005
        if kind == "inverted":
            h, l = l, h  # low > high → F4 drop
        elif kind == "badoc":
            o = h + 0.05  # open above high → F5 fix
        elif kind == "jump":
            o = h = l = c = base * 3  # price jump → F6 spike candidate
            h, l = c + 0.01, c - 0.01
        data.append((T0 + timedelta(minutes=m), o, h, l, c, 5.0, sp))
    return spark.createDataFrame(
        data,
        "datetime timestamp, open double, high double, low double,"
        " close double, volume double, spread double",
    )


@given(t_rows=_candle_rows, m_rows=_candle_rows)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_fused_engine_equals_vanilla_on_random_series(spark, t_rows, m_rows):
    """The fused chunked engine must be BIT-IDENTICAL to the vanilla
    merge on arbitrary candle series with every anomaly class planted —
    including tiny 2-minute chunks so nearly every row sits on a chunk
    boundary and every cross-chunk carry path is exercised."""
    from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark
    from institutional_fx_etl_spark.plans.pipeline_fused import merge_fused

    tick_candles = _candles(spark, t_rows)
    m1 = _candles(spark, m_rows)

    kw = dict(spike_threshold=0.08, consensus_threshold=0.9)
    eng = HybridMergerSpark(engine="vanilla", **kw)
    want_f, want_a = eng.merge(m1, tick_candles)
    got_f, got_a = merge_fused(m1, tick_candles, chunk_seconds=120, **kw)

    def rows(df, keys):
        return sorted(
            (tuple(r) for r in df.collect()),
            key=lambda t: tuple(str(x) for x in t),
        )

    assert rows(got_f, "datetime") == rows(want_f, "datetime")
    assert rows(got_a, "reason") == rows(want_a, "reason")


_batch = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4 * 24 * 60),  # minute (4 days)
        st.floats(min_value=0.01, max_value=0.5),  # half-spread width
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda r: r[0],
)


@given(b1=_batch, b2=_batch, b3=_batch)
# r3's falsifying example, pinned: batch 3 re-delivers batch 1's tick
# (minute 2854 = Jan-3 09:34, the day's ONLY candle; m1 ends Jan-1).
# The bounded recompute used candle-only context days, found no data
# below the boundary, and regenerated the Jan-3 partition from 09:34 —
# truncating the 574 flat-bridge rows (00:00-09:33) a from-scratch
# grid carries through midnight.
@example(b1=[(2854, 0.01)], b2=[(5343, 0.333)], b3=[(2854, 0.01)])
# r4's falsifying example, pinned: batch 3 appends only Jan-4 rows, so
# the boundary stops at Jan-4 — but the W3 smoother's CENTERED ±2-row
# window means the new Jan-4 candle changes Jan-3's smoothed spreads,
# and the Jan-3 flat bridge ffills from them (smoother backreach: the
# 2 most recent data days below the boundary must be rewritten too).
@example(
    b1=[(5671, 0.49999999999999994), (5486, 0.01), (1147, 0.5),
        (1076, 0.49999999999999994), (4660, 0.010000000000000002),
        (3925, 0.3100360658994796), (4757, 0.49999999999999994),
        (128, 0.01), (3136, 0.5), (5637, 0.5),
        (4915, 0.010000000000000002)],
    b2=[(5530, 0.49999999999999994), (42, 0.01),
        (2731, 0.3333333333333333), (4739, 0.3333333333333333),
        (1636, 0.29558448897033546), (796, 0.010000000000000002)],
    b3=[(5759, 0.5), (5566, 0.5), (4368, 0.3333333333333333),
        (5747, 0.49999999999999994), (5616, 0.010000000000000002),
        (4551, 0.16239951281336343)],
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_incremental_random_batches_equal_full(spark, b1, b2, b3):
    """Three random tick batches — overlapping minutes, out-of-order
    days, spread distributions that SHIFT the global median between
    updates (drift-widening path) — must leave the incremental state
    exactly equal to a from-scratch run over the union."""
    import shutil

    from institutional_fx_etl_spark.plans.incremental import (
        IncrementalHybridPipeline,
        fresh_state_dir,
    )
    from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark

    def ticks(rows):
        data = [
            (T0 + timedelta(minutes=m), 1.0 + (m % 16) / 32 + w, 1.0 + (m % 16) / 32 - w)
            for m, w in rows
        ]
        return spark.createDataFrame(
            data, "datetime timestamp, ask double, bid double"
        )

    m1 = spark.createDataFrame(
        [
            (T0 + timedelta(minutes=m), 1.2, 1.3, 1.1, 1.25, 3.0, None)
            for m in range(0, 300, 7)
        ],
        "datetime timestamp, open double, high double, low double,"
        " close double, volume double, spread double",
    )

    state = fresh_state_dir()
    try:
        inc = IncrementalHybridPipeline(
            spark, state, spike_threshold=1e9, consensus_threshold=1e9,
            chunk_seconds=6 * 3600,
        )
        for b in (b1, b2, b3):
            inc.update(m1, ticks(b))
        got = sorted(tuple(r) for r in inc.read_final().collect())
    finally:
        shutil.rmtree(state, ignore_errors=True)

    eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=1e9)
    full, _ = eng.run(
        m1, ticks(b1).unionByName(ticks(b2)).unionByName(ticks(b3))
    )
    want = sorted(tuple(r) for r in full.collect())
    assert got == want


# each tick carries a batch assignment 0-3: exactly-once delivery (no
# tick appears in two batches) with arbitrary day order across batches
_assigned_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4 * 24 * 60),  # minute (4 days)
        st.floats(min_value=0.01, max_value=0.5),  # half-spread width
        st.integers(min_value=0, max_value=3),  # batch assignment
    ),
    min_size=4,
    max_size=40,
    unique_by=lambda r: r[0],
)


@given(rows=_assigned_rows)
# pinned: four single-tick batches delivered newest-day-first, so every
# later update's new_lo falls behind old_max (the re-delivery-shaped
# boundary path) without any duplicate ticks
@example(rows=[(5000, 0.1, 0), (100, 0.1, 1), (3000, 0.1, 2), (1500, 0.1, 3)])
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_incremental_exactly_once_out_of_order_batches(spark, rows):
    """Exactly-once delivery (each tick in exactly ONE of 4 batches),
    days arbitrarily out of order across batches: incremental state
    must equal a from-scratch run over the concatenation — the
    module-contract guarantee for the no-duplicates delivery regime."""
    import shutil

    from institutional_fx_etl_spark.plans.incremental import (
        IncrementalHybridPipeline,
        fresh_state_dir,
    )
    from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark

    def ticks(batch):
        data = [
            (T0 + timedelta(minutes=m), 1.0 + (m % 16) / 32 + w, 1.0 + (m % 16) / 32 - w)
            for m, w in batch
        ]
        return spark.createDataFrame(
            data, "datetime timestamp, ask double, bid double"
        )

    batches = [[(m, w) for m, w, i in rows if i == b] for b in range(4)]
    batches = [b for b in batches if b]  # S5 aborts on empty batches

    m1 = spark.createDataFrame(
        [
            (T0 + timedelta(minutes=m), 1.2, 1.3, 1.1, 1.25, 3.0, None)
            for m in range(0, 300, 7)
        ],
        "datetime timestamp, open double, high double, low double,"
        " close double, volume double, spread double",
    )

    state = fresh_state_dir()
    try:
        inc = IncrementalHybridPipeline(
            spark, state, spike_threshold=1e9, consensus_threshold=1e9,
            chunk_seconds=6 * 3600,
        )
        for b in batches:
            inc.update(m1, ticks(b))
        got = sorted(tuple(r) for r in inc.read_final().collect())
    finally:
        shutil.rmtree(state, ignore_errors=True)

    all_ticks = ticks([(m, w) for m, w, _ in rows])
    eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=1e9)
    full, _ = eng.run(m1, all_ticks)
    want = sorted(tuple(r) for r in full.collect())
    assert got == want


_rj_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),        # key
        st.integers(min_value=0, max_value=30_000),   # offset seconds
    ),
    min_size=1,
    max_size=60,
)


@given(rows=_rj_rows, band=st.sampled_from([60, 300, 3600]))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_banded_range_join_equals_naive_property(spark, rows, band):
    """Random event sets: the banded (key, b)∪(key, b+1) candidate
    plan must produce EXACTLY the naive quadratic BETWEEN join's pairs
    for every band width — pairs straddling band edges, duplicate
    timestamps, dense and sparse keys alike."""
    from institutional_fx_etl_spark.operators.rangejoin import banded_self_pairs

    data = [
        (i, k, T0 + timedelta(seconds=s)) for i, (k, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp"
    )
    got = sorted(
        (r.key, r.id_a, r.id_b, r.dt_sec)
        for r in banded_self_pairs(df, band_seconds=band).collect()
    )
    a = df.selectExpr(
        "user_id AS key", "event_id AS id_a", "cast(ts as double) AS ta"
    )
    b = df.selectExpr(
        "user_id AS bkey", "event_id AS id_b", "cast(ts as double) AS tb"
    )
    want = sorted(
        (r.key, r.id_a, r.id_b, r.dt_sec)
        for r in a.join(b, (a.key == b.bkey) & (a.id_a < b.id_b))
        .filter(F.abs(F.col("tb") - F.col("ta")) <= band)
        .selectExpr("key", "id_a", "id_b", "round(tb - ta, 6) AS dt_sec")
        .collect()
    )
    assert got == want


_ms_batch = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),        # symbol index
        st.integers(min_value=0, max_value=4 * 24 * 60),  # minute
        st.floats(min_value=0.01, max_value=0.5),     # half-spread
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda r: (r[0], r[1]),
)


@given(b1=_ms_batch, b2=_ms_batch, b3=_ms_batch)
@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_multisym_incremental_random_batches_equal_full(spark, b1, b2, b3):
    """Random per-symbol tick batches — uneven key activity, re-
    delivered minutes, per-key median shifts — must leave the
    partition_cols incremental state exactly equal to a from-scratch
    multisym run over the union."""
    import shutil

    from institutional_fx_etl_spark.plans.incremental import (
        IncrementalHybridPipeline,
        fresh_state_dir,
    )
    from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark

    def ticks(rows):
        data = [
            (
                f"S{s}",
                T0 + timedelta(minutes=m),
                1.0 + (m % 16) / 32 + s / 8 + w,
                1.0 + (m % 16) / 32 + s / 8 - w,
            )
            for s, m, w in rows
        ]
        return spark.createDataFrame(
            data, "symbol string, datetime timestamp, ask double, bid double"
        )

    m1 = spark.createDataFrame(
        [
            (f"S{s}", T0 + timedelta(minutes=m), 1.2, 1.3, 1.1, 1.25, 3.0, None)
            for s in (0, 1)
            for m in range(0, 200, 13)
        ],
        "symbol string, datetime timestamp, open double, high double,"
        " low double, close double, volume double, spread double",
    )

    kw = dict(spike_threshold=1e9, consensus_threshold=1e9)
    state = fresh_state_dir()
    try:
        inc = IncrementalHybridPipeline(
            spark, state, chunk_seconds=6 * 3600,
            partition_cols=("symbol",), **kw,
        )
        for b in (b1, b2, b3):
            inc.update(m1, ticks(b))
        eng = HybridMergerSpark(partition_cols=("symbol",), **kw)
        union = ticks(b1).unionByName(ticks(b2)).unionByName(ticks(b3))
        want, _ = eng.run(m1, union)
        got = inc.read_final().select(*want.columns)
        key = lambda t: (t[0], str(t[1]))
        assert sorted((tuple(r) for r in got.collect()), key=key) == sorted(
            (tuple(r) for r in want.collect()), key=key
        )
    finally:
        shutil.rmtree(state, ignore_errors=True)


# -- round-5 operators: interpolation vs pandas; packing conservation --

_interp_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=300),  # minute offset
        st.one_of(
            st.none(),
            st.floats(min_value=-5, max_value=5, allow_nan=False),
        ),
    ),
    min_size=2,
    max_size=40,
    unique_by=lambda r: r[0],
)


@given(rows=_interp_rows)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_interpolate_linear_matches_pandas_time_interp(spark, rows):
    """interpolate_linear == pandas interpolate(method='time',
    limit_area='inside') on every random gappy series (edges stay
    NULL on both sides)."""
    from institutional_fx_etl_spark.functions.windows import (
        interpolate_linear,
    )

    data = [(T0 + timedelta(minutes=m), v) for m, v in sorted(rows)]
    df = spark.createDataFrame(data, "ts timestamp, v double")
    got = {
        r["ts"]: r["f"]
        for r in df.select(
            "ts",
            interpolate_linear("v", ts_col="ts", order_cols=("ts",)).alias(
                "f"
            ),
        ).collect()
    }
    s = pd.Series(
        [v for _, v in data],
        index=pd.DatetimeIndex([t for t, _ in data]),
        dtype="float64",
    )
    expect = s.interpolate(method="time", limit_area="inside")
    for (t, _), e in zip(data, expect):
        g = got[t]
        if pd.isna(e):
            assert g is None, f"{t}: expected NULL, got {g}"
        else:
            assert g is not None and abs(g - e) < 1e-9, f"{t}: {g} != {e}"


_chunk_lists = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5000),   # doc_id
        st.integers(min_value=1, max_value=300),    # n_tokens per chunk
    ),
    min_size=1,
    max_size=80,
)


@given(chunks=_chunk_lists, seq_len=st.sampled_from([64, 256, 1000]))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_pack_chunks_conservation_properties(spark, chunks, seq_len):
    """Packing never loses or duplicates a chunk; within every shard
    the (pack_id, pack_offset) sequence is exactly the running token
    sum cut at seq_len boundaries (offset = cumsum-before mod seq_len,
    pack = cumsum-before div seq_len)."""
    from collections import defaultdict

    from institutional_fx_etl_spark.operators.text import pack_chunks

    rows = [
        (doc, i * 1000, n)  # start_tok just needs per-doc uniqueness
        for i, (doc, n) in enumerate(chunks)
    ]
    df = spark.createDataFrame(rows, "doc_id long, start_tok int, n_tokens int")
    out = pack_chunks(df, seq_len=seq_len, num_shards=8).collect()
    assert len(out) == len(rows)
    assert {(r["doc_id"], r["start_tok"]) for r in out} == {
        (d, s) for d, s, _ in rows
    }
    by_shard = defaultdict(list)
    for r in out:
        by_shard[r["shard"]].append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: (r["doc_id"], r["start_tok"]))
        cum = 0
        for r in rs:
            assert r["pack_offset"] == cum % seq_len
            assert r["pack_id"] == shard * 1099511627776 + cum // seq_len
            cum += r["n_tokens"]


@given(rows=tick_rows)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_resample_candles_equals_direct_coarse_agg(spark, rows):
    """Mergeable-OHLC property: rolling fine candles up to a coarse
    bar equals aggregating the raw ticks straight to that bar —
    open/high/low/close/volume are true partial aggregates (spread is
    excluded by contract: mean-of-means needs the sum/count partials
    the incremental engine keeps)."""
    from institutional_fx_etl_spark.operators.ohlc import (
        resample_candles,
        ticks_to_candles,
    )

    data = [
        (T0 + timedelta(seconds=s), a, b)
        for s, a, b in rows
        if a is not None and b is not None
    ]
    if not data:
        return
    ticks = spark.createDataFrame(
        data, "datetime timestamp, ask double, bid double"
    )
    fine = ticks_to_candles(ticks, window_duration="1 minute")
    rolled = resample_candles(fine, window_duration="15 minutes")
    direct = ticks_to_candles(ticks, window_duration="15 minutes").drop(
        "spread"
    )
    cols = ["datetime", "open", "high", "low", "close", "volume"]
    got = sorted(tuple(r[c] for c in cols) for r in rolled.collect())
    exp = sorted(tuple(r[c] for c in cols) for r in direct.collect())
    assert got == exp


# ---------------------------------------------------------------------
# round-7 continuation: CUSUM prefix identity and Mann-Whitney midranks
# against pure-Python sequential references on random draws
# ---------------------------------------------------------------------

cusum_values = st.lists(
    st.floats(min_value=0.0, max_value=500.0, allow_nan=False),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=cusum_values, bucket_seconds=st.sampled_from([60, 3600, 10**9]))
def test_cusum_prefix_identity_property(spark, vals, bucket_seconds):
    """Any series, any bucketing: the two-level distributed form must
    equal the sequential recursion exactly (integer micro-units)."""
    from institutional_fx_etl_spark.operators.timeseries import (
        cusum_changepoint,
    )

    target = 55.0
    rows = [
        (i, T0 + timedelta(seconds=i * 97), "g", v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = [
        r["cusum_micro"]
        for r in sorted(
            cusum_changepoint(
                df, target=target, bucket_seconds=bucket_seconds
            ).collect(),
            key=lambda r: r["id"],
        )
    ]
    s, want = 0, []
    for v in vals:
        d = int(round(v * 1_000_000)) - int(round(target * 1_000_000))
        s = max(0, s + d)
        want.append(s)
    assert got == want


mwu_samples = st.lists(
    st.floats(min_value=0.0, max_value=20.0, allow_nan=False).map(
        lambda x: round(x * 2) / 2  # force ties on a half-unit grid
    ),
    min_size=2,
    max_size=25,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=mwu_samples, b=mwu_samples)
def test_mannwhitney_midrank_property(spark, a, b):
    """Random tied samples: U from the distributed per-distinct-value
    construction must equal the midrank textbook computation."""
    from institutional_fx_etl_spark.operators.profiling import mannwhitney_u

    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    got = mannwhitney_u(df, "v", "g", "a", "b").collect()[0]

    pooled = sorted(a + b)
    # midrank of value v = average 1-based position of its tie run
    first = {}
    for i, v in enumerate(pooled):
        first.setdefault(v, i + 1)
    count = {}
    for v in pooled:
        count[v] = count.get(v, 0) + 1
    midrank = {v: first[v] + (count[v] - 1) / 2 for v in count}
    r_a = sum(midrank[v] for v in a)
    u_a = r_a - len(a) * (len(a) + 1) / 2
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert got["u_a"] == u_a
    assert got["u_b"] == len(a) * len(b) - u_a


wm_rows = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),
        st.integers(min_value=1, max_value=9),   # weight
        st.floats(min_value=0.5, max_value=99.5, allow_nan=False),
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=wm_rows)
def test_weighted_median_property(spark, rows):
    """Random weighted samples: the threshold-min window form must
    equal the textbook lower weighted median (first value whose
    cumulative weight reaches half the total, in value order)."""
    from institutional_fx_etl_spark.plans.driver_queries import REGISTRY

    data = [
        (g, i, 1, float(w), float(v))
        for i, (g, w, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "l_returnflag string, l_orderkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/lineitem.parquet")
        got = {
            r["grp"]: r["wmedian_price"]
            for r in REGISTRY["weighted_median"][0](spark, d).collect()
        }
    for g in {r[0] for r in rows}:
        sample = sorted(
            [(v, w) for (gg, w, v) in rows if gg == g]
        )
        total = sum(w for _, w in sample)
        cum = 0
        for v, w in sample:
            cum += w
            if 2 * cum >= total:
                assert got[g] == v, (g, sample)
                break


pareto_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),    # key
        st.floats(min_value=0.01, max_value=99.0, allow_nan=False),
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=pareto_rows)
def test_pareto_topshare_property(spark, rows):
    """Random value sets: k_top must be the minimal prefix (by value
    desc, key asc, cents-exact) whose share reaches 80%."""
    from institutional_fx_etl_spark.operators.profiling import (
        pareto_topshare,
    )

    df = spark.createDataFrame(
        [("g", k, v) for k, v in rows], "grp string, k long, v double"
    )
    r = pareto_topshare(df, "grp", "k", "v").collect()[0]
    per_key = {}
    for k, v in rows:
        per_key[k] = per_key.get(k, 0) + int(v * 100 + 0.5)
    ordered = sorted(per_key.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(per_key.values())
    cum, k_top = 0, 0
    for _, v in ordered:
        cum += v
        k_top += 1
        if 5 * cum >= 4 * total:
            break
    assert r["k_top"] == k_top
    assert r["n_keys"] == len(per_key)


decay_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=45),  # age in days
        st.floats(min_value=0.0, max_value=500.0, allow_nan=False),
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=decay_rows)
def test_decay_score_property(spark, rows):
    """Random (age, value) draws: the DECIMAL-summed distributed form
    must equal the micro-rounded Python reference exactly."""
    from datetime import datetime, timedelta

    from institutional_fx_etl_spark.operators.timeseries import decay_score

    as_of = datetime(2024, 2, 1)
    data = [
        (1, as_of - timedelta(days=age), float(v)) for age, v in rows
    ]
    df = spark.createDataFrame(data, "user_id long, ts timestamp, value double")
    got = decay_score(df, "user_id", "value", "ts", "2024-02-01").collect()[0]
    import math

    want = sum(
        math.floor(v / (1 << min(max(age, 0), 40)) * 1_000_000 + 0.5)
        for age, v in rows
    ) / 1_000_000
    assert got["decayed_score"] == want
    assert got["n_events"] == len(rows)


# ---------------------------------------------------------------- r11
# prefix-filter completeness (the operator's load-bearing guarantee):
# on EVERY random corpus, every pair with token-set Jaccard >= tau
# must be present with the exact score — candidates come from shared
# rare-prefix tokens only, so a missed pair would mean the pigeonhole
# bound was applied wrong
word = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta", "theta"]
)
doc_text = st.lists(word, min_size=1, max_size=8).map(" ".join)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(doc_text, min_size=2, max_size=8),
    tau=st.sampled_from([0.34, 0.5, 0.75]),
)
def test_prefix_filter_complete_on_random_corpora(spark, texts, tau):
    from institutional_fx_etl_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filter_pairs(
            df, jaccard_threshold=tau, shingle_n=None
        ).collect()
    }
    sets = {i: set(t.split()) for i, t in enumerate(texts)}
    exp = {}
    for i in sets:
        for j in sets:
            if i < j:
                jac = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
                if round(jac, 6) >= tau:
                    exp[(i, j)] = round(jac, 6)
    assert got == exp
    # the max_bucket dedup-collapse escalation contract (r11 verdict
    # task #3): when hot buckets are DUPLICATION-driven, capped ==
    # uncapped exactly. Triple every doc (exact copies — every bucket
    # is pushed over a cap sized to the distinct-set count, so the
    # collapse+expansion path carries the whole result), recompute
    # brute force over the duplicated corpus, and require exact
    # equality including duplicate-free output rows (the
    # disjoint-legs UNION ALL claim).
    dup_texts = {i: t for i, t in enumerate(texts)}
    dup_texts.update({i + 1000: t for i, t in enumerate(texts)})
    dup_texts.update({i + 2000: t for i, t in enumerate(texts)})
    ddf_in = spark.createDataFrame(
        sorted(dup_texts.items()), "doc_id bigint, text string"
    )
    cap = max(2, len({t for t in texts}))
    capped_rows = prefix_filter_pairs(
        ddf_in, jaccard_threshold=tau, shingle_n=None, max_bucket=cap
    ).collect()
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"] for r in capped_rows
    }
    dsets = {i: set(t.split()) for i, t in dup_texts.items()}
    dexp = {}
    for i in dsets:
        for j in dsets:
            if i < j:
                jac = len(dsets[i] & dsets[j]) / len(dsets[i] | dsets[j])
                if round(jac, 6) >= tau:
                    dexp[(i, j)] = round(jac, 6)
    assert capped == dexp
    assert len(capped_rows) == len(dexp)
