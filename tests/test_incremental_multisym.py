"""Multi-asset incremental recompute: with ``partition_cols`` the
state must equal a from-scratch multisym run after every update —
uneven per-symbol activity (one symbol appends while another idles),
re-delivered batches, and symbols absent from a batch entirely.

All prices are dyadic rationals (k/16) so partial-aggregate merges are
bit-exact regardless of summation grouping.
"""

import shutil

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from institutional_fx_etl_spark.plans.incremental import (
    IncrementalHybridPipeline,
    fresh_state_dir,
)
from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark

T0 = datetime(2024, 1, 1, 0, 0)  # Monday
DAY = 24 * 60


def _ticks(spark, spec):
    """spec: list of (symbol, minute) — two dyadic-priced ticks per
    minute so every minute has real OHLC structure."""
    rows = []
    for sym, m in spec:
        for k in range(2):
            mid = 1.0 + (m % 64) / 16 + k / 16 + (hash(sym) % 4) / 16
            rows.append(
                (
                    sym,
                    T0 + timedelta(minutes=m, seconds=10 * k),
                    mid + 0.125,
                    mid - 0.125,
                )
            )
    return spark.createDataFrame(
        rows, "symbol string, datetime timestamp, ask double, bid double"
    )


def _m1(spark, spec):
    rows = [
        (
            sym,
            T0 + timedelta(minutes=m),
            1.25,
            1.375,
            1.125,
            1.25 + (m % 16) / 16,
            5.0,
            None,
        )
        for sym, m in spec
    ]
    return spark.createDataFrame(
        rows,
        "symbol string, datetime timestamp, open double, high double,"
        " low double, close double, volume double, spread double",
    )


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: (t[0], str(t[1])),
    )


def test_multisym_incremental_equals_from_scratch(spark):
    """Three updates over two symbols — A appends and re-delivers, B
    idles then appends far past its own end — must leave the state
    equal to a from-scratch multisym run over the union after EVERY
    update."""
    m1 = _m1(
        spark,
        [("A", m) for m in range(0, 240, 7)]
        + [("B", m) for m in range(0, 180, 11)],
    )
    b1 = _ticks(
        spark,
        [("A", m) for m in (300, 420, DAY + 95, DAY + 200)]
        + [("B", m) for m in (250, 400)],
    )
    # A: re-delivery of an existing minute + a new day; B absent
    b2 = _ticks(
        spark, [("A", m) for m in (300, 2 * DAY + 30, 2 * DAY + 31)]
    )
    # B: appends two days past its own end; A absent
    b3 = _ticks(spark, [("B", m) for m in (3 * DAY + 10, 3 * DAY + 700)])

    kw = dict(spike_threshold=1e9, consensus_threshold=1e9)
    eng = HybridMergerSpark(partition_cols=("symbol",), **kw)

    state = fresh_state_dir()
    try:
        inc = IncrementalHybridPipeline(
            spark,
            state,
            chunk_seconds=6 * 3600,
            partition_cols=("symbol",),
            **kw,
        )
        delivered = None
        for batch in (b1, b2, b3):
            inc.update(m1, batch)
            delivered = (
                batch if delivered is None else delivered.unionByName(batch)
            )
            want, _ = eng.run(m1, delivered)
            got = inc.read_final().select(*want.columns)
            assert _rows(got) == _rows(want)
    finally:
        shutil.rmtree(state, ignore_errors=True)


def test_multisym_scalar_drift_is_per_symbol(spark):
    """A batch that shifts only symbol A's median spread must still
    leave symbol B's output equal to the from-scratch run (B's fills
    keep B's scalars; A's span rewrites with A's new median)."""
    m1 = _m1(spark, [("A", m) for m in range(0, 100, 9)]
             + [("B", m) for m in range(0, 100, 9)])
    b1 = _ticks(
        spark,
        [("A", 200), ("A", 300), ("B", 200), ("B", 300)],
    )

    # wide-spread A ticks: shifts A's global median, not B's
    rows = [
        (
            "A",
            T0 + timedelta(minutes=DAY + 40, seconds=10 * k),
            2.0 + k / 16 + 0.5,
            2.0 + k / 16 - 0.5,
        )
        for k in range(2)
    ]
    b2 = spark.createDataFrame(
        rows, "symbol string, datetime timestamp, ask double, bid double"
    )

    kw = dict(spike_threshold=1e9, consensus_threshold=1e9)
    eng = HybridMergerSpark(partition_cols=("symbol",), **kw)
    state = fresh_state_dir()
    try:
        inc = IncrementalHybridPipeline(
            spark,
            state,
            chunk_seconds=6 * 3600,
            partition_cols=("symbol",),
            **kw,
        )
        inc.update(m1, b1)
        inc.update(m1, b2)
        want, _ = eng.run(m1, b1.unionByName(b2))
        got = inc.read_final().select(*want.columns)
        assert _rows(got) == _rows(want)
    finally:
        shutil.rmtree(state, ignore_errors=True)


def test_per_key_state_partitioning_equals_and_prunes(spark):
    """ROADMAP §19 per-key day partitioning: with
    ``partition_state_by_key=True`` the state lays out as
    (symbol, d) partitions, updates rewrite ONLY changed keys'
    partitions (B's files untouched by an A-only batch), and the final
    state still equals a from-scratch multisym run."""
    import os

    kw = dict(spike_threshold=1e9, consensus_threshold=1e9)
    eng = HybridMergerSpark(partition_cols=("symbol",), **kw)
    m1 = _m1(
        spark,
        [("A", m) for m in range(0, 240, 7)]
        + [("B", m) for m in range(0, 180, 11)],
    )
    b1 = _ticks(spark, [("A", 300), ("A", 420), ("B", 250), ("B", 400)])
    b2 = _ticks(spark, [("A", DAY + 95), ("A", DAY + 200)])  # A only

    state = fresh_state_dir()
    try:
        inc = IncrementalHybridPipeline(
            spark,
            state,
            chunk_seconds=6 * 3600,
            partition_cols=("symbol",),
            partition_state_by_key=True,
            **kw,
        )
        inc.update(m1, b1)
        final_dir = os.path.join(state, "final")
        assert any(
            e.startswith("symbol=") for e in os.listdir(final_dir)
        ), "state must be partitioned by key first"

        def _mtimes(sym):
            out = {}
            for root, _, files in os.walk(
                os.path.join(final_dir, f"symbol={sym}")
            ):
                for f in files:
                    if f.endswith(".parquet"):
                        p = os.path.join(root, f)
                        out[p] = os.path.getmtime(p)
            return out

        b_before = _mtimes("B")
        inc.update(m1, b2)  # touches A only
        assert _mtimes("B") == b_before, (
            "an A-only batch must not rewrite B's partitions"
        )

        want, _ = eng.run(m1, b1.unionByName(b2))
        got = inc.read_final().select(*want.columns)
        assert _rows(got) == _rows(want)
    finally:
        shutil.rmtree(state, ignore_errors=True)
