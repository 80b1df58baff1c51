"""Incremental late-data recompute (plans/incremental.py): a tick batch
must rewrite ONLY the affected day partitions, and the resulting state
must equal a from-scratch run of the full pipeline over all ticks —
including out-of-order batches that merge into existing minutes and
appends whose flat bridge spans the batch boundary.

All prices/spreads are dyadic rationals (k/16) so partial-aggregate
merges are bit-exact regardless of summation grouping.
"""

from datetime import datetime, timedelta
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from institutional_fx_etl_spark.plans.incremental import (
    IncrementalHybridPipeline,
    finalize_partials,
    merge_partials,
    tick_partials,
)
from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark

T0 = datetime(2024, 1, 1, 0, 0)  # Monday


def _ticks(spark, minutes, base=1.0, per_minute=2):
    """per_minute ticks in each given minute; dyadic prices with a
    deterministic per-minute drift."""
    rows = []
    for m in minutes:
        for k in range(per_minute):
            mid = base + (m % 64) / 16 + k / 16
            rows.append(
                (T0 + timedelta(minutes=m, seconds=10 * k), mid + 0.125, mid - 0.125)
            )
    return spark.createDataFrame(rows, "datetime timestamp, ask double, bid double")


def _m1(spark, minutes, base=1.0):
    rows = [
        (
            T0 + timedelta(minutes=m),
            base + (m % 32) / 16,
            base + (m % 32) / 16 + 0.25,
            base + (m % 32) / 16 - 0.25,
            base + (m % 32) / 16 + 0.125,
            7.0,
            None,
        )
        for m in minutes
    ]
    return spark.createDataFrame(
        rows,
        "datetime timestamp, open double, high double, low double,"
        " close double, volume double, spread double",
    )


def _collect(df):
    return sorted((r.asDict() for r in df.collect()), key=lambda r: r["datetime"])


DAY = 24 * 60


def test_partials_roundtrip_equals_single_pass(spark):
    """finalize(merge(partials(b1) ∪ partials(b2))) ≡ ticks_to_candles
    over the concatenated stream — including a minute split across
    batches and a same-timestamp tie."""
    from institutional_fx_etl_spark.operators.ohlc import ticks_to_candles

    b1 = _ticks(spark, range(0, 40))
    # batch 2 revisits minutes 20-39 with later ticks + adds 40-59
    b2 = _ticks(spark, range(20, 60), base=1.5, per_minute=3)
    merged = finalize_partials(
        merge_partials(
            tick_partials(b1).unionByName(tick_partials(b2))
        )
    )
    direct = ticks_to_candles(b1.unionByName(b2))
    assert _collect(merged) == _collect(direct)


@pytest.mark.parametrize("late", [False, True])
def test_incremental_equals_full_recompute(spark, tmp_path, late):
    """Append-only and out-of-order updates both converge to the exact
    full-pipeline state (constant spread keeps the global median
    batch-stable, so even the day partitions written by update 1 stay
    bit-identical to the from-scratch run)."""
    # days 0-2 + gap + day 4; m1 covers some minutes ticks miss
    b1_minutes = [*range(0, 200), *range(300, DAY * 2 + 300)]
    b2_minutes = [*range(DAY * 4, DAY * 4 + 400)]
    if late:
        # late ticks into existing day-1 minutes (candle rewrite)
        b2_minutes += [*range(DAY + 50, DAY + 90)]
    m1_minutes = [*range(100, 400), *range(DAY * 4 + 100, DAY * 4 + 200)]

    m1 = _m1(spark, m1_minutes)
    b1, b2 = _ticks(spark, b1_minutes), _ticks(spark, b2_minutes)

    inc = IncrementalHybridPipeline(
        spark,
        str(tmp_path / "state"),
        spike_threshold=1e9,
        consensus_threshold=1e9,
        chunk_seconds=6 * 3600,
    )
    inc.update(m1, b1)
    slice2 = inc.update(m1, b2)

    eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=1e9)
    full, _ = eng.run(m1, b1.unionByName(b2))

    got, exp = _collect(inc.read_final()), _collect(full)
    assert len(got) == len(exp)
    assert got == exp

    # the returned slice covers exactly the overwritten boundary on
    assert min(r["datetime"] for r in _collect(slice2)) <= exp[-1]["datetime"]


def test_untouched_partitions_not_rewritten(spark, tmp_path):
    """Dynamic partition overwrite: an append batch must leave day-0's
    final parquet files byte-identical (partition pruning proof)."""
    m1 = _m1(spark, range(100, 200))
    b1 = _ticks(spark, range(0, DAY + 100))
    b2 = _ticks(spark, range(DAY * 3, DAY * 3 + 100))

    inc = IncrementalHybridPipeline(
        spark, str(tmp_path / "state"), spike_threshold=1e9, consensus_threshold=1e9
    )
    inc.update(m1, b1)
    day0 = sorted(
        (p.name, p.stat().st_mtime_ns, p.stat().st_size)
        for p in (tmp_path / "state" / "final" / "d=2024-01-01").glob("*.parquet")
    )
    assert day0, "day-0 partition must exist"
    inc.update(m1, b2)
    day0_after = sorted(
        (p.name, p.stat().st_mtime_ns, p.stat().st_size)
        for p in (tmp_path / "state" / "final" / "d=2024-01-01").glob("*.parquet")
    )
    assert day0_after == day0, "append must not rewrite day-0 files"
    # while the previously-last day gained its trailing flat bridge
    assert (tmp_path / "state" / "final" / "d=2024-01-04").exists()


def test_m1_history_before_first_ticks(spark, tmp_path):
    """The reference's canonical scenario: a long legacy M1 history
    preceding the first tick batch's day. Those M1-only days must enter
    final/ exactly as a from-scratch run would include them (the r2
    version silently dropped them — the boundary derived from tick
    days only)."""
    # m1 covers day 0-1; ticks start on day 2
    m1 = _m1(spark, range(100, DAY + 400))
    b1 = _ticks(spark, range(DAY * 2, DAY * 2 + 300))
    b2 = _ticks(spark, range(DAY * 2 + 300, DAY * 2 + 500))

    inc = IncrementalHybridPipeline(
        spark, str(tmp_path / "state"), spike_threshold=1e9,
        consensus_threshold=1e9, chunk_seconds=6 * 3600,
    )
    inc.update(m1, b1)
    inc.update(m1, b2)

    eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=1e9)
    full, _ = eng.run(m1, b1.unionByName(b2))
    got, exp = _collect(inc.read_final()), _collect(full)
    assert got[0]["datetime"] == exp[0]["datetime"], "m1 head must be present"
    assert got == exp


def test_scalar_drift_widens_rewrite(spark, tmp_path):
    """Three sequential updates where the LAST batch shifts the global
    median spread (A5) — the drift check must widen the rewrite so the
    whole state still equals a from-scratch run (the r2 version only
    held under scalar-stable inputs). Includes a mid-history rewrite:
    batch 3 also revisits day-0 minutes."""
    def wide_ticks(minutes, width):
        rows = []
        for m in minutes:
            mid = 1.0 + (m % 64) / 16
            rows.append((T0 + timedelta(minutes=m), mid + width, mid - width))
        return spark.createDataFrame(
            rows, "datetime timestamp, ask double, bid double"
        )

    m1 = _m1(spark, range(0, 200))
    b1 = wide_ticks(range(0, 400), 0.125)
    b2 = wide_ticks(range(DAY, DAY + 300), 0.125)
    # batch 3: fat spreads shift the median AND rewrite day-0 minutes
    b3 = wide_ticks([*range(DAY * 2, DAY * 2 + 300), *range(50, 90)], 0.5)

    inc = IncrementalHybridPipeline(
        spark, str(tmp_path / "state"), spike_threshold=1e9,
        consensus_threshold=1e9, chunk_seconds=6 * 3600,
    )
    inc.update(m1, b1)
    inc.update(m1, b2)
    inc.update(m1, b3)

    eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=1e9)
    full, _ = eng.run(m1, b1.unionByName(b2).unionByName(b3))
    assert _collect(inc.read_final()) == _collect(full)


def test_incremental_cleaning_and_flat_bridge(spark, tmp_path):
    """Active F4/F5/F6 + a gap spanning the update boundary: crafted M1
    rows fire inverted/structure fixes, a price jump fires the spike
    drop, and the cross-batch gap bridges from recovered carry state —
    all matching the full recompute."""
    b1 = _ticks(spark, range(0, 300))
    b2 = _ticks(spark, range(DAY + 200, DAY + 500))
    # m1-only rows: one inverted (low>high), one structure-bad
    bad_m1 = spark.createDataFrame(
        [
            (T0 + timedelta(minutes=500), 2.0, 1.0, 3.0, 2.0, 5.0, None),  # inverted
            (T0 + timedelta(minutes=501), 9.0, 4.0, 3.5, 1.0, 5.0, None),  # bad open
        ],
        "datetime timestamp, open double, high double, low double,"
        " close double, volume double, spread double",
    )
    m1 = _m1(spark, range(400, 500)).unionByName(bad_m1)

    kw = dict(spike_threshold=0.25, consensus_threshold=1e9)
    inc = IncrementalHybridPipeline(
        spark, str(tmp_path / "state"), chunk_seconds=6 * 3600, **kw
    )
    inc.update(m1, b1)
    inc.update(m1, b2)

    eng = HybridMergerSpark(**kw)
    full, full_audit = eng.run(m1, b1.unionByName(b2))
    assert _collect(inc.read_final()) == _collect(full)

    got_tags = {
        (r["reason"], r["datetime"]) for r in inc.read_audit().collect()
    }
    exp_tags = {(r["reason"], r["datetime"]) for r in full_audit.collect()}
    # audit state only covers overwritten partitions per update; every
    # full-run tag on those days must be present with the same key
    assert exp_tags == got_tags


def test_redelivered_batch_keeps_bridge(spark, tmp_path):
    """Deterministic form of the r3 falsifying example: batch 3
    re-delivers batch 1's single mid-history tick, whose day holds the
    state's ONLY candles while m1 ends two days earlier. The recompute
    boundary day must keep its 00:00-onward flat bridge (the broken
    version regenerated the partition from the first candle's minute,
    truncating the pre-candle bridge rows)."""
    m1 = _m1(spark, range(0, 300))  # day 0 only
    lone = _ticks(spark, [DAY * 2 + 574])  # day 2, 09:34
    later = _ticks(spark, [DAY * 4 + 100])  # day 4

    inc = IncrementalHybridPipeline(
        spark, str(tmp_path / "state"), spike_threshold=1e9,
        consensus_threshold=1e9, chunk_seconds=6 * 3600,
    )
    inc.update(m1, lone)
    inc.update(m1, later)
    inc.update(m1, lone)  # re-delivery: union semantics, double-counts

    eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=1e9)
    full, _ = eng.run(
        m1, lone.unionByName(later).unionByName(lone)
    )
    got, exp = _collect(inc.read_final()), _collect(full)
    assert got == exp
    # the boundary day enters at midnight via the flat bridge
    day2 = [r for r in got if r["datetime"].date() == (T0 + timedelta(days=2)).date()]
    assert day2[0]["datetime"] == T0 + timedelta(days=2)


def test_m1_inspan_edit_widens_rewrite(spark, tmp_path):
    """An m1 row CHANGED on a day inside the existing span (no new tick
    on that day) must be detected by the per-day fingerprint and
    recomputed into final/ — the head-only backfill check missed it."""
    m1_v1 = _m1(spark, range(0, 300))
    b1 = _ticks(spark, range(0, 200))
    b2 = _ticks(spark, range(DAY * 2, DAY * 2 + 100))

    inc = IncrementalHybridPipeline(
        spark, str(tmp_path / "state"), spike_threshold=1e9,
        consensus_threshold=1e9, chunk_seconds=6 * 3600,
    )
    inc.update(m1_v1, b1)
    inc.update(m1_v1, b2)

    # edit day-0 m1 values (same minutes, shifted base) + backfill new
    # in-span m1 minutes on day 1 — neither day gets new ticks
    m1_v2 = _m1(spark, range(0, 300), base=2.0).unionByName(
        _m1(spark, range(DAY + 10, DAY + 50))
    )
    b3 = _ticks(spark, range(DAY * 2 + 100, DAY * 2 + 150))
    inc.update(m1_v2, b3)

    eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=1e9)
    full, _ = eng.run(m1_v2, b1.unionByName(b2).unionByName(b3))
    assert _collect(inc.read_final()) == _collect(full)


def test_m1_day_removal_raises(spark, tmp_path):
    """Removing every m1 row of a previously-seen day is outside the
    documented contract and must raise, not silently diverge."""
    inc = IncrementalHybridPipeline(
        spark, str(tmp_path / "state"), spike_threshold=1e9,
        consensus_threshold=1e9,
    )
    inc.update(_m1(spark, range(0, 300)), _ticks(spark, range(0, 100)))
    with pytest.raises(ValueError, match="m1 history shrank"):
        inc.update(
            _m1(spark, range(DAY, DAY + 100)),  # day 0 gone
            _ticks(spark, range(100, 200)),
        )


def test_no_keys_x_days_driver_ceiling(spark, tmp_path):
    """Round-5 verdict ask #3: the keys×days metadata math is
    join-based, so ``max_state_rows`` is retired — an update whose
    (key, day) state far exceeds the configured bound must run to the
    correct answer instead of fail-fasting. 8 keys × 5+ days with
    max_state_rows=10 (< 40 state rows) over two updates, compared
    against a from-scratch multisym run."""
    DAY = 24 * 60

    def _kticks(spec):
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

    syms = [f"S{i}" for i in range(8)]
    m1 = spark.createDataFrame(
        [
            (s, T0 + timedelta(minutes=m), 1.25, 1.375, 1.125, 1.25, 5.0, None)
            for s in syms
            for m in range(0, 3 * DAY, 360)
        ],
        "symbol string, datetime timestamp, open double, high double,"
        " low double, close double, volume double, spread double",
    )
    b1 = _kticks([(s, m) for s in syms for m in (30, DAY + 45, 2 * DAY + 10)])
    b2 = _kticks([(s, m) for s in syms for m in (4 * DAY + 5, 4 * DAY + 125)])

    inc = IncrementalHybridPipeline(
        spark,
        str(tmp_path / "state"),
        spike_threshold=1e9,
        consensus_threshold=1e9,
        partition_cols=("symbol",),
        max_state_rows=10,  # retired: must be ignored, not enforced
    )
    inc.update(m1, b1)
    inc.update(m1, b2)

    eng = HybridMergerSpark(
        spike_threshold=1e9,
        consensus_threshold=1e9,
        partition_cols=("symbol",),
    )
    full, _ = eng.run(m1, b1.unionByName(b2))
    got = sorted(
        (tuple(r) for r in inc.read_final().collect()),
        key=lambda t: (t[0], str(t[1])),
    )
    exp = sorted(
        (tuple(r) for r in full.collect()), key=lambda t: (t[0], str(t[1]))
    )
    assert got == exp
