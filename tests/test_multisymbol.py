"""The 100 TB design knob: ``partition_cols=('symbol',)``.

Every operator takes partition columns so a multi-asset dataset
parallelizes (per-symbol window sorts / joins / spines) instead of the
reference's single global series. These tests prove (a) a multi-symbol
run equals independent per-symbol runs, and (b) the physical plan
actually partitions the window sorts by symbol (no single-partition
Exchange)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark


def ts(s):
    return datetime.fromisoformat(s)


def make_symbol_rows(base_price: float):
    """A small tick/m1 scenario (gap + consensus mismatch included)."""
    t0 = ts("2024-01-01 10:00:00")
    ticks = [
        (t0 + timedelta(seconds=s), base_price + s / 10_000, base_price + s / 10_000 - 0.0002)
        for s in [5, 30, 70, 130, 330]  # minutes 0, 1, 2, gap, 5
    ]
    m1 = [
        (t0 - timedelta(minutes=2), base_price, base_price + 0.001, base_price - 0.001, base_price, 7.0, None),
        (t0 + timedelta(minutes=1), base_price + 1.0, base_price + 1.1, base_price + 0.9, base_price + 1.0, 3.0, None),  # catastrophe
    ]
    return ticks, m1


@pytest.fixture(scope="module")
def per_symbol_frames(spark):
    frames = {}
    for sym, base in [("EURUSD", 1.10), ("GBPJPY", 190.0)]:
        ticks, m1 = make_symbol_rows(base)
        tdf = spark.createDataFrame(ticks, "datetime timestamp, ask double, bid double")
        mdf = spark.createDataFrame(
            m1,
            "datetime timestamp, open double, high double, low double,"
            " close double, volume double, spread double",
        )
        frames[sym] = (tdf, mdf)
    return frames


def test_multisymbol_equals_per_symbol_runs(spark, per_symbol_frames):
    # independent single-symbol runs (reference semantics per symbol)
    single = {}
    for sym, (tdf, mdf) in per_symbol_frames.items():
        eng = HybridMergerSpark(spike_threshold=10.0, consensus_threshold=0.01)
        final, _ = eng.run(mdf, tdf)
        single[sym] = sorted(
            (r.asDict() for r in final.collect()), key=lambda r: r["datetime"]
        )

    # one multi-symbol run, partitioned by the symbol column
    all_ticks = None
    all_m1 = None
    for sym, (tdf, mdf) in per_symbol_frames.items():
        t = tdf.withColumn("symbol", F.lit(sym))
        m = mdf.withColumn("symbol", F.lit(sym))
        all_ticks = t if all_ticks is None else all_ticks.unionByName(t)
        all_m1 = m if all_m1 is None else all_m1.unionByName(m)

    eng = HybridMergerSpark(
        spike_threshold=10.0, consensus_threshold=0.01, partition_cols=("symbol",)
    )
    final, audit = eng.run(all_m1, all_ticks)
    rows = final.collect()

    for sym in per_symbol_frames:
        got = sorted(
            (
                {k: v for k, v in r.asDict().items() if k != "symbol"}
                for r in rows
                if r["symbol"] == sym
            ),
            key=lambda r: r["datetime"],
        )
        assert got == single[sym], f"symbol {sym} diverges from standalone run"

    # consensus audit fired for both symbols independently
    assert audit.filter(F.col("reason") == "rejected_tick_catastrophe").count() == 2


def test_multisymbol_plan_has_no_single_partition_windows(spark, per_symbol_frames):
    tdf, mdf = per_symbol_frames["EURUSD"]
    t = tdf.withColumn("symbol", F.lit("EURUSD"))
    m = mdf.withColumn("symbol", F.lit("EURUSD"))
    eng = HybridMergerSpark(partition_cols=("symbol",))
    final, _ = eng.run(m, t)
    plan = final._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, (
        "multi-symbol pipeline must partition window sorts by symbol"
    )
    assert "hashpartitioning(symbol" in plan


def test_fused_engine_multisymbol_equals_vanilla(spark, per_symbol_frames):
    """merge_fused with partition_cols must equal the vanilla multisym
    merge row-for-row — the fused engine's per-symbol chunk windows and
    carries key on the partition columns (no contract query exercises
    this path; the crossover routes multisym to vanilla by policy, but
    the capability is part of merge_fused's API)."""
    from institutional_fx_etl_spark.plans.pipeline_fused import merge_fused

    all_ticks = None
    all_m1 = None
    for sym, (tdf, mdf) in per_symbol_frames.items():
        t = tdf.withColumn("symbol", F.lit(sym))
        m = mdf.withColumn("symbol", F.lit(sym))
        all_ticks = t if all_ticks is None else all_ticks.unionByName(t)
        all_m1 = m if all_m1 is None else all_m1.unionByName(m)

    kw = dict(spike_threshold=10.0, consensus_threshold=0.01)
    eng = HybridMergerSpark(
        engine="vanilla", partition_cols=("symbol",), **kw
    )
    tick_candles = eng.resample_ticks(all_ticks)
    want, _ = eng.merge(all_m1, tick_candles)
    got, _ = merge_fused(
        all_m1,
        tick_candles,
        partition_cols=("symbol",),
        chunk_seconds=120,
        **kw,
    )
    key = lambda r: (r["symbol"], r["datetime"])  # noqa: E731
    assert sorted((r.asDict() for r in got.collect()), key=key) == sorted(
        (r.asDict() for r in want.collect()), key=key
    )
