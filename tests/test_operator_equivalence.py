"""The pipeline's fused merge path must stay value-equivalent to the
standalone operator chain (consensus_filter → combine_first →
repair_spread) it replaced — both are public API; neither may drift."""

from datetime import datetime, timedelta

from institutional_fx_etl_spark.functions.merge import combine_first
from institutional_fx_etl_spark.operators.consensus import consensus_filter
from institutional_fx_etl_spark.operators.spread import repair_spread
from institutional_fx_etl_spark.operators.clean import validate_and_clean
from institutional_fx_etl_spark.operators.densify import densify_grid
from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark, cast_final
from institutional_fx_etl_spark.sources.schemas import CANDLE_COLS

T0 = datetime(2024, 1, 1, 10, 0)


def test_fused_merge_equals_operator_chain(spark):
    tick_candles = spark.createDataFrame(
        [
            (T0, 1.10, 1.101, 1.099, 1.100, 3.0, 0.0002),
            (T0 + timedelta(minutes=1), 1.10, 1.102, 1.099, 1.101, 2.0, 0.0003),
            # consensus mismatch vs m1 (diff > 0.01)
            (T0 + timedelta(minutes=2), 1.10, 1.103, 1.099, 1.102, 4.0, 0.0004),
            # tick-only minute after a gap
            (T0 + timedelta(minutes=5), 1.11, 1.112, 1.109, 1.111, 1.0, None),
        ],
        "datetime timestamp, open double, high double, low double,"
        " close double, volume double, spread double",
    )
    m1 = spark.createDataFrame(
        [
            # m1-only minute before tick coverage
            (T0 - timedelta(minutes=1), 1.09, 1.091, 1.089, 1.0901, 7.0, None),
            # overlapping, within consensus
            (T0 + timedelta(minutes=1), 1.10, 1.102, 1.098, 1.1005, 5.0, None),
            # catastrophe row
            (T0 + timedelta(minutes=2), 1.20, 1.21, 1.19, 1.2000, 6.0, None),
        ],
        "datetime timestamp, open double, high double, low double,"
        " close double, volume double, spread double",
    )

    # legacy chain: standalone operators, exactly the reference stages
    kept, _ = consensus_filter(tick_candles, m1, threshold=0.01)
    merged = combine_first(kept, m1, on=["datetime"], cols=CANDLE_COLS)
    repaired = repair_spread(merged, kept, smooth=True)
    clean, _ = validate_and_clean(repaired, spike_threshold=1e9)
    dense, _ = densify_grid(clean)
    legacy = sorted(
        (r.asDict() for r in cast_final(dense).collect()),
        key=lambda r: r["datetime"],
    )

    # fused path
    eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=0.01)
    final, _ = eng.merge(m1, tick_candles)
    fused = sorted(
        (r.asDict() for r in final.collect()), key=lambda r: r["datetime"]
    )

    assert fused == legacy
    # sanity: the catastrophe minute resolved to the m1 close
    row = next(r for r in fused if r["datetime"] == T0 + timedelta(minutes=2))
    assert abs(row["close"] - 1.2) < 1e-6
