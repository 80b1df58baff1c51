"""Spread repair (SURVEY.md §2.5/A5, §2.2/P9, §2.6/W3;
``/root/reference/src/hybrid_merger.py:204-211``).

After the hybrid merge, M1-sourced rows carry NULL spread. The reference
fills them with the exact median spread of the (post-consensus) tick
candles, then optionally smooths the whole column with a 5-row centered
rolling median.

Lazy-scalar pattern: the median is computed as a 1-row aggregate and
attached via a broadcast cross join — no driver-side ``.collect()``, the
whole repair stays one logical plan. Trap T6: an all-null spread column
yields a NULL median and ``coalesce(spread, NULL)`` is a no-op — exactly
pandas' ``fillna(NaN)``; an *empty* tick side fills 0 instead
(hybrid_merger.py:207-208).

Scale note (SURVEY.md §7.3): ``median`` is an exact full-sort aggregate;
at 100 TB swap ``percentile_approx(spread, 0.5)`` in — same plan shape,
sketch-based, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.windows import rolling_median_centered


def repair_spread_windowed(
    merged: DataFrame,
    tick_marker_col: str,
    smooth: bool = True,
    ts_col: str = "datetime",
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Single-pass spread repair for a merged frame that carries a
    tick-row marker column (the pipeline's fused-merge path).

    Computes the tick-side median and count as whole-partition window
    aggregates over the SAME frame instead of re-aggregating the tick
    candle subtree (which, in a lazy plan, would recompute the entire
    upstream scan→agg→join chain a second time). Exact same semantics
    as :func:`repair_spread`: median over kept tick candles' spreads,
    0.0 fill when there are no tick rows, optional W3 smoothing.
    """
    part = Window.partitionBy(*partition_cols)
    tick_spread = F.when(F.col(tick_marker_col), F.col("spread"))
    # percentile(x, 0.5) ≡ median, and (unlike median) is accepted as a
    # window function; whole-partition frame = global exact median
    median_w = F.percentile(tick_spread, 0.5).over(part)
    n_tick = F.sum(F.col(tick_marker_col).cast("int")).over(part)
    fill = F.when(n_tick == 0, F.lit(0.0)).otherwise(median_w)

    out = merged.withColumn("spread", F.coalesce(F.col("spread"), fill)).drop(
        tick_marker_col
    )
    if smooth:
        out = out.withColumn(
            "spread", rolling_median_centered("spread", (ts_col,), partition_cols)
        )
    return out


def repair_spread(
    merged: DataFrame,
    tick_candles: DataFrame,
    smooth: bool = True,
    ts_col: str = "datetime",
    partition_cols: tuple[str, ...] = (),
    exact_median: bool = True,
) -> DataFrame:
    """Fill NULL spreads with the tick-candle median spread, then
    optionally apply the centered rolling-median smoother (W3)."""
    median_fn = (
        F.median("spread") if exact_median else F.percentile_approx("spread", 0.5)
    )
    stats = tick_candles.groupBy(*partition_cols).agg(
        median_fn.alias("__median_spread"), F.count(F.lit(1)).alias("__n_tick")
    )
    fill = F.when(F.col("__n_tick") == 0, F.lit(0.0)).otherwise(
        F.col("__median_spread")
    )

    if partition_cols:
        joined = merged.join(F.broadcast(stats), on=list(partition_cols), how="left")
        # a partition absent from the tick side behaves like "ticks empty"
        fill = F.coalesce(fill, F.lit(0.0))
    else:
        joined = merged.crossJoin(F.broadcast(stats))

    out = joined.withColumn("spread", F.coalesce(F.col("spread"), fill)).drop(
        "__median_spread", "__n_tick"
    )
    if smooth:
        out = out.withColumn(
            "spread", rolling_median_centered("spread", (ts_col,), partition_cols)
        )
    return out
