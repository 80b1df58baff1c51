"""Immutable Time Grid — gap densification with flat candles
(SURVEY.md §3 stage 8; ``/root/reference/src/hybrid_merger.py:215-241``).

Every minute between the (per-partition) min and max timestamp becomes a
row; minutes with no candle become **flat candles**: OHLC all equal the
forward-filled close, volume 0, ``is_flat=1``, spread forward-filled.
Rows before the first real close keep NULL close after the ffill and are
dropped (trap T7 — pandas ``ffill`` leaves leading NaNs and the final
``dropna`` removes them).

Spark-first shape: generated spine (``sequence``+``explode``, J4) LEFT
JOIN candles, then window ffills — one join shuffle plus one window
sort, both keyed/partitioned by ``partition_cols`` at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.timeutils import time_spine
from institutional_fx_etl_spark.functions.windows import ffill
from institutional_fx_etl_spark.sources import schemas


def densify_grid(
    df: DataFrame,
    ts_col: str = "datetime",
    step: str = "1 minute",
    partition_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """Return ``(dense_candles_with_is_flat, audit_rows)``.

    Audit rows reproduce the reference's ``gap_bridged_flat`` entries
    (hybrid_merger.py:229): logged *before* filling, so their OHLCV are
    all NULL — only datetime + reason carry information.
    """
    keys = [*partition_cols, ts_col]
    spine = time_spine(df, ts_col, step, partition_cols)
    grid = spine.join(df, on=keys, how="left")

    is_gap = F.col("close").isNull()
    order = (ts_col,)

    audit = grid.filter(is_gap).select(
        F.col(ts_col).alias("datetime"),
        *[F.lit(None).cast("double").alias(c) for c in ["open", "high", "low", "close", "volume"]],
        F.lit(schemas.REASON_GAP_BRIDGED).alias("reason"),
    )

    filled_close = ffill("close", order, partition_cols)
    # spread ffill runs over the ORIGINAL spread column (gap rows NULL),
    # matching the reference's single-pass `df['spread'].ffill()` write
    # into gap rows only (hybrid_merger.py:239).
    filled_spread = ffill("spread", order, partition_cols)

    dense = (
        grid.withColumn("__gap", is_gap)
        .withColumn("close", F.when(F.col("__gap"), filled_close).otherwise(F.col("close")))
        .withColumn("open", F.when(F.col("__gap"), F.col("close")).otherwise(F.col("open")))
        .withColumn("high", F.when(F.col("__gap"), F.col("close")).otherwise(F.col("high")))
        .withColumn("low", F.when(F.col("__gap"), F.col("close")).otherwise(F.col("low")))
        .withColumn("volume", F.when(F.col("__gap"), F.lit(0.0)).otherwise(F.col("volume")))
        .withColumn("spread", F.when(F.col("__gap"), filled_spread).otherwise(F.col("spread")))
        .withColumn("is_flat", F.when(F.col("__gap"), F.lit(1)).otherwise(F.lit(0)))
        .drop("__gap")
        .filter(F.col("close").isNotNull())
    )
    return dense, audit
