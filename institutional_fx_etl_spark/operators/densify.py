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


def densify_gaps_explode(
    df: DataFrame,
    ts_col: str = "datetime",
    step: str = "1 minute",
    partition_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """Shuffle-free grid densification — the pipeline's scale path.

    Instead of generating a spine and joining (an aggregation pass plus
    a join shuffle plus two grid-wide ffill windows), each real candle
    *emits its own gap rows*: ``lead(datetime)`` finds the next candle,
    ``explode(sequence(ts, next−step, step))`` generates the in-between
    minutes, and every generated flat candle inherits the current row's
    close (which IS the forward-filled value — a gap row's predecessor
    is by construction the last real candle). One window sort (shared
    with the upstream cleaning windows — same ordering), zero joins.

    Equivalent to :func:`densify_grid` because the grid spans min..max
    of the observed data, so every gap minute has a preceding real row.
    Leading-null close rows (trap T7) cannot arise: the grid starts at
    the first real candle.

    Returns ``(dense, audit)`` like :func:`densify_grid`.
    """
    from institutional_fx_etl_spark.functions.windows import ordered_window

    w = ordered_window((ts_col,), partition_cols)
    spread_f = ffill("spread", (ts_col,), partition_cols)
    step_expr = f"interval {step}"

    exploded = (
        df.withColumn("__next_ts", F.lead(ts_col).over(w))
        .withColumn("__spread_f", spread_f)
        .select(
            *partition_cols,
            "open",
            "high",
            "low",
            "close",
            "volume",
            "spread",
            "__spread_f",
            F.col(ts_col).alias("__real_ts"),
            F.explode(
                F.expr(
                    f"sequence({ts_col}, coalesce(__next_ts - {step_expr},"
                    f" {ts_col}), {step_expr})"
                )
            ).alias(ts_col),
        )
    )
    is_gap = F.col(ts_col) != F.col("__real_ts")

    audit = exploded.filter(is_gap).select(
        F.col(ts_col).alias("datetime"),
        *[
            F.lit(None).cast("double").alias(c)
            for c in ["open", "high", "low", "close", "volume"]
        ],
        F.lit(schemas.REASON_GAP_BRIDGED).alias("reason"),
    )

    dense = exploded.select(
        *partition_cols,
        ts_col,
        *[
            F.when(is_gap, F.col("close")).otherwise(F.col(c)).alias(c)
            for c in ["open", "high", "low"]
        ],
        F.col("close"),
        F.when(is_gap, F.lit(0.0)).otherwise(F.col("volume")).alias("volume"),
        F.when(is_gap, F.col("__spread_f")).otherwise(F.col("spread")).alias("spread"),
        F.when(is_gap, F.lit(1)).otherwise(F.lit(0)).alias("is_flat"),
    ).filter(F.col("close").isNotNull())
    return dense, audit


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
