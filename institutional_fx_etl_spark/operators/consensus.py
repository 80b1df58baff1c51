"""Consensus Protocol — cross-source validation (SURVEY.md §2.3/F7,
§2.4/J1+J2; ``/root/reference/src/hybrid_merger.py:184-197``).

The reference aligns M1 onto the tick-candle key set (J1), flags minutes
whose closes deviate by more than ``threshold`` (100 pips by default),
and drops those minutes from the tick side (J2), trusting the legacy M1
source ("catastrophic tick" rejection).

Spark-first shape: ONE left join + a null-safe flag column, consumed
twice (kept rows / audit rows) — instead of the reference's
join-then-anti-join, which would be a second shuffle. A minute with no
M1 row has NULL deviation → pandas ``NaN > θ`` is False → the minute
survives; ``is_true`` reproduces that (trap T1 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.nullsafe import is_true
from institutional_fx_etl_spark.sources import schemas


def consensus_filter(
    tick_candles: DataFrame,
    m1: DataFrame,
    threshold: float = 0.01,
    ts_col: str = "datetime",
    partition_cols: tuple[str, ...] = (),
    broadcast_m1: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Return ``(kept_tick_candles, audit_rows)``.

    ``broadcast_m1=True`` hints the join when the legacy source is small
    relative to the tick candles (per-symbol M1 history usually is);
    otherwise AQE picks the strategy.
    """
    keys = [*partition_cols, ts_col]
    m1_close = m1.select(*keys, F.col("close").alias("__m1_close"))
    if broadcast_m1:
        m1_close = F.broadcast(m1_close)

    joined = tick_candles.join(m1_close, on=keys, how="left")
    catastrophe = is_true(
        F.abs(F.col("close") - F.col("__m1_close")) > F.lit(threshold)
    )

    kept = joined.filter(~catastrophe).drop("__m1_close")
    audit = (
        joined.filter(catastrophe)
        .select(
            F.col(ts_col).alias("datetime"),
            *[F.col(c).cast("double") for c in ["open", "high", "low", "close", "volume"]],
            F.lit(schemas.REASON_REJECTED_CATASTROPHE).alias("reason"),
        )
    )
    return kept, audit
