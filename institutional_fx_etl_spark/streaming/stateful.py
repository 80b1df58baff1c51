"""Custom stateful streaming operator: live gap bridging.

The batch pipeline densifies the time grid after the fact
(:func:`operators.densify.densify_gaps_explode`). A live feed needs the
same guarantee incrementally: when a candle arrives after a silence,
the missing minutes must be emitted as flat candles — which requires
remembering the last emitted candle across micro-batches. That is
exactly ``applyInPandasWithState``: per-key user state + Arrow-batched
pandas processing (SURVEY.md §2.8 notes the reference has no stateful
streaming at all — this is a scale-path extension).

State per symbol: (last minute seen, its close, its spread). On each
batch: sort the batch, bridge from state to the first row, bridge
intra-batch gaps, update state. Append output mode; no timeout (gaps
are closed by the NEXT candle, not by wall-clock — matching the batch
semantics where a trailing silence produces no rows).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output schema: the dense candle relation + is_flat
OUTPUT_SCHEMA = (
    "symbol string, datetime timestamp, open double, high double, low double,"
    " close double, volume double, spread double, is_flat int"
)

#: state: last emitted minute (epoch micros), close, spread
STATE_SCHEMA = "last_us long, last_close double, last_spread double"

_MINUTE_US = 60_000_000


def _bridge(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (symbol,) = key
    if state.exists:
        last_us, last_close, last_spread = state.get
    else:
        last_us, last_close, last_spread = None, None, None

    for pdf in batches:
        pdf = pdf.sort_values("datetime")
        out: list[dict] = []
        for row in pdf.itertuples(index=False):
            ts_us = int(row.datetime.value // 1_000)
            if last_us is not None:
                gap_us = last_us + _MINUTE_US
                while gap_us < ts_us:
                    out.append(
                        {
                            "symbol": symbol,
                            "datetime": pd.Timestamp(gap_us * 1_000),
                            "open": last_close,
                            "high": last_close,
                            "low": last_close,
                            "close": last_close,
                            "volume": 0.0,
                            "spread": last_spread,
                            "is_flat": 1,
                        }
                    )
                    gap_us += _MINUTE_US
            out.append(
                {
                    "symbol": symbol,
                    "datetime": row.datetime,
                    "open": row.open,
                    "high": row.high,
                    "low": row.low,
                    "close": row.close,
                    "volume": row.volume,
                    "spread": row.spread,
                    "is_flat": 0,
                }
            )
            last_us, last_close, last_spread = ts_us, row.close, row.spread
        if out:
            yield pd.DataFrame(out)

    state.update((last_us, last_close, last_spread))


def streaming_gap_bridge(
    candles: DataFrame, symbol_col: str = "symbol"
) -> DataFrame:
    """Bridge minute gaps in a streaming candle feed with flat candles,
    keyed (and therefore state-partitioned) by symbol."""
    return candles.groupBy(symbol_col).applyInPandasWithState(
        _bridge,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_hybrid(
    spark,
    tick_stream: DataFrame,
    m1_static: DataFrame,
    workdir: str,
    consensus_threshold: float = 0.01,
    window_duration: str = "1 minute",
    watermark: str = "10 minutes",
    symbol: str = "X",
):
    """The full hybrid pipeline as a LIVE topology: watermarked OHLC →
    stream-static consensus → stateful gap bridge.

    Spark forbids ``applyInPandasWithState`` directly after a streaming
    aggregation ("multiple stateful operators" does not cover arbitrary
    state), so this runs the SUPPORTED two-query topology: stage A
    sinks closed consensus candles to a durable parquet+checkpoint,
    stage B streams that sink through the stateful gap bridge. In
    production both queries run continuously; here they are driven to
    completion for bounded verification. Returns the bridged table name.
    """
    import os

    from pyspark.sql import functions as F

    from institutional_fx_etl_spark.streaming.candles import (
        streaming_consensus_candles,
    )

    stage_a_path = os.path.join(workdir, "consensus_candles")
    candles = streaming_consensus_candles(
        tick_stream,
        m1_static,
        threshold=consensus_threshold,
        window_duration=window_duration,
        watermark=watermark,
    ).withColumn("symbol", F.lit(symbol))
    qa = (
        candles.writeStream.outputMode("append")
        .format("parquet")
        .option("path", stage_a_path)
        .option("checkpointLocation", os.path.join(workdir, "ckpt_a"))
        .start()
    )
    try:
        qa.processAllAvailable()
    finally:
        qa.stop()

    schema = (
        "datetime timestamp, open double, high double, low double, close double,"
        " volume double, spread double, symbol string"
    )
    stage_b_src = spark.readStream.schema(schema).parquet(stage_a_path)
    qb = (
        streaming_gap_bridge(stage_b_src)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("streaming_hybrid_out")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_b"))
        .start()
    )
    try:
        qb.processAllAvailable()
    finally:
        qb.stop()
    return "streaming_hybrid_out"
