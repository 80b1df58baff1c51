"""Structured Streaming tick→candle aggregation (SURVEY.md §7 optional
extension: the reference's A1 stage is exactly a tumbling-window
streaming aggregation).

The batch operator (:func:`operators.ohlc.ticks_to_candles`) and this
streaming one share semantics: left-closed tumbling windows,
deterministic min_by/max_by open/close, count-based volume, mean
spread. With a watermark, late ticks inside the allowed lateness still
update their minute; beyond it the window closes — the policy the
batch reference never needed (closed historical data) but a live feed
does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_candles(
    ticks: DataFrame,
    ts_col: str = "datetime",
    window_duration: str = "1 minute",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Streaming tumbling OHLC aggregation. ``ticks`` must be a
    streaming DataFrame with (ts, ask, bid). ``watermark=None`` →
    complete-mode aggregation (no state eviction — bounded inputs
    only); with a watermark → append mode with late-data handling."""
    enriched = ticks.select(
        F.col(ts_col).alias("__ts"),
        ((F.col("ask") + F.col("bid")) / 2).alias("__mid"),
        (F.col("ask") - F.col("bid")).alias("__spread"),
        F.col("ask").alias("__ask"),
    )
    if watermark is not None:
        enriched = enriched.withWatermark("__ts", watermark)
    tiebreak = F.when(
        F.col("__mid").isNotNull(), F.struct(F.col("__ts"), F.col("__mid"))
    )
    agg = enriched.groupBy(F.window("__ts", window_duration).alias("__w")).agg(
        F.min_by("__mid", tiebreak).alias("open"),
        F.max("__mid").alias("high"),
        F.min("__mid").alias("low"),
        F.max_by("__mid", tiebreak).alias("close"),
        F.count("__ask").alias("__n"),
        F.avg("__spread").alias("spread"),
    )
    return agg.select(
        F.col("__w.start").alias(ts_col),
        "open",
        "high",
        "low",
        "close",
        F.col("__n").cast("double").alias("volume"),
        "spread",
    )


def streaming_consensus_candles(
    tick_stream: DataFrame,
    m1_static: DataFrame,
    threshold: float = 0.01,
    window_duration: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Composed streaming pipeline: watermarked tumbling OHLC (append
    mode — windows emit once closed) → stream-static LEFT join against
    the legacy M1 candles → null-safe consensus rejection. The
    streaming twin of the pipeline's fused merge stage: a live feed
    whose catastrophic minutes are dropped as they close.

    Stream-static joins after an append-mode aggregation are stateless
    on the static side — no extra watermark/state cost beyond the
    aggregation's own.
    """
    candles = streaming_candles(
        tick_stream, window_duration=window_duration, watermark=watermark
    )
    m1_close = m1_static.select(
        F.col("datetime"), F.col("close").alias("__m1_close")
    )
    joined = candles.join(m1_close, on="datetime", how="left")
    catastrophe = F.coalesce(
        F.abs(F.col("close") - F.col("__m1_close")) > F.lit(threshold),
        F.lit(False),
    )
    return joined.filter(~catastrophe).drop("__m1_close")


def run_bounded_stream(
    spark: SparkSession,
    parquet_path: str,
    table_name: str = "stream_candles",
    window_duration: str = "1 hour",
) -> DataFrame:
    """Drive the streaming aggregation over a bounded parquet source to
    completion (memory sink, complete mode) and return the result as a
    batch DataFrame — the smoke path that lets the DuckDB oracle check
    streaming semantics against the batch SQL.

    The events table's TIMESTAMP(NANOS) column streams as LongType
    (nanosAsLong, see readers.load_table) and is converted identically.
    """
    import os

    from institutional_fx_etl_spark.sources.readers import read_parquet_nanos_safe

    static = read_parquet_nanos_safe(spark, parquet_path)
    # the file stream source requires a directory basePath; point it at
    # the parent dir with a glob filter for the one table file
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", os.path.basename(parquet_path))
        .parquet(os.path.dirname(parquet_path))
    )
    # same dtype guard as readers.load_table: nanos columns scan as
    # LongType and need the ns→us integer division; a testdata
    # generation that writes timestamp[us] directly (current driver)
    # streams as a timestamp already
    ts_expr = (
        F.expr("timestamp_micros(ts div 1000)")
        if dict(static.dtypes).get("ts") == "bigint"
        else F.col("ts")
    )
    ticks = stream.select(
        ts_expr.alias("datetime"),
        (F.col("value") + 0.01).alias("ask"),
        (F.col("value") - 0.01).alias("bid"),
    )
    candles = streaming_candles(
        ticks, window_duration=window_duration, watermark=None
    )
    q = (
        candles.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # materialize: the memory table lives in the session; filter the
    # same null-close guard the batch operator applies
    return spark.table(table_name).filter(F.col("close").isNotNull())


def run_stream_static_enrich(
    spark: SparkSession,
    events_path: str,
    customer_df: DataFrame,
    table_name: str = "stream_enriched",
    window_duration: str = "1 hour",
) -> DataFrame:
    """Stream-static enrichment — the canonical streaming join shape
    Spark executes WITHOUT state: each micro-batch broadcast-joins the
    static dimension (no watermark, no stream-stream buffering, the
    static side is simply re-planned per batch), then a tumbling
    windowed aggregate rolls the enriched stream up per (segment,
    window). Driven to completion over the bounded source so the
    DuckDB oracle can check the result against the equivalent batch
    join+aggregate. At scale the static side is a broadcast (or a
    storage-partitioned join for big dims); the stream side never
    shuffles before the windowed aggregate."""
    import os

    from institutional_fx_etl_spark.sources.readers import (
        read_parquet_nanos_safe,
    )

    static = read_parquet_nanos_safe(spark, events_path)
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", os.path.basename(events_path))
        .parquet(os.path.dirname(events_path))
    )
    ts_expr = (
        F.expr("timestamp_micros(ts div 1000)")
        if dict(static.dtypes).get("ts") == "bigint"
        else F.col("ts")
    )
    dim = customer_df.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = (
        stream.select(
            ts_expr.alias("ts"), "user_id", "value"
        )
        .join(F.broadcast(dim), "user_id")
    )
    agg = (
        enriched.groupBy(
            F.window("ts", window_duration).alias("__w"), "c_mktsegment"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            "c_mktsegment",
            "n_events",
            "avg_value",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(table_name)
