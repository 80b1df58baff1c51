"""Stateful streaming gap bridge must agree with the batch densifier,
including across micro-batch boundaries (state carries the last candle)."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from institutional_fx_etl_spark.operators.densify import densify_gaps_explode
from institutional_fx_etl_spark.streaming.stateful import streaming_gap_bridge

T0 = datetime(2024, 1, 1, 10, 0)


def _candles():
    rows = []
    for sym, base in [("EURUSD", 1.1), ("USDJPY", 155.0)]:
        for m in [0, 1, 4, 5, 9]:  # gaps at 2-3 and 6-8
            rows.append(
                (sym, T0 + timedelta(minutes=m), base, base + 0.001, base - 0.001,
                 base + m / 1000, 5.0, 0.0002)
            )
    return rows


SCHEMA = (
    "symbol string, datetime timestamp, open double, high double, low double,"
    " close double, volume double, spread double"
)


def test_streaming_gap_bridge_matches_batch(spark, tmp_path):
    src = str(tmp_path / "candles")
    spark.createDataFrame(_candles(), SCHEMA).write.parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        streaming_gap_bridge(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("bridged")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r.asDict() for r in spark.table("bridged").collect()),
        key=lambda r: (r["symbol"], r["datetime"]),
    )

    batch, _ = densify_gaps_explode(
        spark.read.parquet(src), partition_cols=("symbol",)
    )
    exp = sorted(
        (r.asDict() for r in batch.collect()),
        key=lambda r: (r["symbol"], r["datetime"]),
    )
    assert len(got) == len(exp) == 2 * 10
    assert got == exp


def test_streaming_gap_bridge_state_across_batches(spark, tmp_path):
    """Two separate file drops → two micro-batches; the bridge across
    the batch boundary must come from persisted state."""
    src = tmp_path / "candles2"
    src.mkdir()
    df = spark.createDataFrame(_candles(), SCHEMA)
    first = df.filter(F.col("datetime") < T0 + timedelta(minutes=2))
    second = df.filter(F.col("datetime") >= T0 + timedelta(minutes=2))
    first.coalesce(1).write.parquet(str(src / "batch1"))

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src) + "/*")
    q = (
        streaming_gap_bridge(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("bridged2")
        .start()
    )
    try:
        q.processAllAvailable()
        second.coalesce(1).write.parquet(str(src / "batch2"))
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["symbol"], r["datetime"]): r["is_flat"]
        for r in spark.table("bridged2").collect()
    }
    # the 10:02/10:03 gap spans the two file drops: bridged from state
    assert got[("EURUSD", T0 + timedelta(minutes=2))] == 1
    assert got[("EURUSD", T0 + timedelta(minutes=3))] == 1
    assert got[("EURUSD", T0 + timedelta(minutes=4))] == 0
    assert len(got) == 2 * 10
