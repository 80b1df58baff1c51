"""Composed streaming pipeline: append-mode OHLC + stream-static
consensus join must agree with the batch consensus on closed windows."""

from datetime import datetime, timedelta

from institutional_fx_etl_spark.operators.consensus import consensus_filter
from institutional_fx_etl_spark.operators.ohlc import ticks_to_candles
from institutional_fx_etl_spark.streaming.candles import streaming_consensus_candles

T0 = datetime(2024, 1, 1, 10, 0)


def test_streaming_consensus_matches_batch_on_closed_windows(spark, tmp_path):
    ticks = [
        (T0 + timedelta(seconds=s), 1.2 + s / 1e5, 1.2 + s / 1e5 - 2e-4)
        for s in [10, 50, 70, 130, 200]
    ] + [
        # late-window sentinel: advances the watermark so earlier
        # windows close (watermark 10m → closes windows ending ≤ 10:20)
        (T0 + timedelta(minutes=30), 1.25, 1.2498),
    ]
    src = str(tmp_path / "ticks")
    spark.createDataFrame(
        ticks, "datetime timestamp, ask double, bid double"
    ).write.parquet(src)

    m1 = spark.createDataFrame(
        [
            # within consensus at 10:00
            (T0, 1.2001, 1.201, 1.199, 1.20015, 5.0, None),
            # catastrophe at 10:01 (deviates by ~0.1)
            (T0 + timedelta(minutes=1), 1.3, 1.31, 1.29, 1.3, 5.0, None),
        ],
        "datetime timestamp, open double, high double, low double,"
        " close double, volume double, spread double",
    )

    stream = spark.readStream.schema(
        "datetime timestamp, ask double, bid double"
    ).parquet(src)
    q = (
        streaming_consensus_candles(stream, m1, threshold=0.01)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("consensus_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["datetime"]: r.asDict() for r in spark.table("consensus_stream").collect()}

    # batch reference on the same ticks
    batch_candles = ticks_to_candles(spark.read.parquet(src))
    batch_kept, _ = consensus_filter(batch_candles, m1, threshold=0.01)
    batch = {r["datetime"]: r.asDict() for r in batch_kept.collect()}

    # windows closed by the final watermark (ends ≤ 10:20): 10:00-10:03
    assert T0 in got and got[T0] == batch[T0]
    assert T0 + timedelta(minutes=1) not in got       # catastrophe dropped
    assert T0 + timedelta(minutes=1) not in batch
    assert got[T0 + timedelta(minutes=2)] == batch[T0 + timedelta(minutes=2)]
    assert got[T0 + timedelta(minutes=3)] == batch[T0 + timedelta(minutes=3)]
    # the 10:30 sentinel window is still open → withheld in streaming
    assert T0 + timedelta(minutes=30) not in got
    assert T0 + timedelta(minutes=30) in batch
