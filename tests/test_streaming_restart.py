"""Restart/recovery for the checkpointed streaming composition
(ROADMAP #3 / round-1 verdict #5): the gap-bridge state must survive a
full query stop + restart from its checkpoint, bridging a gap that
SPANS the restart boundary exactly like an uninterrupted run — this is
the test that makes the two-query checkpointed topology a supported
design rather than a demo."""

from datetime import datetime, timedelta

from institutional_fx_etl_spark.operators.densify import densify_gaps_explode
from institutional_fx_etl_spark.streaming.stateful import streaming_gap_bridge

T0 = datetime(2024, 1, 1, 10, 0)

SCHEMA = (
    "symbol string, datetime timestamp, open double, high double, low double,"
    " close double, volume double, spread double"
)


def _rows(minutes, base=1.1):
    return [
        ("EURUSD", T0 + timedelta(minutes=m), base, base + 0.001,
         base - 0.001, base + m / 1000, 5.0, 0.0002)
        for m in minutes
    ]


def _run_bridge_once(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        streaming_gap_bridge(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_gap_bridge_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # phase 1: minutes 0-4, then STOP the query entirely
    spark.createDataFrame(_rows([0, 1, 2, 3, 4]), SCHEMA).write.parquet(src)
    _run_bridge_once(spark, src, out, ckpt)

    # phase 2: minutes 8-9 arrive AFTER the restart — the 5-7 gap spans
    # the outage and must be bridged from recovered state (close of m4)
    spark.createDataFrame(_rows([8, 9]), SCHEMA).write.parquet(
        src, mode="append"
    )
    _run_bridge_once(spark, src, out, ckpt)

    got = sorted(
        (r.asDict() for r in spark.read.parquet(out).collect()),
        key=lambda r: r["datetime"],
    )
    assert [r["datetime"].minute for r in got] == list(range(10))
    flats = [r for r in got if r["is_flat"] == 1]
    assert [r["datetime"].minute for r in flats] == [5, 6, 7]
    m4_close = 1.1 + 4 / 1000
    assert all(
        r["open"] == r["high"] == r["low"] == r["close"] == m4_close
        and r["volume"] == 0.0
        for r in flats
    ), "bridge must fill from the pre-restart close"

    # and the whole stream equals the batch densifier over the full input
    batch, _ = densify_gaps_explode(
        spark.read.parquet(src), partition_cols=("symbol",)
    )
    exp = sorted((r.asDict() for r in batch.collect()), key=lambda r: r["datetime"])
    cols = ["symbol", "datetime", "open", "high", "low", "close", "volume", "spread"]
    assert [{c: r[c] for c in cols} for r in got] == [
        {c: r[c] for c in cols} for r in exp
    ]
