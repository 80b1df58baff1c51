"""Full streaming hybrid topology (OHLC → consensus → gap bridge as
two chained queries) must reproduce the batch pipeline on closed
windows."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from institutional_fx_etl_spark.operators.consensus import consensus_filter
from institutional_fx_etl_spark.operators.densify import densify_gaps_explode
from institutional_fx_etl_spark.operators.ohlc import ticks_to_candles
from institutional_fx_etl_spark.streaming.stateful import run_streaming_hybrid

T0 = datetime(2024, 1, 1, 10, 0)


def test_streaming_hybrid_matches_batch_on_closed_prefix(spark, tmp_path):
    ticks = [
        (T0 + timedelta(seconds=s), 1.2 + s / 1e5, 1.2 + s / 1e5 - 2e-4)
        for s in [10, 70, 200, 320]  # minutes 0, 1, 3, 5 (gaps at 2 and 4)
    ] + [
        (T0 + timedelta(minutes=30), 1.25, 1.2498)  # watermark sentinel
    ]
    src = str(tmp_path / "ticks")
    spark.createDataFrame(
        ticks, "datetime timestamp, ask double, bid double"
    ).write.parquet(src)

    m1 = spark.createDataFrame(
        [(T0 + timedelta(minutes=1), 1.35, 1.36, 1.34, 1.35, 2.0, None)],
        "datetime timestamp, open double, high double, low double,"
        " close double, volume double, spread double",
    )  # catastrophe at 10:01 → that tick minute must vanish

    table = run_streaming_hybrid(spark,
        spark.readStream.schema("datetime timestamp, ask double, bid double")
        .parquet(src),
        m1,
        workdir=str(tmp_path / "wk"),
    )
    got = {
        r["datetime"]: r.asDict()
        for r in spark.table(table).drop("symbol").collect()
    }

    # batch reference on the closed prefix (windows ending ≤ 10:20):
    # candles for minutes 0,3,5 survive consensus (1 rejected), then
    # gap-bridged — note the batch side here excludes the open sentinel
    batch_candles = ticks_to_candles(spark.read.parquet(src)).filter(
        F.col("datetime") < T0 + timedelta(minutes=20)
    )
    kept, _ = consensus_filter(batch_candles, m1, threshold=0.01)
    dense, _ = densify_gaps_explode(kept)
    exp = {r["datetime"]: r.asDict() for r in dense.collect()}

    assert got == exp
    # the catastrophe minute became a flat candle (its tick was dropped)
    assert got[T0 + timedelta(minutes=1)]["is_flat"] == 1
    assert got[T0 + timedelta(minutes=1)]["volume"] == 0.0


def test_single_topology_chained_stateful(spark, tmp_path):
    """Spark 4's transformWithStateInPandas allows the consensus
    aggregation → stateful gap bridge as ONE query; its python worker
    needs protobuf, absent on this image — the builder must then fail
    loudly (the two-query composition is the supported path here), and
    with protobuf present the single topology must match the batch
    prefix like the composed one does."""
    import pytest

    from institutional_fx_etl_spark.streaming.stateful import (
        _has_protobuf,
        streaming_hybrid_single_topology,
    )

    ticks = [
        (T0 + timedelta(seconds=s), 1.2 + s / 1e5, 1.2 + s / 1e5 - 2e-4)
        for s in [10, 70, 200, 320]
    ] + [(T0 + timedelta(minutes=30), 1.25, 1.2498)]
    src = str(tmp_path / "ticks")
    spark.createDataFrame(
        ticks, "datetime timestamp, ask double, bid double"
    ).write.parquet(src)
    m1 = spark.createDataFrame(
        [(T0 + timedelta(minutes=1), 1.35, 1.36, 1.34, 1.35, 2.0, None)],
        "datetime timestamp, open double, high double, low double,"
        " close double, volume double, spread double",
    )
    stream = spark.readStream.schema(
        "datetime timestamp, ask double, bid double"
    ).parquet(src)

    if not _has_protobuf():
        with pytest.raises(RuntimeError, match="protobuf"):
            streaming_hybrid_single_topology(spark, stream, m1)
        return

    # the builder no longer mutates session conf — opting in is the
    # caller's job (and it fails loudly without the RocksDB provider)
    with pytest.raises(RuntimeError, match="RocksDB"):
        streaming_hybrid_single_topology(spark, stream, m1)
    key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        out = streaming_hybrid_single_topology(spark, stream, m1)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("single_topo")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.table("single_topo").count()
        assert got > 0
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
