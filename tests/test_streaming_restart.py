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


def test_dedup_table_state_survives_restart(spark, tmp_path):
    """The streaming exact-dedup table (complete-mode hash → min id,
    count) must recover its state across a full stop + restart: a
    duplicate of a PRE-restart document arriving after the restart
    must still merge into the original group (keep_id = the old min,
    n_dups incremented), exactly as an uninterrupted run would."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "docs_in")
    ckpt = str(tmp_path / "dedup_ckpt")
    doc_schema = "doc_id long, text string"

    def run_once():
        stream = spark.readStream.schema(doc_schema).parquet(src)
        q = (
            stream.selectExpr("md5(text) AS text_hash", "doc_id")
            .groupBy("text_hash")
            .agg(
                F.expr("MIN(doc_id) AS keep_id"),
                F.expr("COUNT(1) AS n_dups"),
            )
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("dedup_restart_t")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return {
            r["text_hash"]: (r["keep_id"], r["n_dups"])
            for r in spark.table("dedup_restart_t").collect()
        }

    # phase 1: two distinct docs
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], doc_schema
    ).write.parquet(src)
    t1 = run_once()
    assert len(t1) == 2

    # phase 2 AFTER restart: a dup of doc 1 (higher id) + a new doc
    spark.createDataFrame(
        [(7, "alpha beta"), (8, "epsilon")], doc_schema
    ).write.parquet(src, mode="append")
    t2 = run_once()
    assert len(t2) == 3
    import hashlib

    h1 = hashlib.md5(b"alpha beta").hexdigest()
    assert t2[h1] == (1, 2)  # old min survives the outage, count grew
    h2 = hashlib.md5(b"gamma delta").hexdigest()
    assert t2[h2] == (2, 1)
