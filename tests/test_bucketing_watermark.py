"""Scale-path mechanics: bucketed co-located joins (no shuffle) and
streaming watermark late-data policy."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from institutional_fx_etl_spark.sources.writers import write_bucketed_table
from institutional_fx_etl_spark.streaming.candles import streaming_candles

T0 = datetime(2024, 1, 1, 10, 0)


def test_bucketed_join_avoids_shuffle(spark):
    import shutil

    for t in ["b_left", "b_right"]:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v2")
    )
    write_bucketed_table(left, "b_left", ["k"], 8, sort_cols=["k"])
    write_bucketed_table(right, "b_right", ["k"], 8, sort_cols=["k"])

    # force the sort-merge path (tiny test tables would broadcast,
    # hiding the bucketing effect we're asserting)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_left").join(spark.table("b_right"), on="k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join must not shuffle"
        )
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_watermark_drops_too_late_ticks(spark, tmp_path):
    """Append-mode windowed aggregation with a 10-minute watermark:
    a window is emitted once the watermark passes its end, and a tick
    arriving after that is discarded instead of mutating history."""
    src = tmp_path / "wm"
    src.mkdir()
    schema = "datetime timestamp, ask double, bid double"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / name)
        )

    # batch 1: ticks at 10:00 and 10:20 → watermark advances to 10:10,
    # closing the 10:00 window
    write_batch("b1", [(T0, 1.2, 1.1), (T0 + timedelta(minutes=20), 1.4, 1.3)])

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src) + "/*")
    q = (
        streaming_candles(stream, watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_candles")
        .start()
    )
    try:
        q.processAllAvailable()
        emitted_1 = {
            r["datetime"]: r["volume"]
            for r in spark.table("wm_candles").collect()
        }
        assert emitted_1.get(T0) == 1.0  # 10:00 window closed and emitted
        assert T0 + timedelta(minutes=20) not in emitted_1  # still open

        # batch 2: a too-late tick for the closed 10:00 window, plus a
        # tick at 10:40 that advances the watermark past 10:20
        write_batch(
            "b2",
            [
                (T0 + timedelta(seconds=30), 9.9, 9.8),  # beyond watermark
                (T0 + timedelta(minutes=40), 1.6, 1.5),
            ],
        )
        q.processAllAvailable()
        emitted_2 = {
            r["datetime"]: r.asDict() for r in spark.table("wm_candles").collect()
        }
    finally:
        q.stop()

    # the closed 10:00 window was NOT re-emitted or mutated by the
    # too-late tick (volume still 1, price unchanged)
    assert emitted_2[T0]["volume"] == 1.0
    assert emitted_2[T0]["close"] == 1.15
    # 10:20 window emitted after the watermark passed it
    assert emitted_2[T0 + timedelta(minutes=20)]["volume"] == 1.0
