"""Streaming → incremental-state integration: a file-source tick
stream ingested micro-batch-by-micro-batch through ``foreachBatch``
must leave the day-partitioned state equal to a from-scratch batch run
over every delivered tick (the incremental engine's union contract,
now holding across Structured Streaming's batch boundaries)."""

from datetime import datetime, timedelta

from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark
from institutional_fx_etl_spark.streaming.stateful import (
    run_streaming_ingest,
)

T0 = datetime(2024, 1, 1, 0, 0)  # Monday
DAY = 24 * 60


def _tick_rows(minutes, base=1.0, per_minute=2):
    rows = []
    for m in minutes:
        for k in range(per_minute):
            mid = base + (m % 64) / 16 + k / 16
            rows.append(
                (
                    T0 + timedelta(minutes=m, seconds=10 * k),
                    mid + 0.125,
                    mid - 0.125,
                )
            )
    return rows


def test_streaming_ingest_equals_batch_run(spark, tmp_path):
    schema = "datetime timestamp, ask double, bid double"
    src = tmp_path / "ticks"
    src.mkdir()
    # three files -> three micro-batches (maxFilesPerTrigger=1):
    # initial history, append past the end, late out-of-order rewrite
    batches = [
        _tick_rows(range(0, 300)),
        _tick_rows(range(DAY, DAY + 200)),
        _tick_rows(range(100, 140), base=1.5, per_minute=3),  # late
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    # register the batch directories as one file-source stream
    for i in range(len(batches)):
        for p in (src / f"b{i}").glob("*.parquet"):
            p.rename(src / f"{i}_{p.name}")

    m1 = spark.createDataFrame(
        [
            (
                T0 + timedelta(minutes=m),
                1.2,
                1.45,
                0.95,
                1.25,
                7.0,
                None,
            )
            for m in range(150, 400)
        ],
        "datetime timestamp, open double, high double, low double,"
        " close double, volume double, spread double",
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    query, pipeline = run_streaming_ingest(
        spark,
        stream,
        m1,
        str(tmp_path / "state"),
        spike_threshold=1e9,
        consensus_threshold=1e9,
        chunk_seconds=6 * 3600,
    )
    query.awaitTermination(300)

    all_ticks = spark.createDataFrame(
        [r for rows in batches for r in rows], schema
    )
    eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=1e9)
    full, _ = eng.run(m1, all_ticks)

    got = sorted(
        (r.asDict() for r in pipeline.read_final().collect()),
        key=lambda r: r["datetime"],
    )
    exp = sorted(
        (r.asDict() for r in full.collect()), key=lambda r: r["datetime"]
    )
    assert len(got) == len(exp)
    assert got == exp

    # --- redelivery idempotency (round-5 advice, medium): wipe the
    # streaming checkpoint so Spark redelivers every file with the SAME
    # batch_ids. The _last_batch_id marker in the state dir must make
    # _ingest skip them all — before the fix this double-applied every
    # tick permanently.
    import shutil

    shutil.rmtree(str(tmp_path / "state" / "_checkpoint"))
    query2, pipeline2 = run_streaming_ingest(
        spark,
        stream,
        m1,
        str(tmp_path / "state"),
        spike_threshold=1e9,
        consensus_threshold=1e9,
        chunk_seconds=6 * 3600,
    )
    query2.awaitTermination(300)
    again = sorted(
        (r.asDict() for r in pipeline2.read_final().collect()),
        key=lambda r: r["datetime"],
    )
    assert again == exp, "redelivered batches must be skipped, not re-applied"


def test_batch_marker_roundtrip(spark, tmp_path):
    from institutional_fx_etl_spark.streaming.stateful import (
        _read_marker,
        _write_marker,
    )

    marker = str(tmp_path / "state" / "_last_batch_id")
    assert _read_marker(spark, marker) is None
    _write_marker(spark, marker, 0)
    assert _read_marker(spark, marker) == 0
    _write_marker(spark, marker, 17)
    assert _read_marker(spark, marker) == 17
