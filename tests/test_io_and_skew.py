"""IO round-trips (partitioned parquet sink + partition pruning on
re-read), the salted-join helper, and the CLI entry point."""

import subprocess
import sys

from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.skew import salt_join
from institutional_fx_etl_spark.sources.writers import write_parquet


def test_partitioned_parquet_roundtrip_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(s, i, float(i)) for s in ["EURUSD", "USDJPY"] for i in range(10)],
        "symbol string, i int, v double",
    )
    out = str(tmp_path / "part")
    write_parquet(df, out, partition_by=["symbol"])

    back = spark.read.parquet(out).filter(F.col("symbol") == "EURUSD")
    assert back.count() == 10
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at the source, not post-scan
    assert "PartitionFilters: [isnotnull(symbol" in plan


def test_salt_join_matches_plain_join(spark):
    # skewed large side: one hot key with most rows
    large = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(k, 0) for k in range(2, 12)],
        "k int, payload int",
    )
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 8)], "k int, name string"
    )
    plain = sorted(
        (r["k"], r["payload"], r["name"])
        for r in large.join(small, on="k").collect()
    )
    salted = sorted(
        (r["k"], r["payload"], r["name"])
        for r in salt_join(large, small, on=["k"], factor=4).collect()
    )
    assert salted == plain
    assert len(salted) == 500 + 6  # hot key + keys 2..7


def test_cli_end_to_end(tmp_path):
    m1 = tmp_path / "m1.csv"
    ticks = tmp_path / "ticks.csv"
    m1.write_text(
        "Date,Time,Open,High,Low,Close,TickVol\n"
        "2024.01.01,09:58:00,1.1990,1.1995,1.1985,1.1992,10\n"
    )
    ticks.write_text(
        "datetime,ask,bid,av,bv\n"
        "2024-01-01 10:00:05,1.2002,1.2000,1,1\n"
        "2024-01-01 10:02:40,1.2004,1.2002,1,1\n"
    )
    out = tmp_path / "out.csv"
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "institutional_fx_etl_spark",
            str(m1),
            str(ticks),
            str(out),
            "--spike-threshold",
            "10.0",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "rows_written=5" in proc.stdout  # 09:58..10:02 inclusive
    assert "audit.gap_bridged_flat=2" in proc.stdout  # 09:59 and 10:01
    assert (out / "_SUCCESS").exists()

    # the same run forced through the fused engine must emit identical
    # counts (the --engine flag is the crossover's manual override)
    out2 = tmp_path / "out_fused.csv"
    proc2 = subprocess.run(
        [
            sys.executable,
            "-m",
            "institutional_fx_etl_spark",
            str(m1),
            str(ticks),
            str(out2),
            "--spike-threshold",
            "10.0",
            "--engine",
            "fused",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert "rows_written=5" in proc2.stdout
    assert "audit.gap_bridged_flat=2" in proc2.stdout
    body = sorted((out / "part-00000-" ).parent.glob("part*.csv"))
    body2 = sorted((out2 / "part-00000-").parent.glob("part*.csv"))
    text_a = "".join(p.read_text() for p in body)
    text_b = "".join(p.read_text() for p in body2)
    assert text_a == text_b, "fused CLI output differs from vanilla"
