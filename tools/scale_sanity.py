"""Reference-scale sanity run (BASELINE.md: the reference's published
run produced 8,213,517 one-minute candles from ~15 years of GBP/USD
ticks; 29.03% of the timeline was gap-bridged).

Generates a deterministic synthetic 15-year tick stream (~30M ticks,
with session gaps so a realistic share of minutes is flat-bridged) and
a sparser legacy M1 history entirely ON THE EXECUTORS (spark.range —
no driver-side data), runs the full hybrid pipeline, and reports row
counts + wall time. This is the "would it still work at reference
scale" proof, not a micro-benchmark.

Usage: python tools/scale_sanity.py [n_ticks_millions]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from institutional_fx_etl_spark import get_spark
from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark

YEARS = 15
MINUTES = YEARS * 365 * 24 * 60  # ~7.88M minute slots


def main() -> None:
    n_ticks = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 30_000_000
    spark = get_spark(app_name="scale_sanity")

    # ticks: pseudo-random minute placement via integer hashing; ~71% of
    # minutes covered (reference: 29.03% gaps); 1-4 ticks per covered
    # minute; GBP/USD-like random walk priced via a hash-noise term.
    ticks = (
        spark.range(n_ticks)
        .select(
            (F.abs(F.hash(F.col("id"))) % MINUTES).alias("m"),
            (F.abs(F.hash(F.col("id") + 7)) % 60).alias("s"),
            (
                1.30
                + (F.abs(F.hash(F.col("id") + 13)) % 10_000 - 5_000) / 1_000_000.0
            ).alias("mid"),
        )
        .filter((F.abs(F.hash(F.col("m"))) % 100) < 71)  # session gaps
        .select(
            (
                F.lit("2010-01-01 00:00:00").cast("timestamp")
                + (F.col("m") * 60 + F.col("s")).cast("int").cast("string")
                .cast("interval second")
            ).alias("datetime"),
            (F.col("mid") + 0.0001).alias("ask"),
            (F.col("mid") - 0.0001).alias("bid"),
        )
    )

    # legacy M1: one bar for ~40% of minutes (overlaps + fills)
    m1 = (
        spark.range(MINUTES)
        .filter((F.abs(F.hash(F.col("id") + 3)) % 100) < 40)
        .select(
            (
                F.lit("2010-01-01 00:00:00").cast("timestamp")
                + (F.col("id") * 60).cast("int").cast("string")
                .cast("interval second")
            ).alias("datetime"),
            F.lit(1.30).alias("open"),
            F.lit(1.3005).alias("high"),
            F.lit(1.2995).alias("low"),
            (
                1.30
                + (F.abs(F.hash(F.col("id") + 23)) % 10_000 - 5_000) / 1_000_000.0
            ).alias("close"),
            F.lit(10.0).alias("volume"),
            F.lit(None).cast("double").alias("spread"),
        )
    )

    eng = HybridMergerSpark(spike_threshold=1e9, consensus_threshold=0.01)
    t0 = time.perf_counter()
    final, audit = eng.run(m1, ticks)
    n_rows = final.count()
    wall = time.perf_counter() - t0

    t1 = time.perf_counter()
    n_flat = final.filter(F.col("is_flat") == 1).count()
    flat_wall = time.perf_counter() - t1

    print(
        f"ticks~{n_ticks/1e6:.0f}M minutes={MINUTES} -> output_rows={n_rows} "
        f"({n_rows/1e6:.2f}M), flat={n_flat} ({100*n_flat/max(n_rows,1):.1f}%), "
        f"pipeline_wall={wall:.1f}s (+{flat_wall:.1f}s recount)"
    )


if __name__ == "__main__":
    main()
