"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall seconds.

Each query executes fully via the ``noop`` sink (forces computation of
every row, no write-path cost), after a small warmup to amortize JVM/
codegen startup out of the first measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from institutional_fx_etl_spark import get_spark
from institutional_fx_etl_spark.plans import driver_queries

#: queries that dominate the engine's real workload: the full pipeline,
#: the load-bearing aggregation, the grid join, the window sorts, and
#: the wide hash aggregate.
HEADLINE = [
    "hybrid_pipeline",
    "hybrid_pipeline_multisym",
    "tumbling_ohlc",
    "time_spine",
    "rolling_median_centered",
    "lag_pct_change",
    "groupby_agg",
    "combine_first",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk",
    "lsh_ann_pairs",
    "text_fingerprint",
    "corpus_pipeline",
    "asof_join",
    "sessionize",
    "stats_agg",
]



def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="bench")

    registry = driver_queries.REGISTRY
    names = [n for n in HEADLINE if n in registry]

    # warmup run per query (same sf): whole-stage codegen + JIT compile
    # outside the timed region; then best-of-2 timed passes (min damps
    # scheduler jitter) — steady-state engine throughput is what scales
    # to a real cluster
    timings: dict[str, float] = {}
    for name in names:
        fn = registry[name][0]
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001 — warmup is best-effort
            pass
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
