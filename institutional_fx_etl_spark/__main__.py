"""CLI entry point — reference-CLI parity
(``/root/reference/src/hybrid_merger.py:253-259`` drives the engine
from file paths; so does this):

    python -m institutional_fx_etl_spark M1.csv TICKS.csv OUT.csv \
        [--spike-threshold 0.005] [--consensus-threshold 0.01] \
        [--no-smooth-spread] [--format csv|parquet] [--symbol-col symbol] \
        [--engine auto|vanilla|fused]

Writes the hybrid dataset to OUT and the forensic audit log next to it
(``*_AUDIT``), then prints the reference-style summary counts.
"""

from __future__ import annotations

import argparse

from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark
from institutional_fx_etl_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser(prog="institutional_fx_etl_spark")
    ap.add_argument("m1_path")
    ap.add_argument("tick_path")
    ap.add_argument("output_path")
    ap.add_argument("--spike-threshold", type=float, default=0.005)
    ap.add_argument("--consensus-threshold", type=float, default=0.01)
    ap.add_argument("--no-smooth-spread", action="store_true")
    ap.add_argument("--format", choices=["csv", "parquet"], default="csv")
    ap.add_argument(
        "--partition-col",
        action="append",
        default=[],
        help="partition column(s) for multi-asset inputs (e.g. symbol)",
    )
    ap.add_argument(
        "--engine",
        choices=["auto", "vanilla", "fused"],
        default="auto",
        help="merge engine; 'auto' (default) picks the fused chunked"
        " path for long single-symbol histories from the size estimate",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="hybrid_merger")
    eng = HybridMergerSpark(
        spike_threshold=args.spike_threshold,
        consensus_threshold=args.consensus_threshold,
        smooth_spread=not args.no_smooth_spread,
        partition_cols=tuple(args.partition_col),
        engine=args.engine,
    )
    final, audit = eng.run_csv(
        spark, args.m1_path, args.tick_path, args.output_path, args.format
    )
    n = final.count()
    by_reason = {
        r["reason"]: r["count"]
        for r in audit.groupBy("reason").count().collect()
    }
    print(f"rows_written={n}")
    for reason, count in sorted(by_reason.items()):
        print(f"audit.{reason}={count}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
