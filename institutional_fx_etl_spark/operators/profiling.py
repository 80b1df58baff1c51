"""Dataset profiling — the first query anyone runs on unfamiliar data.

The reference has no profiling surface (its validator re-derives one
known pipeline); this is the generic per-column summary a 100 TB data
platform exposes: row count, null count, exact distinct count, min and
max per column, one result row per column.

Plan shape: one aggregate per column UNIONed — parquet column pruning
makes each branch a single-column scan, and Catalyst runs the branches
as independent stages, so the whole profile reads each column exactly
once with no wide expand operator (the multi-`count(distinct)` single
pass plans an Expand that multiplies the scan by the column count —
strictly worse). Min/max serialize to strings so the result schema is
column-type-agnostic.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) — one row per requested column, distinct
    counts EXACT (each branch is its own single-column aggregate, so
    no cross-column Expand blowup; swap ``approx_count_distinct`` in
    per branch when ±2% is acceptable at extreme cardinality)."""
    branches = []
    for c in cols:
        branches.append(
            df.select(
                F.lit(c).alias("column"),
                F.col(c).alias("__v"),
            )
            .groupBy("column")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("__v").isNull().cast("long")).alias("n_nulls"),
                F.count_distinct("__v").alias("n_distinct"),
                F.min("__v").cast("string").alias("min_value"),
                F.max("__v").cast("string").alias("max_value"),
            )
        )
    return reduce(DataFrame.unionByName, branches)
