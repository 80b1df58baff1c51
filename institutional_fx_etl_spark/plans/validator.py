"""Reconciliation audit (SURVEY.md §3 entry point 3;
``/root/reference/src/validator.py:1-30``).

Re-reads the hybrid output and the original M1 source, inner-aligns on
timestamp (J5), and reports rows whose close deviates by more than the
threshold — the reference's only "query" in the analytics sense:
inner join + filter + top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.nullsafe import is_true


def reconcile(
    hybrid: DataFrame,
    m1: DataFrame,
    threshold: float = 0.01,
    ts_col: str = "datetime",
    top_k: int = 5,
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Return the top-``top_k`` worst deviations (deterministic order:
    deviation desc, then timestamp — validator.py:24-25 relies on sort
    luck for ties; we don't)."""
    keys = [*partition_cols, ts_col]
    h = hybrid.select(*keys, F.col("close").cast("double").alias("hybrid_close"))
    m = m1.select(*keys, F.col("close").cast("double").alias("m1_close"))
    joined = h.join(m, on=keys, how="inner")
    deviations = joined.withColumn(
        "deviation", F.abs(F.col("hybrid_close") - F.col("m1_close"))
    ).filter(is_true(F.col("deviation") > F.lit(threshold)))
    return deviations.orderBy(F.desc("deviation"), *keys).limit(top_k)
