"""Banded interval (range) joins — the non-equi join family.

A naive range join (``a.ts BETWEEN b.ts - ε AND b.ts + ε``) has no
equi-key, so Spark plans a broadcast-nested-loop or cartesian product —
O(|A|·|B|) comparisons, dead at scale. The standard fix is *banding*:
quantize the range variable into ε-wide buckets, equi-join on
``(key, bucket)`` for the bucket and its right neighbor (any pair
within ε spans at most two adjacent buckets — checking ``b`` and
``b+1`` from one side enumerates every candidate exactly once per
side), then verify the exact predicate on the candidates. The shuffle
is an ordinary hash exchange on the composite key, candidate count is
bounded by per-bucket occupancy (ε controls it), and the exact filter
runs JVM-side on the joined rows.

The reference engine has no range join; this is part of the extension
surface (as-of join in ``operators/asof.py`` is the ordered cousin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.chunked import epoch_seconds


def banded_self_pairs(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    id_col: str = "event_id",
    band_seconds: int = 300,
) -> DataFrame:
    """All pairs of rows sharing ``key_col`` whose timestamps lie
    within ``band_seconds`` of each other (``id_a < id_b``), plus the
    signed gap ``dt_sec = ts_b − ts_a`` (seconds, 6dp-rounded double).

    Plan: each row lands in bucket ``floor(epoch/ε)``; the left side
    joins the right side on ``(key, bucket)`` and ``(key, bucket+1)``
    (two equi-joins unioned — NOT a multi-bucket explode), the exact
    ``|dt| ≤ ε`` predicate filters candidates, and the ``(b, b+1)``
    asymmetry plus the ``id_a < id_b`` guard make each qualifying pair
    appear exactly once: same-bucket pairs come from the first join
    only; adjacent-bucket pairs from the second only, in both id
    orders, normalized by least/greatest.
    """
    # the two sides get DISJOINT column names: same-lineage self-join
    # conditions like a["k"] == b["k"] resolve to one expression
    # (trivially true) and silently join across keys
    a = df.select(
        F.col(key_col).alias("__ka"),
        F.col(id_col).alias("__id_a"),
        epoch_seconds(ts_col).alias("__ea"),
        F.floor(epoch_seconds(ts_col) / band_seconds).alias("__ba"),
    )
    b = df.select(
        F.col(key_col).alias("__kb"),
        F.col(id_col).alias("__id_b"),
        epoch_seconds(ts_col).alias("__eb"),
        F.floor(epoch_seconds(ts_col) / band_seconds).alias("__bb"),
    )
    same = a.join(
        b, (F.col("__ka") == F.col("__kb")) & (F.col("__ba") == F.col("__bb"))
    ).filter(F.col("__id_a") < F.col("__id_b"))
    # adjacent buckets: candidates in either id order — normalize below
    adj = a.join(
        b,
        (F.col("__ka") == F.col("__kb"))
        & (F.col("__ba") + 1 == F.col("__bb")),
    )
    cand = same.select(
        F.col("__ka").alias("key"), "__id_a", "__ea", "__id_b", "__eb"
    ).unionByName(
        adj.select(
            F.col("__ka").alias("key"),
            F.least("__id_a", "__id_b").alias("__id_a"),
            F.when(F.col("__id_a") < F.col("__id_b"), F.col("__ea"))
            .otherwise(F.col("__eb"))
            .alias("__ea"),
            F.greatest("__id_a", "__id_b").alias("__id_b"),
            F.when(F.col("__id_a") < F.col("__id_b"), F.col("__eb"))
            .otherwise(F.col("__ea"))
            .alias("__eb"),
        )
    )
    # dt stays a 6dp-rounded DOUBLE: epoch differences are exact at
    # microsecond resolution, while an integer cast would truncate in
    # Spark but round in other engines
    return cand.filter(
        F.abs(F.col("__eb") - F.col("__ea")) <= band_seconds
    ).select(
        F.col("key"),
        F.col("__id_a").alias("id_a"),
        F.col("__id_b").alias("id_b"),
        F.round(F.col("__eb") - F.col("__ea"), 6).alias("dt_sec"),
    )
