"""Skew-mitigation helpers for hot join keys (SURVEY.md §4.2 / the 100 TB
design notes).

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in
:func:`session.get_spark`) splits oversized sort-merge partitions at
runtime and is the first line of defense. Explicit salting is the
deterministic fallback for pathologically hot keys (one symbol carrying
half the ticks, one band-signature bucketing half the corpus): spread
the hot side over ``factor`` sub-keys and replicate the small side once
per sub-key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``on`` with the large side salted
    across ``factor`` sub-partitions per key and the small side
    replicated ``factor`` times — each hot key's rows land in
    ``factor`` shuffle partitions instead of one.

    Use when one side is join-key-skewed and too large for a broadcast;
    the replicated side multiplies by ``factor``, so keep it the small
    one. Deterministic (salt = a hash of the large side's whole row,
    mod factor — no RNG, so retries/recomputations are stable).
    """
    salt = (F.abs(F.hash(*[F.col(c) for c in large.columns])) % factor).alias(
        "__salt"
    )
    salted_large = large.select("*", salt)
    replicated_small = small.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__salt")
    )
    return salted_large.join(
        replicated_small, on=[*on, "__salt"], how=how
    ).drop("__salt")
