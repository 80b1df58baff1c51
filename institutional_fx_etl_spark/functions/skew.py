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


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    factor: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for hot GROUP BY keys: phase 1
    aggregates on ``(key, salt)`` — a hot key's rows combine inside
    ``factor`` parallel reducers — phase 2 re-combines the ``factor``
    partials per key. Result is identical to a direct groupBy for any
    commutative-associative aggregate.

    ``aggs`` maps output column name → ``(agg, input_col)`` with agg in
    {sum, count, min, max}; count re-combines with a SUM of partial
    counts. Salt is deterministic (whole-row hash mod factor), so
    recomputed tasks produce identical partials.

    Spark's hash aggregate already does map-side partial combine, which
    handles most key skew on its own; explicit salting is for the
    reduce-side long tail (a single key whose *combined* partials still
    dwarf one reducer, e.g. 10^9 rows of one symbol under a
    non-combinable agg chain) and for making the two-phase shape
    explicit where a plan must never hinge on AQE being enabled.
    """
    recombine = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for name, (agg, _col) in aggs.items():
        if agg not in recombine:
            raise ValueError(f"unsupported salted aggregate: {agg} ({name})")
    salt = (F.abs(F.hash(*[F.col(c) for c in df.columns])) % factor).alias(
        "__salt"
    )
    partial = (
        df.select("*", salt)
        .groupBy(*key_cols, "__salt")
        .agg(
            *[
                getattr(F, agg)(col).alias(f"__p_{name}")
                for name, (agg, col) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*key_cols).agg(
        *[
            getattr(F, recombine[agg])(f"__p_{name}").alias(name)
            for name, (agg, _col) in aggs.items()
        ]
    )


def spread_if_narrow(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin re-spread of an input whose PHYSICAL parallelism is
    below the session's default parallelism — the optimization guide's
    "input skew" remedy (§2.5): one huge unsplittable file, or a
    single-row-group parquet (a row group cannot be split, so the scan
    is ONE task no matter what ``maxPartitionBytes`` says), serializes
    every pre-shuffle CPU-bound derivation (tokenize / hash / shingle
    / edge-gen) on one core until the first exchange.

    Strictly a narrow-input rescue: when the scan already carries at
    least ``target`` partitions (a properly laid-out table at scale),
    this is an exact no-op — no exchange is added, so it can never
    become a constant tax on well-partitioned inputs. The repartition
    is keyless round-robin (deterministic under retries via Spark's
    sort-before-repartition default, SPARK-23207).

    CALLER CONTRACT (r14 ADVICE): only wrap SCAN-LEVEL inputs. The
    partition-count probe touches ``df.rdd``, which under AQE
    finalizes the plan — on a DataFrame containing exchanges that can
    eagerly execute upstream shuffle stages in a throwaway job the
    real query then re-pays. Every call site in this repo wraps a raw
    parquet scan (exchange-free plan), where ``.rdd`` only plans.
    """
    sc = df.sparkSession.sparkContext
    n = int(target) if target else sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
