"""Data-quality expectations — declarative invariant checking.

The reference enforces invariants imperatively inside
``validate_and_clean`` (structural OHLC rules) and post-hoc in
``validator.py``. This generalizes both: declare named boolean
expectations over a DataFrame, get back the violations tagged by rule —
the same reason-tagged audit shape as the pipeline's forensic log, so
violations can feed the same sink. One pass, no UDFs; at scale this is
a single scan with all predicates fused by codegen.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_expectations(
    df: DataFrame, expectations: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Return ``(passing_rows, violations)``.

    ``expectations`` maps rule name → boolean Column that must hold.
    A row violating several rules appears once per violated rule in
    ``violations`` (with a ``rule`` column); ``passing_rows`` contains
    rows satisfying ALL rules. NULL rule results count as violations
    (an unknown invariant is a failed invariant — stricter than the
    engine's null-safe *cleaning* filters, where NULL keeps the row).
    """
    holds = {name: F.coalesce(cond, F.lit(False)) for name, cond in expectations.items()}

    all_hold = reduce(lambda a, b: a & b, holds.values(), F.lit(True))
    passing = df.filter(all_hold)

    violation_parts = [
        df.filter(~ok).withColumn("rule", F.lit(name))
        for name, ok in holds.items()
    ]
    violations = reduce(DataFrame.unionByName, violation_parts)
    return passing, violations
