"""Null-safe predicate helpers (SURVEY.md §2.9, traps T1/T3).

pandas three-valued logic differs from SQL's: ``NaN < x`` evaluates to
``False`` in pandas, so a row with a NaN price *survives* the
reference's negated anomaly filters (``/root/reference/src/
hybrid_merger.py:85-87,165-166``). In Spark, ``NULL < x`` is ``NULL``
and ``filter(~cond)`` drops the row. Every "drop rows where BAD"
filter in this engine therefore goes through :func:`drop_where`, which
keeps a row unless the condition is *strictly true*.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def is_true(cond: Column) -> Column:
    """NULL-as-False: true iff ``cond`` is strictly TRUE."""
    return F.coalesce(cond, F.lit(False))


def not_true(cond: Column) -> Column:
    """Null-safe negation: true when ``cond`` is FALSE **or NULL** —
    the pandas semantics of ``df[~mask]`` where mask came from a
    comparison against NaN."""
    return ~is_true(cond)


def drop_where(df: DataFrame, cond: Column) -> DataFrame:
    """Drop rows where ``cond`` is strictly TRUE; NULL-condition rows kept."""
    return df.filter(not_true(cond))
