"""Ordered-row window functions (SURVEY.md §2.6, W1–W3).

Each helper returns a Column expression over an explicit
``Window.partitionBy(partition_cols).orderBy(order_cols)`` spec. The
reference orders over one global single-symbol series; passing
``partition_cols=('symbol',)`` is the scale path — window sorts then run
per-symbol in parallel instead of on one partition (SURVEY.md §7.4-3).
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def ordered_window(
    order_cols: tuple[str, ...] = ("datetime",),
    partition_cols: tuple[str, ...] = (),
) -> WindowSpec:
    return Window.partitionBy(*partition_cols).orderBy(*order_cols)


def ffill(
    col: str | Column,
    order_cols: tuple[str, ...] = ("datetime",),
    partition_cols: tuple[str, ...] = (),
) -> Column:
    """W2 — forward-fill: pandas ``ffill()`` (hybrid_merger.py:161,231,239).

    ``last(..., ignorenulls=True)`` over an unbounded-preceding row
    frame. Leading rows before the first non-null stay NULL (trap T7).
    """
    w = ordered_window(order_cols, partition_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return F.last(col, ignorenulls=True).over(w)


def pct_change(
    col: str | Column,
    order_cols: tuple[str, ...] = ("datetime",),
    partition_cols: tuple[str, ...] = (),
) -> Column:
    """W1 — pandas ``Series.pct_change()`` (hybrid_merger.py:165):
    ``(x - lag(x)) / lag(x)``; first row NULL (= pandas NaN, trap T3)."""
    w = ordered_window(order_cols, partition_cols)
    c = F.col(col) if isinstance(col, str) else col
    prev = F.lag(c).over(w)
    return (c - prev) / prev


def rolling_median_centered(
    col: str | Column,
    order_cols: tuple[str, ...] = ("datetime",),
    partition_cols: tuple[str, ...] = (),
    before: int = 2,
    after: int = 2,
) -> Column:
    """W3 — pandas centered rolling median, ``rolling(window=5,
    center=True, min_periods=1).median()`` (hybrid_merger.py:210-211).

    Exact-interpolating ``percentile(col, 0.5)`` over a ``[-2, +2]`` row
    frame reproduces pandas exactly, including even-count interpolation
    and frame shrinking at the series edges (SURVEY.md §2.6/W3 —
    ``median().over(frame)`` is rejected by Spark and
    ``percentile_approx`` diverges; do not substitute either).
    """
    w = ordered_window(order_cols, partition_cols).rowsBetween(-before, after)
    return F.percentile(col, 0.5).over(w)
