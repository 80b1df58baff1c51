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


def interpolate_linear(
    col: str | Column,
    ts_col: str = "datetime",
    order_cols: tuple[str, ...] = ("datetime",),
    partition_cols: tuple[str, ...] = (),
) -> Column:
    """Time-weighted linear gap interpolation — pandas
    ``interpolate(method='time')``: a NULL row takes
    ``prev + (next − prev) · (t − t_prev) / (t_next − t_prev)`` from
    its nearest non-null neighbours. Leading/trailing runs (one
    neighbour missing) stay NULL — the caller chooses ffill/bfill for
    edges.

    Two ignore-nulls running-last windows (one ASC, one DESC) carry
    the neighbour's (value, ts) as a struct, so the whole fill is one
    sort pair over the existing partitioning — no self-join against
    the non-null subset (a second full-series shuffle at 100 TB), and
    no ``currentRow..unboundedFollowing`` frame (WindowExec re-scans
    shrinking frames to the partition end per row — the O(rows ·
    partition) trap recorded in plans/pipeline_fused.py; the DESC
    running last is the O(rows) form). Extends the reference's flat
    gap bridge (hybrid_merger.py:231-239) with the time-weighted
    variant.
    """
    c = F.col(col) if isinstance(col, str) else col
    ts = F.col(ts_col)
    pair = F.when(c.isNotNull(), F.struct(c.alias("v"), ts.alias("t")))
    back = ordered_window(order_cols, partition_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    desc = Window.partitionBy(*partition_cols).orderBy(
        *[F.col(o).desc() for o in order_cols]
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.last(pair, ignorenulls=True).over(back)
    nxt = F.last(pair, ignorenulls=True).over(desc)

    # TIMESTAMP_NTZ cannot cast to numeric directly on every Spark
    # version — hop through TIMESTAMP first, the repo-wide convention
    # (functions/chunked.py::epoch_seconds, operators/asof.py)
    def _secs(t: Column) -> Column:
        return t.cast("timestamp").cast("double")

    span = _secs(nxt["t"]) - _secs(prev["t"])
    w = (_secs(ts) - _secs(prev["t"])) / span
    return F.when(c.isNotNull(), c).otherwise(
        prev["v"] + (nxt["v"] - prev["v"]) * w
    )
