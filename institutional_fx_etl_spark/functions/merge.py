"""Coalescing full-outer merge (SURVEY.md §2.4/J3).

pandas ``combine_first`` (``/root/reference/src/hybrid_merger.py:202``)
is a **cell-level** operation (trap T8): it full-outer-aligns two frames
on the index and, per column, takes the primary side's value unless that
cell is NaN — so a row present on the primary side can still receive
individual cells from the fallback side. A row-priority merge is wrong.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def combine_first(
    primary: DataFrame,
    fallback: DataFrame,
    on: Sequence[str],
    cols: Sequence[str] | None = None,
) -> DataFrame:
    """``coalesce(primary.c, fallback.c)`` per value column over a
    full-outer equi-join on ``on``.

    Scale note: this is one shuffle on the join key (or zero with a
    broadcast fallback side); AQE picks the strategy. Column set
    defaults to the union of both sides' non-key columns, primary's
    order first — matching pandas' column-union behavior.
    """
    on = list(on)
    p_cols = [c for c in primary.columns if c not in on]
    f_cols = [c for c in fallback.columns if c not in on]
    if cols is None:
        cols = p_cols + [c for c in f_cols if c not in p_cols]

    p, f = primary.alias("__p"), fallback.alias("__f")
    joined = p.join(f, on=on, how="full_outer")

    out = []
    for c in cols:
        if c in p_cols and c in f_cols:
            out.append(F.coalesce(F.col(f"__p.{c}"), F.col(f"__f.{c}")).alias(c))
        elif c in p_cols:
            out.append(F.col(f"__p.{c}").alias(c))
        else:
            out.append(F.col(f"__f.{c}").alias(c))
    return joined.select(*on, *out)
