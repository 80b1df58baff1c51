"""Time-grid and calendar helpers (SURVEY.md §2.3/F2, §2.4/J4).

Trap T2: pandas ``dayofweek`` is Mon=0…Sun=6 while Spark ``dayofweek()``
is Sun=1…Sat=7. The reference's FX off-session mask is written in pandas
convention (``/root/reference/src/hybrid_merger.py:89-93``); the
translation lives here, once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Spark dayofweek() codes (Sun=1 … Sat=7).
_SUN, _FRI, _SAT = 1, 6, 7


def fx_offsession_mask(ts: Column) -> Column:
    """True for timestamps outside FX trading sessions, matching
    hybrid_merger.py:89-93 exactly (all UTC):

    - all of Saturday,
    - Friday from 22:00,
    - Sunday before 21:00.
    """
    dow = F.dayofweek(ts)
    hour = F.hour(ts)
    return (
        (dow == _SAT)
        | ((dow == _FRI) & (hour >= 22))
        | ((dow == _SUN) & (hour < 21))
    )


def minute_bucket(ts: Column) -> Column:
    """Left-closed, left-labeled 1-minute bucket — equals pandas
    ``resample('1min', label='left', closed='left')`` labels."""
    return F.date_trunc("minute", ts)


def time_spine(
    df: DataFrame,
    ts_col: str = "datetime",
    step: str = "1 minute",
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """J4 — generate the gapless time grid between the (per-partition)
    min and max of ``ts_col``: the reference's "Immutable Time Grid"
    (``hybrid_merger.py:216-218``, ``pd.date_range`` + ``reindex``).

    Spark-first: one partial+final min/max aggregation, then
    ``explode(sequence(...))`` generates minutes *distributed on the
    executors* — no driver-side range materialization. At 100 TB with
    many symbols, the generate runs per symbol group in parallel.
    """
    bounds = df.groupBy(*partition_cols).agg(
        F.min(ts_col).alias("__t0"), F.max(ts_col).alias("__t1")
    )
    return bounds.select(
        *partition_cols,
        F.explode(
            F.sequence(F.col("__t0"), F.col("__t1"), F.expr(f"interval {step}"))
        ).alias(ts_col),
    )
