"""As-of join — "latest right row at or before each left timestamp".

The canonical financial-data join (quote-at-trade-time, mark-to-market)
that Spark has no native operator for. The reference gets the effect
implicitly from its grid ffill (SURVEY.md §2.4); this is the explicit,
reusable operator.

Implementation: the **union + forward-fill** technique, not a range
join. Tag both sides, union them, sort once per key-partition by
(timestamp, side-order), forward-fill the right-side row (as ONE
struct, so a left row never mixes fields from different right rows),
keep left rows. Cost: one shuffle + one window sort over |L|+|R| rows —
no candidate-pair blowup, no per-row scan of the right side, and it
parallelizes by ``partition_cols`` exactly like every other ordered
operator here. (A Pandas-UDF ``merge_asof`` per group would be the
fallback for semantics this can't express, e.g. nearest-in-either-
direction with tolerance.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "datetime",
    partition_cols: tuple[str, ...] = (),
    right_cols: tuple[str, ...] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the most recent right row whose
    ``ts_col`` ≤ the left row's ``ts_col`` (per partition key). On
    equal timestamps the right row sorts FIRST, so an exactly-
    simultaneous right row IS visible to the left row (DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts`` semantics).

    Output: all left columns + ``right_cols`` renamed with ``suffix``
    (NULL when no right row precedes).
    """
    if right_cols is None:
        right_cols = tuple(
            c for c in right.columns if c != ts_col and c not in partition_cols
        )

    r_payload = F.struct(*[F.col(c) for c in right_cols])
    l_tagged = left.select(
        *partition_cols,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left_row"),
        F.lit(None)
        .cast(right.select(r_payload.alias("p")).schema["p"].dataType)
        .alias("__right_row"),
    )
    r_tagged = right.select(
        *partition_cols,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None)
        .cast(left.select(F.struct(*left.columns).alias("l")).schema["l"].dataType)
        .alias("__left_row"),
        r_payload.alias("__right_row"),
    )

    w = (
        Window.partitionBy(*partition_cols)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__r", F.last("__right_row", ignorenulls=True).over(w))
    )
    return filled.filter(F.col("__side") == 1).select(
        *[F.col(f"__left_row.{c}").alias(c) for c in left.columns],
        *[F.col(f"__r.{c}").alias(c + suffix) for c in right_cols],
    )


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "datetime",
    partition_cols: tuple[str, ...] = (),
    right_cols: tuple[str, ...] | None = None,
    tolerance_s: float | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
) -> DataFrame:
    """pandas ``merge_asof(direction=..., tolerance=...)`` semantics
    (the r13 verdict's W2 as-of ask): attach the closest right row in
    the requested ``direction`` — ``'backward'`` (≤ left ts),
    ``'forward'`` (≥ left ts) or ``'nearest'`` — but only when the
    time gap is within ``tolerance_s`` seconds (inclusive; ``None``
    = unbounded, degenerating to :func:`asof_join` /
    :func:`asof_join_nearest`). Out-of-tolerance rows keep the left
    side with NULL right columns, exactly like ``merge_asof``.

    Same union + running-last technique as the siblings — the
    tolerance is a SCAN-SIDE mask applied after the fill (the closest
    row on a side is by definition the only candidate on that side,
    so masking it is equivalent to never matching), never a range
    join: one shuffle per direction over |L|+|R| rows regardless of
    tolerance width, where a range-join plan would blow up with the
    tolerance window at 100 TB. Equal-timestamp right rows resolve by
    payload order (max payload — the round-5 asof determinism rule).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest',"
            f" got {direction!r}"
        )
    if right_cols is None:
        right_cols = tuple(
            c for c in right.columns if c != ts_col and c not in partition_cols
        )

    r_payload = F.struct(
        F.col(ts_col).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    r_type = right.select(r_payload.alias("p")).schema["p"].dataType
    l_type = left.select(F.struct(*left.columns).alias("l")).schema["l"].dataType
    l_tagged = left.select(
        *partition_cols,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left_row"),
        F.lit(None).cast(r_type).alias("__right_row"),
    )
    r_tagged = right.select(
        *partition_cols,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_type).alias("__left_row"),
        r_payload.alias("__right_row"),
    )
    u = l_tagged.unionByName(r_tagged)

    def _epoch(c):
        # TIMESTAMP_NTZ refuses a direct numeric cast — hop through
        # cast("timestamp") (UTC session: same instant)
        return c.cast("timestamp").cast("double")

    filled = u
    if direction in ("backward", "nearest"):
        back = (
            Window.partitionBy(*partition_cols)
            .orderBy(F.asc("__ts"), F.asc("__side"), F.asc("__right_row"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = filled.withColumn(
            "__prev", F.last("__right_row", ignorenulls=True).over(back)
        )
    if direction in ("forward", "nearest"):
        fwd = (
            Window.partitionBy(*partition_cols)
            .orderBy(F.desc("__ts"), F.asc("__side"), F.asc("__right_row"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = filled.withColumn(
            "__next", F.last("__right_row", ignorenulls=True).over(fwd)
        )

    out = filled.filter(F.col("__side") == 1)
    tol = None if tolerance_s is None else float(tolerance_s)
    if direction in ("backward", "nearest"):
        d_prev = _epoch(F.col("__ts")) - _epoch(F.col("__prev.__rts"))
        prev_ok = F.col("__prev").isNotNull()
        if tol is not None:
            prev_ok = prev_ok & (d_prev <= F.lit(tol))
        out = out.withColumn(
            "__prev_t", F.when(prev_ok, F.col("__prev"))
        )
    if direction in ("forward", "nearest"):
        d_next = _epoch(F.col("__next.__rts")) - _epoch(F.col("__ts"))
        next_ok = F.col("__next").isNotNull()
        if tol is not None:
            next_ok = next_ok & (d_next <= F.lit(tol))
        out = out.withColumn(
            "__next_t", F.when(next_ok, F.col("__next"))
        )

    if direction == "backward":
        pick = F.col("__prev_t")
    elif direction == "forward":
        pick = F.col("__next_t")
    else:
        pick = (
            F.when(F.col("__prev_t").isNull(), F.col("__next_t"))
            .when(F.col("__next_t").isNull(), F.col("__prev_t"))
            .when(d_prev <= d_next, F.col("__prev_t"))
            .otherwise(F.col("__next_t"))
        )
    return out.withColumn("__pick", pick).select(
        *[F.col(f"__left_row.{c}").alias(c) for c in left.columns],
        *[F.col(f"__pick.{c}").alias(c + suffix) for c in right_cols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "datetime",
    partition_cols: tuple[str, ...] = (),
    right_cols: tuple[str, ...] | None = None,
    suffix: str = "_near",
) -> DataFrame:
    """pandas ``merge_asof(direction='nearest')``: attach the right row
    closest in time on EITHER side (earlier wins a distance tie, and an
    exactly-simultaneous right row is distance 0). Same union trick as
    :func:`asof_join` run in both directions — a backward running last
    over (ts ASC, right-first) and a forward one over (ts DESC,
    right-first) — then a scan-side pick by |Δt|. Two sorts over one
    partitioning; no self-join, no shrinking frames."""
    if right_cols is None:
        right_cols = tuple(
            c for c in right.columns if c != ts_col and c not in partition_cols
        )

    r_payload = F.struct(
        F.col(ts_col).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    r_type = right.select(r_payload.alias("p")).schema["p"].dataType
    l_type = left.select(F.struct(*left.columns).alias("l")).schema["l"].dataType
    l_tagged = left.select(
        *partition_cols,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left_row"),
        F.lit(None).cast(r_type).alias("__right_row"),
    )
    r_tagged = right.select(
        *partition_cols,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_type).alias("__left_row"),
        r_payload.alias("__right_row"),
    )
    # final F.asc("__right_row") tiebreak (round-5 advice): right rows
    # sharing an identical timestamp would otherwise resolve to
    # whichever physically sorts last under (__ts, __side) — varying
    # across partitionings/engines. Ordering by the payload struct
    # itself makes both directions deterministically pick the MAX
    # payload of an equal-ts group (left rows carry a NULL payload and
    # sort first, which is irrelevant — they are never fill sources).
    # Requires an orderable right payload (scalars/structs — no maps).
    back = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.asc("__ts"), F.asc("__side"), F.asc("__right_row"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.desc("__ts"), F.asc("__side"), F.asc("__right_row"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l_tagged.unionByName(r_tagged)
    filled = u.withColumn(
        "__prev", F.last("__right_row", ignorenulls=True).over(back)
    ).withColumn("__next", F.last("__right_row", ignorenulls=True).over(fwd))
    # TIMESTAMP_NTZ refuses a direct numeric cast — hop through
    # cast("timestamp") (UTC session: same instant)
    def _epoch(c):
        return c.cast("timestamp").cast("double")

    d_prev = _epoch(F.col("__ts")) - _epoch(F.col("__prev.__rts"))
    d_next = _epoch(F.col("__next.__rts")) - _epoch(F.col("__ts"))
    pick = (
        F.when(F.col("__prev").isNull(), F.col("__next"))
        .when(F.col("__next").isNull(), F.col("__prev"))
        .when(d_prev <= d_next, F.col("__prev"))
        .otherwise(F.col("__next"))
    )
    return (
        filled.filter(F.col("__side") == 1)
        .withColumn("__pick", pick)
        .select(
            *[F.col(f"__left_row.{c}").alias(c) for c in left.columns],
            *[F.col(f"__pick.{c}").alias(c + suffix) for c in right_cols],
        )
    )
