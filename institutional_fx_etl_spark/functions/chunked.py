"""Range-partitioned ("chunked") window execution — the 100 TB path for
ordered-series operators (SURVEY.md §2.6 W1-W4, §7.4-3).

The reference orders the whole single-symbol series in one pass
(``/root/reference/src/hybrid_merger.py:161,165,210-211``). The vanilla
Spark translation (:mod:`functions.windows`) reproduces that with
empty-``partitionBy`` windows — semantically exact, but the entire
series sorts on ONE task (the ``Exchange SinglePartition`` the round-1
verdict flagged as the scale-killer for a long single-symbol history).

This module removes the global sort without changing a single output
value:

- Rows are bucketed into fixed **time chunks** (``floor(epoch /
  chunk_seconds)``), then chunks are **densely indexed** per partition
  key so that adjacency survives empty chunks (FX weekends leave whole
  chunk ranges empty).
- Every **bounded-frame** window (``lag``/``lead``/rolling ``±k``)
  runs per-chunk in parallel, with the ``k`` boundary rows replicated
  into the neighbouring chunk as padding — exact row-frame semantics,
  because the padding rows ARE the frame rows a chunk-edge row would
  have seen in the global sort. Padding rows are dropped afterwards.
- The only **unbounded** state — the forward-fill carry — reduces to a
  1-row-per-chunk summary (last non-null value per chunk), whose
  cross-chunk prefix is an O(C) running window over the summary itself,
  broadcast-joined back; full rows never leave their chunk.

Physical shape: one hash exchange on ``(partition_cols, chunk)`` per
window site (consecutive sites on the same frame reuse it), tiny
broadcast joins for the summaries, and NO full-series sort. The
chunk-index ordinal and the cross-chunk carry prefix both resolve as
O(C) running windows over the 1-row-per-chunk summary table (C rows —
its sort is negligible at any realistic chunk count; full rows never
pass through it).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: raw time-chunk id (floor of epoch seconds / chunk_seconds)
CHUNK = "__chunk"
#: densely-indexed chunk ordinal (adjacency-safe across empty chunks)
CIDX = "__cidx"
#: marker for boundary-replica rows (dropped after the window computes)
PAD = "__pad"


def _same_keys(a: str, b: str, cols: tuple[str, ...]) -> Column:
    exprs = [F.col(f"{a}.{c}").eqNullSafe(F.col(f"{b}.{c}")) for c in cols]
    return reduce(Column.__and__, exprs, F.lit(True))


def epoch_seconds(col: Column | str) -> Column:
    """Epoch seconds of a timestamp, tolerant of ``TIMESTAMP_NTZ``
    inputs (parquet written without a zone under a vanilla session):
    NTZ cannot cast to DOUBLE directly, but NTZ→TIMESTAMP is legal
    (session-zone interpretation) and a no-op for TZ-aware inputs.
    Chunk bucketing only needs a monotone fixed-width bucket id, so the
    zone-dependent offset never changes results — only which boundary
    a chunk edge lands on."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")


def with_chunk_index(
    df: DataFrame,
    ts_col: str = "datetime",
    chunk_seconds: int = 21600,
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Add ``__chunk`` (time bucket) and ``__cidx`` (dense ordinal of
    the non-empty chunks, per partition key).

    The dense index is computed WITHOUT a full-row sort: the distinct
    chunk list is a map-side-combined aggregate (1 row per chunk) and
    the ordinal is a ``row_number`` over that C-row summary — an O(C)
    window whose sort never sees full rows.
    """
    df = df.withColumn(
        CHUNK,
        F.floor(epoch_seconds(ts_col) / F.lit(float(chunk_seconds))).cast(
            "long"
        ),
    )
    idx = (
        df.select(*partition_cols, CHUNK)
        .distinct()
        .withColumn(
            CIDX,
            F.row_number().over(
                Window.partitionBy(*partition_cols).orderBy(CHUNK)
            ),
        )
    )
    return df.join(F.broadcast(idx), on=[*partition_cols, CHUNK], how="left")


def padded(
    df: DataFrame,
    before: int,
    after: int,
    ts_col: str = "datetime",
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Replicate each chunk's last ``before`` rows into the next chunk
    and first ``after`` rows into the previous chunk, marked ``__pad``.

    A window over ``(partition_cols, __cidx) ORDER BY ts`` on the
    result sees exactly the rows a global-sort window with a bounded
    row frame ``[-before, +after]`` (or ``lag(≤before)`` /
    ``lead(≤after)``) would see — PROVIDED every non-empty chunk holds
    at least ``max(before, after)`` rows: replicas only reach the
    immediately adjacent dense chunk, so a 1-row chunk between two
    others leaves its neighbors' ±2 frames short. The shipped fused
    engine's pad (:func:`plans.pipeline_fused._pad_explode`) closes
    that hole with neighbor-count-aware ±2 shifts (found by the
    fused≡vanilla hypothesis test); this legacy helper keeps the
    simpler contract for its dense-series callers.
    """
    part = [*partition_cols, CIDX]
    w = Window.partitionBy(*part)
    base = df.withColumn(
        "__rn", F.row_number().over(w.orderBy(ts_col))
    ).withColumn("__cnt", F.count(F.lit(1)).over(w))
    out = base.withColumn(PAD, F.lit(False))
    if before > 0:
        out = out.unionByName(
            base.filter(F.col("__cnt") - F.col("__rn") < before)
            .withColumn(CIDX, F.col(CIDX) + 1)
            .withColumn(PAD, F.lit(True))
        )
    if after > 0:
        out = out.unionByName(
            base.filter(F.col("__rn") <= after)
            .withColumn(CIDX, F.col(CIDX) - 1)
            .withColumn(PAD, F.lit(True))
        )
    return out.drop("__rn", "__cnt")


def chunk_window(
    partition_cols: tuple[str, ...] = (), ts_col: str = "datetime"
):
    """The per-chunk ordered WindowSpec every chunked site computes over."""
    return Window.partitionBy(*partition_cols, CIDX).orderBy(ts_col)


def ffill_chunked(
    df: DataFrame,
    col: str,
    out_col: str,
    ts_col: str = "datetime",
    partition_cols: tuple[str, ...] = (),
    pad_col: str | None = None,
) -> DataFrame:
    """Exact forward-fill without a global sort (W2 at scale).

    ``ffill(x) ≡ coalesce(per-chunk ffill(x), carry)`` where ``carry``
    is the last non-null ``x`` of any EARLIER chunk — a per-chunk 1-row
    summary (``max_by`` on timestamp, null ordering keys skipped) whose
    running prefix is an O(C) ``last(…, ignorenulls)`` window over the
    summary itself, joined back by chunk. Padding rows (``pad_col``)
    are excluded from both the local fill and the summaries so replicas
    can't double-count.
    """
    part = [*partition_cols, CIDX]
    real = df.filter(~F.col(pad_col)) if pad_col else df
    value = (
        F.when(~F.col(pad_col), F.col(col)) if pad_col else F.col(col)
    )
    local = F.last(value, ignorenulls=True).over(
        chunk_window(partition_cols, ts_col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )

    sums = real.groupBy(*part).agg(
        F.max_by(F.col(col), F.when(F.col(col).isNotNull(), F.col(ts_col))).alias(
            "__last"
        )
    )
    carry = sums.select(
        *part,
        F.last("__last", ignorenulls=True)
        .over(
            Window.partitionBy(*partition_cols)
            .orderBy(CIDX)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        .alias("__carry"),
    )

    out = df.join(F.broadcast(carry), on=part, how="left")
    return out.withColumn(out_col, F.coalesce(local, F.col("__carry"))).drop(
        "__carry"
    )
