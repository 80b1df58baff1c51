"""Distributed exact per-group ranking / running sums (guide §2).

``row_number()/SUM() OVER (PARTITION BY g ORDER BY ...)`` puts every
row of a group on ONE task: with a handful of groups (or one), the
sort is O(group) on a single core — the classic 100 TB scale-killer
Spark itself warns about ("Moving all data to a single partition").
The exact-rank operators here (Spearman ρ, weighted median, Kendall τ
prefilter) need per-group TOTAL-ORDER ranks, so the fix is the
textbook two-phase distributed ranking:

1. ``repartitionByRange`` on ``(group, order)`` — rows of a group
   land in contiguous physical partitions, each bounded by the range
   split, NOT by group size;
2. a LOCAL window per ``(physical partition, group)`` computes the
   within-partition rank / running sum — every sort task sees only
   its range slice;
3. per-(partition, group) row counts / weight sums roll up to a tiny
   ``num_partitions x groups`` relation whose running prefix gives
   each partition's EXCLUSIVE offset; a broadcast join adds it back.

Global rank = local rank + offset, exactly — ranks are independent of
where the (sampled) range boundaries fall because the order keys form
a total order per caller contract (callers pass unique tiebreaks), so
results are bit-identical to the single-task window and the oracle
hash is unchanged. Range boundaries come from Spark's seeded
reservoir sample (deterministic for a given input), and
``spark_partition_id`` is projected to a concrete column before any
grouping, so retried tasks reproduce the same assignment.

Cost model: one range exchange (plus its sampling pass) + one tiny
rollup instead of one hash exchange — at bench SF this is a wash or a
small constant tax; at scale it is the difference between O(n/p) and
O(group) critical-path sorting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ranged(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[str | Column],
    num_partitions: int | None,
) -> DataFrame:
    from institutional_fx_etl_spark.functions.cachereg import cached

    n = int(num_partitions) if num_partitions else (
        df.sparkSession.sparkContext.defaultParallelism
    )
    keys = [F.col(c) if isinstance(c, str) else c for c in (*part_cols, *order_cols)]
    r = cached(
        df.repartitionByRange(n, *keys).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    # EAGER barrier, load-bearing for exactness: the local-rank branch
    # and the offsets branch would otherwise each re-evaluate this
    # subtree as column-pruned COPIES (different schemas defeat
    # ReuseExchange), and RangePartitioner's boundary sample is seeded
    # by the RDD id — two evaluations draw DIFFERENT boundaries, so
    # offsets would describe a different row->partition map than the
    # local ranks (measured: ranks off by whole partition counts).
    # One count() pins a single materialized pid assignment that every
    # consumer reads; the persist is plan-keyed, so warm re-invocations
    # re-match it instead of re-shuffling. (Construction-time job — the
    # documented eager-barrier pattern, see adamic_adar.)
    r.count()
    return r


def dist_row_number(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``row_number() OVER (PARTITION BY part_cols ORDER BY
    order_cols)`` as the module-docstring two-phase plan. The order
    columns MUST form a total order within each group (unique
    tiebreaks) — ranks are then boundary-invariant and identical to
    the single-task window. All input columns are carried through;
    ``out_col`` is INT (row_number's type)."""
    r = _ranged(df, part_cols, order_cols, num_partitions)
    w_local = Window.partitionBy("__pid", *part_cols).orderBy(*order_cols)
    local = r.withColumn("__lrn", F.row_number().over(w_local))
    cnts = r.groupBy("__pid", *part_cols).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = cnts.select(
        "__pid",
        *part_cols,
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0).cast("bigint")).alias(
            "__off"
        ),
    )
    return (
        local.join(F.broadcast(offs), ["__pid", *part_cols])
        .withColumn(
            out_col,
            (F.col("__off") + F.col("__lrn")).cast("int"),
        )
        .drop("__pid", "__lrn", "__off")
    )


def dist_running_sum(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[str],
    weight_col: str,
    out_col: str,
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """``SUM(weight_col) OVER (PARTITION BY part_cols ORDER BY
    order_cols ROWS UNBOUNDED PRECEDING..CURRENT ROW)`` (inclusive
    running sum) via the same two-phase plan; the weight must already
    be an exact integer type (the engine's micro-unit policy — float
    running sums are order-dependent and have no distributed exact
    form). When ``total_col`` is given, the per-group GRAND total is
    attached from the same tiny rollup (no second full-data window).
    """
    r = _ranged(df, part_cols, order_cols, num_partitions)
    w_local = (
        Window.partitionBy("__pid", *part_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = r.withColumn("__lcum", F.sum(weight_col).over(w_local))
    sums = r.groupBy("__pid", *part_cols).agg(
        F.sum(weight_col).alias("__psum")
    )
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy(*part_cols)
    offs = sums.select(
        "__pid",
        *part_cols,
        F.coalesce(F.sum("__psum").over(w_off), F.lit(0).cast("bigint")).alias(
            "__off"
        ),
        *(
            [F.sum("__psum").over(w_tot).alias(total_col)]
            if total_col
            else []
        ),
    )
    return (
        local.join(F.broadcast(offs), ["__pid", *part_cols])
        .withColumn(out_col, F.col("__off") + F.col("__lcum"))
        .drop("__pid", "__lcum", "__off")
    )
