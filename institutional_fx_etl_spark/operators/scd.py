"""Slowly-changing-dimension maintenance (SCD type 2) — the lakehouse
MERGE INTO primitive.

The reference pipeline overwrites its outputs wholesale
(`/root/reference/src/hybrid_merger.py` writes one CSV); a warehouse
maintaining dimensions at scale instead applies change batches as
effective-dated history: close the open row when an attribute
changes, insert the new version, never touch settled history. Engines
with MERGE INTO (Delta/Iceberg) run this as a join-update; on plain
Spark DataFrames the same semantics compose from one per-key window
pass — which is also the 100 TB plan: everything shuffles once on the
dimension key, history rows stream through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: tuple[str, ...],
    attr_cols: tuple[str, ...],
    ts_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Apply a change batch to a type-2 dimension.

    ``dim`` holds history rows ``(keys, attrs, valid_from,
    valid_to)`` with NULL ``valid_to`` marking the current version;
    ``changes`` holds ``(keys, attrs, ts)`` observations (a batch may
    carry several changes per key — they chain in timestamp order).
    Semantics:

    * closed (settled) history passes through byte-identical;
    * per key, the open row and the batch merge into one
      timestamp-ordered version chain;
    * consecutive versions with IDENTICAL attributes collapse (a
      re-observation of the same value is not a new version);
    * each surviving version is closed by the next one's timestamp;
      the last stays open (NULL ``valid_to``).

    One hash shuffle on the key columns; the two windows share that
    partitioning (no second exchange). Deterministic under ties:
    equal-timestamp rows order by the attribute tuple, so replays
    produce identical histories.
    """
    kc = list(key_cols)
    ac = list(attr_cols)
    closed = dim.filter(F.col(to_col).isNotNull()).select(
        *kc, *ac, from_col, to_col
    )
    open_rows = dim.filter(F.col(to_col).isNull()).select(
        *kc, *ac, F.col(from_col).alias("__ts")
    )
    batch = changes.select(*kc, *ac, F.col(ts_col).alias("__ts"))
    merged = open_rows.unionByName(batch)
    order = [F.col("__ts")] + [F.col(c) for c in ac]
    w = Window.partitionBy(*kc).orderBy(*order)
    same_as_prev = F.coalesce(
        F.struct(*ac).eqNullSafe(F.lag(F.struct(*ac)).over(w)),
        F.lit(False),
    )
    versions = merged.withColumn("__dup", same_as_prev).filter(
        ~F.col("__dup")
    )
    w2 = Window.partitionBy(*kc).orderBy(*order)
    return (
        versions.withColumn(to_col, F.lead("__ts").over(w2))
        .selectExpr(
            *kc,
            *ac,
            f"__ts AS {from_col}",
            to_col,
        )
        .unionByName(closed)
    )


def cdc_apply(
    df: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str,
    op_col: str,
    payload_cols: tuple[str, ...],
    tiebreak_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Materialize the current snapshot from a CDC change log:
    last-writer-wins per key under the (ts, tiebreak) total order,
    and a key whose LATEST operation is a delete is absent from the
    snapshot entirely — the standard log-compaction / MERGE INTO
    outcome, computed set-wise.

    One key-partitioned ordered window (rank-1 row per key) and a
    filter — no join, no driver state; keys parallelize independently
    at 100 TB. Use :func:`scd2_apply` instead when history (validity
    intervals) must be retained; this operator keeps only the head.

    Output: key cols, ts_col, op_col, payload cols of the surviving
    latest row per key.
    """
    order = [F.col(ts_col).desc()] + (
        [F.col(tiebreak_col).desc()] if tiebreak_col else []
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col(op_col) != delete_op)
        .select(*key_cols, ts_col, op_col, *payload_cols)
    )
