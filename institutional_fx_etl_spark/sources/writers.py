"""Sinks (SURVEY.md §2.1, S3/S4).

The reference writes a typed CSV plus a derived ``*_AUDIT.csv``
(``/root/reference/src/hybrid_merger.py:248-250,30-36``). We offer CSV
for parity and Parquet as the scale-path default (columnar, splittable,
statistics for pushdown on re-read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, sort_cols: list[str] | None = None) -> None:
    """CSV sink with header; optional global order for human-readable output.

    A global ``orderBy`` forces a range-shuffle — acceptable for final
    sinks, never used between stages (SURVEY.md §2.7/O1).
    """
    if sort_cols:
        df = df.orderBy(*sort_cols)
    df.write.mode("overwrite").option("header", "true").csv(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Parquet sink; ``partition_by`` for partition-pruned re-reads at scale."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed-table sink: pre-shuffles data into
    ``num_buckets`` hash buckets on ``bucket_cols`` so later joins /
    aggregations on those keys run WITHOUT a shuffle (co-located
    scans). The 100 TB pattern for repeatedly-joined fact tables;
    optional per-bucket sort enables shuffle-AND-sort-free sort-merge
    joins."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def audit_path_for(output_path: str) -> str:
    """Derive the audit sink path the way the reference does
    (hybrid_merger.py:12): ``X.csv`` → ``X_AUDIT.csv``."""
    if output_path.endswith(".csv"):
        return output_path[: -len(".csv")] + "_AUDIT.csv"
    return output_path + "_AUDIT"


def write_orc(
    df: DataFrame, path: str, partition_cols: list[str] | None = None
) -> None:
    """ORC sink (native vectorized writer, zlib default); partition
    columns give the same directory-pruned layout as the parquet
    sink."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)
