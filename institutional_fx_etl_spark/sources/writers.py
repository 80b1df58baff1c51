"""Sinks (SURVEY.md §2.1, S3/S4).

The reference writes a typed CSV plus a derived ``*_AUDIT.csv``
(``/root/reference/src/hybrid_merger.py:248-250,30-36``). We offer CSV
for parity and Parquet as the scale-path default (columnar, splittable,
statistics for pushdown on re-read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _swap_dataset(path: str, tmp: str) -> None:
    """Three-step local-FS dataset swap: old renamed aside, new renamed
    in, old deleted. The previous rmtree-then-move left NO live
    dataset if the process died between the two calls (round-7
    ADVICE); here the data survives every crash point — before the
    first rename readers see the old table, after the second they see
    the new one, and in between (or after a crash) the old copy sits
    intact at ``<path>__old`` for one-rename recovery. Same-directory
    renames are metadata ops, so the no-table window is two renames
    wide, not a data copy wide.

    Local-filesystem-only by design: on HDFS/S3 swap a metastore or
    table-format pointer (Delta/Iceberg commit) instead of paths.
    """
    import os
    import shutil

    old = path + "__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def recover_dataset(path: str) -> bool:
    """Crash recovery for :func:`_swap_dataset`: if no live table sits
    at ``path`` but the pre-swap copy survives at ``<path>__old``,
    rename it back — the one-rename recovery the swap guarantees at
    every crash point (chaos-tested op by op in
    tests/test_io_and_skew.py). Leftover ``__old`` copies alongside a
    live table are harmless (the next swap clears them) and are left
    for the operator to inspect. Returns True iff a live table exists
    at ``path`` on exit."""
    import os

    old = path + "__old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    return os.path.exists(path)


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


def compact_small_files(
    spark,
    path: str,
    partition_col: str | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction — the table-maintenance pass a streaming
    or incremental writer needs periodically: micro-batches and
    per-day overwrites accumulate thousands of tiny parquet files, and
    at 100 TB the scan's task-scheduling overhead (one task per tiny
    file) comes to dominate the read.

    Rewrites the dataset with file counts sized from the ACTUAL bytes
    on disk (``ceil(partition_bytes / target_file_bytes)``), preserving
    the partition layout when ``partition_col`` is given —
    ``repartition(n, partition_col)`` keeps partition-pruning intact
    while packing each partition into its minimal file count. The
    rewrite goes through a temp directory + the three-rename
    ``_swap_dataset`` (old aside, new in, old deleted) so the data
    survives a crash at any point and the table is never
    half-rewritten.

    Returns {files_before, files_after, bytes} for the maintenance
    audit log. Data content is untouched (pytest-gated row equality).
    """
    import math
    from pathlib import Path

    p = Path(path)
    before = [f for f in p.rglob("*.parquet") if f.is_file()]
    total_bytes = sum(f.stat().st_size for f in before)
    df = spark.read.parquet(path)

    tmp = str(p.with_name(p.name + "__compacting"))
    if partition_col is not None:
        # per-partition file counts: conservative global target split
        # across partitions by the writer (partitionBy) — each output
        # partition gets ceil(share) files via the hash repartition
        n_files = max(1, math.ceil(total_bytes / target_file_bytes))
        (
            df.repartition(n_files, partition_col)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(tmp)
        )
    else:
        n_files = max(1, math.ceil(total_bytes / target_file_bytes))
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)

    _swap_dataset(path, tmp)
    after = [f for f in Path(path).rglob("*.parquet") if f.is_file()]
    return {
        "files_before": len(before),
        "files_after": len(after),
        "bytes": total_bytes,
    }


def erase_keys(
    spark,
    path: str,
    key_col: str,
    keys_df,
) -> dict:
    """Right-to-erasure rewrite: remove every row whose ``key_col``
    appears in ``keys_df`` (a one-column DataFrame of subject keys)
    from a parquet dataset — the GDPR/CCPA deletion pass that
    complements the engine's ``pii_redact``/``k_anonymity`` governance
    ops with actual data removal.

    The filter is a broadcast LEFT ANTI join against the key list
    (erasure requests are small by nature; at millions of keys drop
    the broadcast hint and it degrades to a key-partitioned anti
    join), the rewrite goes through a temp directory + swap (the same
    never-half-rewritten discipline as ``compact_small_files``), and
    the returned audit — rows before/after/erased — is what the
    compliance log wants. Erasure is rewrite-based because plain
    parquet has no delete vectors; on a format with deletion support
    the same anti-join becomes a MERGE DELETE.
    """
    from pathlib import Path

    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    rows_before = df.count()
    keys = keys_df.toDF("k").select(F.col("k").alias("__erase_k"))
    kept = df.join(
        F.broadcast(keys),
        df[key_col] == F.col("__erase_k"),
        "left_anti",
    )
    p = Path(path)
    tmp = str(p.with_name(p.name + "__erasing"))
    kept.write.mode("overwrite").parquet(tmp)
    _swap_dataset(path, tmp)
    rows_after = spark.read.parquet(path).count()
    return {
        "rows_before": rows_before,
        "rows_after": rows_after,
        "rows_erased": rows_before - rows_after,
    }


def quarantine_write(
    df,
    expectations: dict,
    good_path: str,
    quarantine_path: str,
) -> dict:
    """Expectation-gated dual sink: rows passing every declared
    invariant land in ``good_path``, violations land in
    ``quarantine_path`` tagged by the rule they broke — the standard
    ingest-quality topology (never block the pipeline on bad rows,
    never silently drop them either).

    Composition of :func:`functions.expectations.check_expectations`
    (one fused-predicate scan) with two parquet sinks; the returned
    audit counts are what the ingest monitor alerts on. The violations
    write carries the ``rule`` tag column (one row per violated rule),
    so quarantined data is self-describing for replay after a rule
    fix.
    """
    from institutional_fx_etl_spark.functions.expectations import (
        check_expectations,
    )

    good, bad = check_expectations(df, expectations)
    good.write.mode("overwrite").parquet(good_path)
    bad.write.mode("overwrite").parquet(quarantine_path)
    spark = df.sparkSession
    n_good = spark.read.parquet(good_path).count()
    n_bad = spark.read.parquet(quarantine_path).count()
    return {"rows_good": n_good, "rows_quarantined": n_bad}
