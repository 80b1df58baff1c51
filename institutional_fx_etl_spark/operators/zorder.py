"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for scan pruning.

The reference has no layout layer (eager single-file pandas); this is
the lakehouse primitive a 100 TB store needs when queries filter on
TWO independent columns: a sort on (a, b) prunes scans on ``a`` only,
while sorting by the interleaved-bit Morton key keeps BOTH columns'
value ranges narrow inside every file, so parquet min/max footer stats
skip files for predicates on either column (the Delta/Iceberg
``OPTIMIZE ZORDER BY`` idea, built here from plain integer expressions
— public bit-interleaving construction).

Everything is exact integer bit math (shiftleft/shiftright/&) — no
floats anywhere, so any engine reproduces the key bit-for-bit; an
oracle mirrors it with its native ``>>``/``&`` operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zvalue_expr(x: str, y: str, bits: int = 16) -> str:
    """SQL expr: the Morton interleave of the low ``bits`` bits of two
    non-negative integer expressions — ``x`` occupies even bit
    positions, ``y`` odd. Scan-side constant-depth expression (2·bits
    shift/mask terms), no UDF, no join."""
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout_stats(
    df: DataFrame,
    x: str,
    y: str,
    bits: int = 16,
    bucket_bits: int = 4,
) -> DataFrame:
    """Per-file-bucket pruning statistics under a z-order layout: the
    top ``bucket_bits`` of the Morton key form the file bucket (range
    partitioning by z ≡ splitting on its leading bits), and each
    bucket reports row count plus min/max of BOTH source columns —
    the exact numbers a parquet footer would carry, i.e. the
    prunability evidence. One scan + one bucket-count-sized hash
    aggregate; no sort needed to *audit* the layout (the writer path
    :func:`write_zordered` does the real range sort).

    Output: file_bucket, n, min/max of x and y.
    """
    z = zvalue_expr(x, y, bits)
    b = df.selectExpr(
        f"{x} AS __x",
        f"{y} AS __y",
        f"shiftright({z}, {2 * bits - bucket_bits}) AS file_bucket",
    )
    return b.groupBy("file_bucket").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n"),
        F.expr("CAST(min(__x) AS BIGINT) AS min_x"),
        F.expr("CAST(max(__x) AS BIGINT) AS max_x"),
        F.expr("CAST(min(__y) AS BIGINT) AS min_y"),
        F.expr("CAST(max(__y) AS BIGINT) AS max_y"),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = 16,
    num_files: int = 16,
) -> None:
    """Write ``df`` as parquet physically clustered on the Morton key:
    ``repartitionByRange`` on z (range exchange — each output file
    holds one contiguous z interval, the distributed equivalent of
    OPTIMIZE ZORDER) with an in-partition sort so row groups cluster
    too. Footer min/max then prune on either source column."""
    z = zvalue_expr(x, y, bits)
    (
        df.withColumn("__z", F.expr(z))
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
