"""Lakehouse table-format connectors (Delta Lake / Iceberg / Hudi).

Their jars are not on this image's classpath, so the connectors are
gated behind capability probes: :func:`available_formats` reports what
the running session can actually use, and the read/write helpers raise
a clear :class:`LakehouseUnavailable` (not an opaque JVM
ClassNotFoundException) when the format is missing. Adding the jars
(``spark.jars.packages io.delta:delta-spark_2.13:...`` etc.) lights
these up with no code changes — the call sites are format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_PROBE_CLASSES = {
    "delta": "org.apache.spark.sql.delta.catalog.DeltaCatalog",
    "iceberg": "org.apache.iceberg.spark.SparkCatalog",
    "hudi": "org.apache.hudi.DefaultSource",
}


class LakehouseUnavailable(RuntimeError):
    """The requested table format's jars are not on the classpath."""


def _has_class(spark: SparkSession, cls: str) -> bool:
    try:
        # JVM-side probe; cheap and side-effect-free
        spark._jvm.java.lang.Class.forName(cls)  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001 — absence IS the signal
        return False


def available_formats(spark: SparkSession) -> dict[str, bool]:
    return {fmt: _has_class(spark, cls) for fmt, cls in _PROBE_CLASSES.items()}


def _require(spark: SparkSession, fmt: str) -> None:
    if fmt not in _PROBE_CLASSES:
        raise ValueError(f"unknown lakehouse format: {fmt}")
    if not _has_class(spark, _PROBE_CLASSES[fmt]):
        raise LakehouseUnavailable(
            f"{fmt} jars are not on the classpath; add the connector "
            f"package to spark.jars.packages to enable {fmt} tables"
        )


def read_table(spark: SparkSession, fmt: str, path: str) -> DataFrame:
    _require(spark, fmt)
    return spark.read.format(fmt).load(path)


def write_table(
    df: DataFrame,
    fmt: str,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    _require(df.sparkSession, fmt)
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
