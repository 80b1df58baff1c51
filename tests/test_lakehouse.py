"""Lakehouse connector gating: absent jars must surface as a clear
capability error, not a JVM stack trace."""

import pytest

from institutional_fx_etl_spark.sources.lakehouse import (
    LakehouseUnavailable,
    available_formats,
    read_table,
)


def test_available_formats_probe(spark):
    caps = available_formats(spark)
    assert set(caps) == {"delta", "iceberg", "hudi"}
    # none of the jars ship in this image
    assert not any(caps.values())


def test_missing_format_raises_clear_error(spark):
    with pytest.raises(LakehouseUnavailable, match="delta jars"):
        read_table(spark, "delta", "/tmp/nowhere")
    with pytest.raises(ValueError, match="unknown lakehouse format"):
        read_table(spark, "csvx", "/tmp/nowhere")
