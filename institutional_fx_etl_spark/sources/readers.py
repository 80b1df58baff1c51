"""Sources (SURVEY.md §2.1, S1/S2/S6).

The reference's chunked CSV scan (50M-row chunks + manual gc,
``/root/reference/src/hybrid_merger.py:66-74,121-122``) disappears
entirely: Spark's partitioned file scan + spill-aware executors replace
it with no code. ``usecols`` projection becomes Catalyst column pruning
(we still ``select`` eagerly so the pruned schema is explicit in the
plan), and ``on_bad_lines='skip'`` becomes ``mode=DROPMALFORMED``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from institutional_fx_etl_spark.sources import schemas


def read_m1_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1 — legacy M1 bar scan (hybrid_merger.py:42-52).

    CSV ``Date,Time,Open,High,Low,Close,TickVol`` (header line present
    but replaced by the declared names) → canonical candle relation with
    a parsed UTC ``datetime`` and an all-null ``spread`` column.
    """
    raw = (
        spark.read.schema(schemas.M1_CSV_SCHEMA)
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    return raw.select(
        F.to_timestamp(
            F.concat_ws(" ", F.col("Date"), F.col("Time")), "yyyy.MM.dd HH:mm:ss"
        ).alias("datetime"),
        F.col("Open").alias("open"),
        F.col("High").alias("high"),
        F.col("Low").alias("low"),
        F.col("Close").alias("close"),
        F.col("TickVol").alias("volume"),
        F.lit(None).cast("double").alias("spread"),
    )


def read_tick_csv(spark: SparkSession, path: str) -> DataFrame:
    """S2 — raw tick quote scan (hybrid_merger.py:66-74).

    CSV ``datetime,ask,bid,av,bv``; only the first three columns are
    kept (the select drives Catalyst's column pruning into the reader),
    malformed lines dropped.
    """
    raw = (
        spark.read.schema(schemas.TICK_CSV_SCHEMA)
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    return raw.select("datetime", "ask", "bid")


def read_parquet_nanos_safe(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` that tolerates TIMESTAMP(NANOS) columns.

    Spark rejects nanosecond parquet timestamps unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set (then they scan as
    LongType epoch-nanos). :func:`session.get_spark` sets it up front;
    when running under a FOREIGN session (e.g. the test driver's), set
    it at runtime on first failure and retry — the conf is a runtime
    SQL conf, so this is safe and idempotent.
    """
    try:
        return spark.read.parquet(path)
    except Exception as e:  # noqa: BLE001 — retry only the known case
        if "PARQUET_TYPE_ILLEGAL" not in str(e):
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated parquet table from ``sf_dir``.

    Nanos timestamp columns scan as LongType (see
    :func:`read_parquet_nanos_safe`) and are converted back to
    microsecond timestamps here (integer floor division — matching
    DuckDB/Arrow ns→us truncation) so downstream code sees
    TimestampType.
    """
    df = read_parquet_nanos_safe(spark, f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer `div`, NOT `/`: double division loses precision on
        # epoch-nanos magnitudes (~1e18 > 2^53)
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several test tables at once; defaults to all of them."""
    names = names or tuple(schemas.TESTDATA_TABLES)
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str = "id",
) -> DataFrame:
    """JSONL document scan — the interchange format most training
    corpora ship as (one JSON object per line). Explicit schema (no
    sampling-based inference pass over 100 TB), PERMISSIVE mode with a
    ``_corrupt`` capture column so a torn line degrades to one
    auditable row instead of failing the scan; output is the engine's
    canonical ``documents`` relation (doc_id, text + passthrough
    metadata)."""
    schema = (
        f"`{id_field}` BIGINT, `{text_field}` STRING, lang STRING,"
        " source STRING, _corrupt STRING"
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    return raw.select(
        F.col(id_field).alias("doc_id"),
        F.col(text_field).alias("text"),
        "lang",
        "source",
        "_corrupt",
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning properties as parquet
    via Spark's native vectorized ORC reader; here so a warehouse
    standardized on ORC can feed every operator unchanged."""
    return spark.read.orc(path)
