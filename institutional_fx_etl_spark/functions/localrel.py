"""Driver-local row lists as JVM-native local relations.

``spark.createDataFrame(rows, schema)`` in classic PySpark backs the
result with ``sc.parallelize(rows)`` — a PICKLED Python RDD sliced to
``defaultParallelism`` partitions. Every evaluation of that relation
(and a broadcast hash join re-evaluates it inside its build job) then
launches ``defaultParallelism`` tasks, each attaching a Python worker
to unpickle a handful of rows: profiled at ~6-7 s of executor-busy
time (near-zero CPU — tasks block on the worker socket) per
evaluation on local[32], for relations of <100 rows (guide §4: every
Python-boundary crossing pays, even an empty one).

:func:`local_rows_df` renders small row lists as a SQL ``VALUES``
relation instead — a Catalyst ``LocalRelation`` that lives entirely in
the JVM: zero tasks, zero Python workers, constant-time broadcast
builds. Literal rendering is exact:

- floats go through ``CAST('<repr>' AS DOUBLE)`` — ``repr`` is the
  shortest round-trip decimal, so the parsed double is bit-identical;
- ints/bools/strings/None are plain literals under an outer
  ``CAST(... AS <field ddl>)`` per column;
- lists render as ``array(...)`` with per-element rendering;
- dates/timestamps/decimals use typed literals (session time zone is
  pinned UTC by :func:`session.get_spark`, matching the
  ``createDataFrame`` interpretation of naive datetimes).

Row lists above ``max_literal_rows`` (or containing types without a
literal rendering) fall back to plain ``createDataFrame`` — a giant
``VALUES`` tree would shift the cost into the SQL parser instead
(the MAX_LITERAL_CENTROIDS lesson, round 5).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math as _math
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: above this many rows the VALUES tree costs more to parse/analyze
#: than the python-RDD path costs to execute — fall back
MAX_LITERAL_ROWS = 1000


class _Unrenderable(Exception):
    pass


def _lit(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        # out-of-int64 ints MUST take the createDataFrame fallback: a
        # decimal literal under the outer CAST(... AS BIGINT) would
        # become a silent NULL in non-ANSI mode where createDataFrame
        # raises (r14 ADVICE)
        if -(2**63) <= v < 2**63:
            return f"{v}L"
        raise _Unrenderable("int out of BIGINT range")
    if isinstance(v, float):
        if _math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if _math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, str):
        # backslash escaping below assumes the default parser mode
        # (spark.sql.parser.escapedStringLiterals=false); callers run
        # under session.get_spark which never flips it, and
        # local_rows_df additionally falls back to createDataFrame
        # when the Hive-compat mode is detected (r14 ADVICE)
        esc = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{esc}'"
    if isinstance(v, _decimal.Decimal):
        return f"CAST('{v}' AS DECIMAL(38,{max(0, -v.as_tuple().exponent)}))"
    if isinstance(v, _dt.datetime):
        # naive datetimes: session tz is pinned UTC (session.get_spark),
        # identical to the createDataFrame interpretation
        return f"TIMESTAMP'{v.isoformat(sep=' ')}'"
    if isinstance(v, _dt.date):
        return f"DATE'{v.isoformat()}'"
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(_lit(x) for x in v) + ")"
    raise _Unrenderable(type(v).__name__)


def localized_if_small(
    df: DataFrame,
    max_rows: int = MAX_LITERAL_ROWS,
) -> DataFrame:
    """Materialize a KNOWN-BOUNDED relation once and rebuild it as a
    ``VALUES`` LocalRelation, so every downstream bounded collect
    (broadcast builds, the ``_assign_to`` centroid probe) is a
    driver-local read with NO Spark job (guide §5 job overhead — the
    incremental kNN/SemDeDup paths re-collected the same centroid
    table 3x, each an executeTake over the corpus scan). Returns
    ``df`` unchanged when it exceeds ``max_rows`` (checked with a
    ``take(max_rows + 1)`` guard), so unbounded inputs never collect.
    """
    rows = df.take(max_rows + 1)
    if len(rows) > max_rows:
        return df
    return local_rows_df(
        df.sparkSession, rows, df.schema, max_literal_rows=max_rows
    )


def local_rows_df(
    spark: SparkSession,
    rows: Iterable[tuple],
    schema: StructType | str,
    max_literal_rows: int = MAX_LITERAL_ROWS,
) -> DataFrame:
    """A DataFrame over ``rows`` with ``schema``, preferring a pure-JVM
    ``VALUES`` local relation (no Python-RDD execution) and falling
    back to ``spark.createDataFrame`` for large lists or unrenderable
    values. Semantically identical either way."""
    rows = list(rows)
    st = (
        schema
        if isinstance(schema, StructType)
        else StructType.fromDDL(schema)
    )
    if not rows or len(rows) > max_literal_rows:
        return spark.createDataFrame(rows, st)
    # under Hive-compat string parsing (escapedStringLiterals=true)
    # backslash-escaped quotes in data strings would produce malformed
    # SQL — take the always-correct fallback when any string value
    # needs escaping (r14 ADVICE; the conf is session-static)
    if spark.conf.get(
        "spark.sql.parser.escapedStringLiterals", "false"
    ).lower() == "true" and any(
        isinstance(v, str) and ("\\" in v or "'" in v)
        for r in rows
        for v in r
    ):
        return spark.createDataFrame(rows, st)
    try:
        body = ", ".join(
            "(" + ", ".join(_lit(v) for v in r) + ")" for r in rows
        )
    except _Unrenderable:
        return spark.createDataFrame(rows, st)
    cols = ", ".join(
        f"CAST(c{i} AS {f.dataType.simpleString()}) AS `{f.name}`"
        for i, f in enumerate(st.fields)
    )
    names = ", ".join(f"c{i}" for i in range(len(st.fields)))
    return spark.sql(
        f"SELECT {cols} FROM (VALUES {body}) AS t({names})"
    )
