"""institutional_fx_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference engine ``redouanebou/Institutional-FX-ETL`` (a single-node
pandas batch ETL for financial time-series fusion; see
``/root/reference/src/hybrid_merger.py``), extended with the operators a
large-scale (100 TB) training-data pipeline needs: deduplication,
similarity search, text analysis, and multimodal-column plumbing.

Design tenets (SURVEY.md §7):

- Declarative DataFrame / Spark SQL plans; Catalyst does pruning,
  pushdown and join selection — nothing here hand-schedules execution.
- Zero Python UDFs on the reference-surface hot path; every reference
  operator maps to built-in JVM expressions.
- Every ordered/grouped operator takes ``partition_cols`` so a
  multi-asset (or multi-tenant) dataset parallelizes; the reference's
  single-symbol case degenerates to one partition, which is correct.
- Null semantics follow the reference's pandas behavior via null-safe
  predicates (SURVEY.md §2.9 traps T1/T3).
"""

from institutional_fx_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
