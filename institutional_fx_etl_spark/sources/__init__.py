from institutional_fx_etl_spark.sources import schemas
from institutional_fx_etl_spark.sources.readers import (
    load_table,
    load_tables,
    read_m1_csv,
    read_tick_csv,
)
from institutional_fx_etl_spark.sources.writers import write_csv, write_parquet

__all__ = [
    "schemas",
    "load_table",
    "load_tables",
    "read_m1_csv",
    "read_tick_csv",
    "write_csv",
    "write_parquet",
]
