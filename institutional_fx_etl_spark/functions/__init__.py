from institutional_fx_etl_spark.functions.expectations import check_expectations
from institutional_fx_etl_spark.functions.merge import combine_first
from institutional_fx_etl_spark.functions.nullsafe import drop_where, is_true, not_true
from institutional_fx_etl_spark.functions.skew import salt_join
from institutional_fx_etl_spark.functions.timeutils import (
    fx_offsession_mask,
    time_spine,
    minute_bucket,
)
from institutional_fx_etl_spark.functions.windows import (
    ffill,
    ordered_window,
    pct_change,
    rolling_median_centered,
)

__all__ = [
    "check_expectations",
    "combine_first",
    "drop_where",
    "is_true",
    "not_true",
    "fx_offsession_mask",
    "time_spine",
    "minute_bucket",
    "ffill",
    "ordered_window",
    "pct_change",
    "rolling_median_centered",
    "salt_join",
]
