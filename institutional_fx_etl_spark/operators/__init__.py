from institutional_fx_etl_spark.operators.ohlc import ticks_to_candles
from institutional_fx_etl_spark.operators.consensus import consensus_filter
from institutional_fx_etl_spark.operators.clean import validate_and_clean
from institutional_fx_etl_spark.operators.spread import repair_spread
from institutional_fx_etl_spark.operators.densify import densify_grid

__all__ = [
    "ticks_to_candles",
    "consensus_filter",
    "validate_and_clean",
    "repair_spread",
    "densify_grid",
]
