from institutional_fx_etl_spark.plans.pipeline import HybridMergerSpark, cast_final
from institutional_fx_etl_spark.plans.validator import reconcile

__all__ = ["HybridMergerSpark", "cast_final", "reconcile"]
