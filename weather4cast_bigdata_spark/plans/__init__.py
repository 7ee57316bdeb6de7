from weather4cast_bigdata_spark.plans.flagship import flagship_evaluate
from weather4cast_bigdata_spark.plans.registry import REGISTRY, QueryDef

__all__ = ["flagship_evaluate", "REGISTRY", "QueryDef"]
