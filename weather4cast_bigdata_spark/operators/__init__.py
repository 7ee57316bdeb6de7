from weather4cast_bigdata_spark.operators import (  # noqa: F401
    aggregates,
    dedup,
    joins,
    setops,
    similarity,
    windows,
)

__all__ = ["aggregates", "dedup", "joins", "setops", "similarity", "windows"]
