from weather4cast_bigdata_spark.functions import arrays, scalar, strings, text

__all__ = ["arrays", "scalar", "strings", "text"]
