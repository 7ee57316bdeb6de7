from weather4cast_bigdata_spark.sources.catalog import TABLES, load_tables, register_views

__all__ = ["TABLES", "load_tables", "register_views"]
