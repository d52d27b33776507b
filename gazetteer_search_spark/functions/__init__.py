from gazetteer_search_spark.functions.registry import register_sql_functions  # noqa: F401
