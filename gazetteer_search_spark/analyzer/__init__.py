from gazetteer_search_spark.analyzer.tokenizer import (  # noqa: F401
    TOKEN_SPLIT_RE,
    native_tokens_expr,
    duckdb_tokens_sql,
    tokenize_pandas,
    tokenize_text,
    tokens_pandas_udf,
)
from gazetteer_search_spark.analyzer.query_ir import QToken, Query, analyze_query  # noqa: F401
