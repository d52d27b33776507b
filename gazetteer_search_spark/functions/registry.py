"""SQL-surface registration of the engine's scalar functions.

Lets SQL users call the engine's kernels directly (the analog of the
reference exposing its analyzer through every import/query path):

    spark.sql("SELECT gss_tokens(content) FROM corpus")

Native column functions (textstats/bm25) need no registration — they are
composable Column expressions; this registers the pandas-UDF kernels plus a
few convenience wrappers.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gazetteer_search_spark.analyzer.tokenizer import (
    tokenize_pandas,
)


def register_sql_functions(spark: SparkSession) -> None:
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def gss_tokens(s: pd.Series) -> pd.Series:
        return tokenize_pandas(s, joined_identifiers=True)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def gss_tokens_simple(s: pd.Series) -> pd.Series:
        return tokenize_pandas(s, joined_identifiers=False)

    spark.udf.register("gss_tokens", gss_tokens)
    spark.udf.register("gss_tokens_simple", gss_tokens_simple)
