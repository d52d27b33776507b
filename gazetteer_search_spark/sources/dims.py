"""Dimension tables for two-phase search (J1).

Analog of the reference's POI-class dimension: a small table of class names
loaded at import time and matched against query terms before the main search
(reference imp/poi_clases/* import; ESDefaultSearch.java:90-100 queries it,
then folds matches into the address query as filters/boosts while demoting
the matched terms to optional, MainAddressQueryBuilder.java:209-228).

For the code-search graft the class dimension maps language NAMES (the query
vocabulary a user types) to the corpus ``lang`` codes (the filterable class).
One canonical row list — the engine's dim DataFrame and the DuckDB oracle
VALUES are both generated from it, so the two-phase mechanism itself is what
the correctness gate compares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# (dimension term, class value) — dimension terms are analyzer-normal tokens
LANG_CLASS_ROWS: list[tuple[str, str]] = [
    ("english", "en"),
    ("spanish", "es"),
    ("german", "de"),
    ("french", "fr"),
    ("chinese", "zh"),
    ("japanese", "ja"),
    ("russian", "ru"),
]


def lang_class_dim(spark: SparkSession) -> DataFrame:
    """Broadcast-size class dimension (term -> class)."""
    return spark.createDataFrame(LANG_CLASS_ROWS, "term string, class string")
