from gazetteer_search_spark.search.bm25 import (  # noqa: F401
    corpus_stats,
    doc_table,
    idf_col,
    term_freqs,
    term_stats,
    tf_norm_col,
)
# NOTE: engine is imported via its module path (gazetteer_search_spark.search.engine)
# to avoid a package-level import cycle with index.builder.
