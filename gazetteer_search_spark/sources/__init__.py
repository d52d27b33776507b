from gazetteer_search_spark.sources.corpus import (  # noqa: F401
    CORPUS_SCHEMA,
    documents_as_corpus,
    load_documents,
    synthetic_corpus,
)
