"""Corpus sources.

The engine's only input is an Iceberg-shaped table of source-code files
(BASELINE.json input_hint): (repo, path, commit, lang, content). Analog of the
reference's NDJSON address import scan
(/root/reference/src/main/java/me/osm/gazetteer/search/imp/addr/AddressesImporter.java:119-152,220-228),
re-expressed as a declarative table scan.

Two providers:
- ``synthetic_corpus``     deterministic generator (seed-free: every value is a
  pure function of the row id, so any scale factor is reproducible and the
  generation is 100% JVM-side column expressions — no Python, no shuffle).
- ``documents_as_corpus``  adapter over the driver's testdata
  ``documents.parquet`` (doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

LANGS = ["python", "java", "js", "go", "none"]
_EXT = {"python": "py", "java": "java", "js": "js", "go": "go", "none": "txt"}

# FIXTURES.md §1 content mix: camelCase, snake_case, ALLCAPS, numerics,
# skewed language keywords (hot tokens), punctuation, a little unicode.
_VOCAB = [
    "def", "return", "class", "public", "static", "void", "import", "for",
    "while", "if", "else", "new", "this",  # hot keyword tokens (skew)
    "getUserName", "setUserName", "parseQueryToken", "buildIndexBlock",
    "mergePostings", "scoreDocument", "openFileStream", "readBufferSize",
    "writeCheckpoint", "HTTPServer", "JSONParser", "XMLReader",
    "parse_query_token", "build_index_block", "merge_postings",
    "score_document", "doc_frequency", "term_frequency", "block_max",
    "delta_encode", "varbyte_decode", "shuffle_partition", "skew_salt",
    "MAX_RETRIES", "DEFAULT_TIMEOUT", "BUFFER_SIZE", "int main argv",
    "x = 42", "y = 3.14", "retries < 16", "port 8080", "v2 utf8Parser",
    "результат", "naïveCache", "Bebić", "(tokens, flags)", "arr[i] += 1",
    "try { run(); } catch (e) {}", "lambda x: x + 1", "return nil",
]

_TOKENS_PER_DOC = 24
_PRIMES = [
    3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67, 71,
    73, 79, 83, 89, 97,
]


def synthetic_corpus(
    spark: SparkSession, n_docs: int, partitions: int | None = None
) -> DataFrame:
    """Deterministic synthetic source-code corpus, arbitrary scale.

    Every column is a pure function of ``doc_id`` — rerunning at any
    parallelism yields byte-identical rows (needed by the resume test and the
    local[8]-vs-local[32] scaling comparison).
    """
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    df = spark.range(0, n_docs, 1, partitions).withColumnRenamed("id", "doc_id")

    vocab = F.array(*[F.lit(v) for v in _VOCAB])
    nv = len(_VOCAB)
    pieces = [
        F.element_at(vocab, (F.pmod(F.col("doc_id") * p + i, F.lit(nv)) + 1).cast("int"))
        for i, p in enumerate(_PRIMES[:_TOKENS_PER_DOC])
    ]
    lang = F.element_at(
        F.array(*[F.lit(lg) for lg in LANGS]),
        (F.pmod(F.col("doc_id"), F.lit(len(LANGS))) + 1).cast("int"),
    )
    ext = F.element_at(
        F.array(*[F.lit(_EXT[lg]) for lg in LANGS]),
        (F.pmod(F.col("doc_id"), F.lit(len(LANGS))) + 1).cast("int"),
    )
    # long-tail identifiers unique-ish per doc (real code has mostly-unique
    # symbol names on top of the hot-keyword head — this is what makes the
    # posting build's group-by-term naturally parallel at scale)
    tail = F.format_string(
        "sym%d id%d fn%d",
        F.pmod("doc_id", F.lit(50021)),
        F.pmod(F.col("doc_id") * 31, F.lit(9973)),
        F.pmod(F.col("doc_id") * 17, F.lit(29989)),
    )
    return df.select(
        "doc_id",
        F.format_string(
            "org%d/repo%d", F.pmod("doc_id", F.lit(7)), F.pmod("doc_id", F.lit(23))
        ).alias("repo"),
        F.concat(
            F.format_string("src/pkg%d/Mod%d.", F.pmod("doc_id", F.lit(13)), F.col("doc_id")),
            ext,
        ).alias("path"),
        F.sha1(F.col("doc_id").cast("string")).alias("commit"),
        lang.alias("lang"),
        F.concat_ws(" ", *pieces, tail).alias("content"),
    )


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's documents table to the input_hint corpus shape.

    The synthetic ``path`` carries the document's first two content words as
    directory components — a deterministic, oracle-reproducible "name" field
    (the filename analog of the reference's address *name*), so per-field
    postings and cross-field boosts (P11, name^5) have something real to
    match. Separators are '/' and '.' only: no identifier in the path folds
    into sub-tokens, so path tokens are identical under the simple and full
    tokenizer pipelines."""
    from gazetteer_search_spark.analyzer.tokenizer import native_tokens_expr

    d = load_documents(spark, sf_dir)
    toks = native_tokens_expr(F.col("text"))
    w1 = F.coalesce(F.element_at(toks, 1), F.lit("na"))
    w2 = F.coalesce(F.element_at(toks, 2), F.lit("na"))
    return d.select(
        F.col("doc_id"),
        F.col("source").alias("repo"),
        F.concat_ws(
            "/", F.lit("docs"), w1, w2, F.concat(F.col("doc_id").cast("string"), F.lit(".txt"))
        ).alias("path"),
        F.sha1(F.col("doc_id").cast("string")).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
