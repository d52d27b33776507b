"""Okapi BM25 (k1=1.2, b=0.75) as native Catalyst column expressions.

The reference delegates scoring to Lucene's BM25 similarity (ES 6.2 default;
client pinned at /root/reference/pom.xml:84-88). Formula (Lucene classic):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm(t,d)= tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(t,d)  = idf(t) * tf_norm(t,d)

Everything here is whole-stage-codegen'd column arithmetic — scoring never
enters Python. These same expressions back BOTH the brute-force oracle path
(explode -> join -> groupBy -> sum; the analog of the reference's independent
PostgreSQL twin, /root/reference/src/test/resources/search/basic.sql) and the
per-posting precomputed scores stored in the compressed index blocks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gazetteer_search_spark import BM25_B, BM25_K1
from gazetteer_search_spark.analyzer.tokenizer import (
    native_tokens_expr,
    tokens_pandas_udf,
)


def idf_col(df_: Column, n_docs: Column | int) -> Column:
    n = F.lit(n_docs) if isinstance(n_docs, int) else n_docs
    return F.log(
        1.0 + (n.cast("double") - df_ + 0.5) / (df_.cast("double") + 0.5)
    )


def tf_norm_col(tf: Column, doc_len: Column, avg_dl: Column | float) -> Column:
    a = F.lit(avg_dl) if isinstance(avg_dl, float) else avg_dl
    return (tf.cast("double") * (BM25_K1 + 1.0)) / (
        tf.cast("double")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * doc_len.cast("double") / a)
    )


# Marked nondeterministic ON PURPOSE (it is deterministic): stops Catalyst's
# CollapseProject from inlining the UDF invocation into every downstream
# reference (tokens + size(tokens) would otherwise become TWO ArrowEvalPython
# evaluations of the whole kernel — observed 2x tokenize cost in the plan).
_tokens_udf_once = tokens_pandas_udf.asNondeterministic()


def tokens_col(content: Column, tokenizer: str = "pandas") -> Column:
    """tokenizer='pandas': full code-aware kernel (Arrow-batched).
    tokenizer='native': simple pipeline, pure JVM (identical on word text)."""
    if tokenizer == "pandas":
        return _tokens_udf_once(content)
    if tokenizer == "native":
        return native_tokens_expr(content)
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def doc_table(
    corpus: DataFrame, tokenizer: str = "pandas", store_content: bool = False
) -> DataFrame:
    """corpus(doc_id, repo, path, commit, lang, content) ->
    docs + tokens + doc_len + content_sha256 (per-row invariant, north_rule).
    ``src_doc_id`` (present after builder.cluster_corpus_ids) rides along —
    the original corpus id stays queryable next to the clustered one.
    ``store_content=True`` keeps the raw content column — the Lucene
    stored-fields / ES ``_source`` analog backing serving-side snippets
    (search/snippets.py): the docs store is doc_part-partitioned and
    doc_id-sorted parquet, so hit hydration reads only the content column
    chunks of the few row groups holding the winners; analytics scans that
    don't project content never pay for it (columnar pruning)."""
    cols = [
        "doc_id",
        *(["src_doc_id"] if "src_doc_id" in corpus.columns else []),
        "repo",
        "path",
        "commit",
        "lang",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        *(["content"] if store_content else []),
        "tokens",
        F.size("tokens").alias("doc_len"),
    ]
    return corpus.withColumn(
        "tokens", tokens_col(F.col("content"), tokenizer)
    ).select(*cols)


def term_freqs(docs: DataFrame) -> DataFrame:
    """docs(doc_id, tokens, doc_len, lang, ...) -> (term, doc_id, tf, doc_len, lang).

    The G5 analog (SURVEY §2.4): one shuffle on (term, doc_id) with map-side
    partial aggregation (hash agg) — the key is near-unique so no skew here;
    skew lives in the per-term packing stage, handled by salting in builder.py.
    """
    # doc_len is functionally dependent on doc_id: putting it in the grouping
    # key (instead of first()) keeps the aggregation hash-based — first()
    # forces a SortAggregate (sort per partition, measured ~10x slower).
    # Only the columns BM25 needs go through this (the biggest) shuffle.
    # attr_id (the block-pruning filter dimension's dictionary id, also
    # doc_id-dependent) rides the same key when the builder attached it.
    keys = ["term", "doc_id", "doc_len"] + (
        ["attr_id"] if "attr_id" in docs.columns else []
    )
    return (
        docs.select(*keys[1:], F.explode("tokens").alias("term"))
        .groupBy(*keys)
        .agg(F.count("*").alias("tf"))
    )


def term_stats(tf: DataFrame) -> DataFrame:
    """(term, df, cf) — ts_stat analog (reference init.sql:180-190)."""
    return tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )


def corpus_stats(docs: DataFrame) -> DataFrame:
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avg_doc_len"),
        F.max("doc_id").alias("max_doc_id"),
    )


def scored_postings(
    tf: DataFrame, tstats: DataFrame, n_docs: int, avg_dl: float,
    score_df_col: str = "df",
) -> DataFrame:
    """Per-posting BM25 score precomputed at index time (query-independent):
    (term, doc_id, tf, doc_len, df, score).

    ``score_df_col``: which tstats column carries the df used in the idf —
    segment builds score with the BASE index's frozen df (so unchanged docs
    keep identical scores across generations) while the plain ``df`` column
    still reflects the local corpus for salting/partitioning decisions."""
    return tf.join(tstats, "term").withColumn(
        "score",
        idf_col(F.col(score_df_col), n_docs)
        * tf_norm_col(F.col("tf"), F.col("doc_len"), avg_dl),
    )


# ---------------------------------------------------------------------------
# function_score decay family (ES gauss / exp / linear decay functions)
# ---------------------------------------------------------------------------

def gauss_decay(
    value: Column, origin: float, scale: float,
    offset: float = 0.0, decay: float = 0.5,
) -> Column:
    """ES function_score ``gauss`` decay: 1.0 inside ``offset`` of
    ``origin``, then exp(-(d - offset)^2 / (2 sigma^2)) with sigma chosen so
    the multiplier equals ``decay`` at distance ``scale`` — the exact ES
    formula (sigma^2 = -scale^2 / (2 ln decay)). Pure Catalyst arithmetic;
    multiply into any score column."""
    import math

    if not (0.0 < decay < 1.0):
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    sigma2 = -(scale * scale) / (2.0 * math.log(decay))
    d = F.greatest(
        F.abs(value.cast("double") - F.lit(float(origin))) - F.lit(float(offset)),
        F.lit(0.0),
    )
    return F.exp(-(d * d) / F.lit(2.0 * sigma2))


def exp_decay(
    value: Column, origin: float, scale: float,
    offset: float = 0.0, decay: float = 0.5,
) -> Column:
    """ES ``exp`` decay: exp(lambda * max(0, |v - origin| - offset)) with
    lambda = ln(decay) / scale."""
    import math

    if not (0.0 < decay < 1.0):
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    lam = math.log(decay) / scale
    d = F.greatest(
        F.abs(value.cast("double") - F.lit(float(origin))) - F.lit(float(offset)),
        F.lit(0.0),
    )
    return F.exp(d * F.lit(lam))


def linear_decay(
    value: Column, origin: float, scale: float,
    offset: float = 0.0, decay: float = 0.5,
) -> Column:
    """ES ``linear`` decay: max(0, (s - d) / s) with
    s = scale / (1 - decay); floors at zero beyond the support."""
    if not (0.0 < decay < 1.0):
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    s = scale / (1.0 - decay)
    d = F.greatest(
        F.abs(value.cast("double") - F.lit(float(origin))) - F.lit(float(offset)),
        F.lit(0.0),
    )
    return F.greatest(
        (F.lit(s) - d) / F.lit(s), F.lit(0.0)
    )
