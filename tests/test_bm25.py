"""BM25 formula vs hand-computed values on a 10-doc corpus (SURVEY §7.1 step 5)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.search import bm25

K1, B = 1.2, 0.75

DOCS = [
    (0, "apple banana apple"),
    (1, "banana cherry"),
    (2, "apple apple apple banana"),
    (3, "cherry date"),
    (4, "apple"),
    (5, "banana banana banana"),
    (6, "date elder fig"),
    (7, "apple cherry"),
    (8, "fig"),
    (9, "banana date"),
]


def hand_bm25(tf, dl, avgdl, df, n):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, "r", f"p{i}", "c", "python", t) for i, t in DOCS],
        ["doc_id", "repo", "path", "commit", "lang", "content"],
    )


def test_term_freqs_and_stats(spark, corpus):
    docs = bm25.doc_table(corpus, tokenizer="native")
    tf = bm25.term_freqs(docs)
    got = {(r.term, r.doc_id): r.tf for r in tf.collect()}
    assert got[("apple", 0)] == 2
    assert got[("apple", 2)] == 3
    assert got[("banana", 5)] == 3
    ts = {r.term: (r.df, r.cf) for r in bm25.term_stats(tf).collect()}
    assert ts["apple"] == (4, 7)
    assert ts["banana"] == (5, 7)
    assert ts["fig"] == (2, 2)


def test_bm25_scores_match_hand_computation(spark, corpus):
    docs = bm25.doc_table(corpus, tokenizer="native")
    tf = bm25.term_freqs(docs)
    ts = bm25.term_stats(tf)
    cs = bm25.corpus_stats(docs).collect()[0]
    n, avgdl = int(cs.n_docs), float(cs.avg_doc_len)
    assert n == 10
    assert avgdl == pytest.approx(sum(len(t.split()) for _, t in DOCS) / 10)

    scored = bm25.scored_postings(tf, ts, n, avgdl)
    got = {
        (r.term, r.doc_id): r.score
        for r in scored.filter(F.col("term") == "apple").collect()
    }
    # df(apple)=4; dl(0)=3, dl(2)=4, dl(4)=1
    assert got[("apple", 0)] == pytest.approx(hand_bm25(2, 3, avgdl, 4, 10), rel=1e-12)
    assert got[("apple", 2)] == pytest.approx(hand_bm25(3, 4, avgdl, 4, 10), rel=1e-12)
    assert got[("apple", 4)] == pytest.approx(hand_bm25(1, 1, avgdl, 4, 10), rel=1e-12)


def test_content_sha256_invariant(spark, corpus):
    """Per-row invariant (north_rule): docs.content_sha256 == sha2(source)."""
    docs = bm25.doc_table(corpus, tokenizer="native")
    joined = docs.select("doc_id", "content_sha256").join(
        corpus.select("doc_id", F.sha2("content", 256).alias("src_sha")), "doc_id"
    )
    assert joined.filter(F.col("content_sha256") != F.col("src_sha")).count() == 0
