"""Positional phrase / ordered-proximity search (search/phrase.py) vs a
brute-force token-walk oracle, plus the DuckDB positions-recompute check that
underwrites the phrase_match/phrase_near oracle SQL entries.

Beyond-reference operator: the reference's ES queries never use match_phrase
(MainAddressQueryBuilder.java builds match/bool/prefix only) — phrase and
ordered-window proximity are this engine's code-search addition.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.analyzer.tokenizer import (
    duckdb_tokens_full_sql,
    tokenize_text,
)
from gazetteer_search_spark.index import builder
from gazetteer_search_spark.search import phrase as ph
from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions
from gazetteer_search_spark.sources import synthetic_corpus

N_DOCS = 240


@pytest.fixture(scope="module")
def corpus(spark):
    return synthetic_corpus(spark, N_DOCS).cache()


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_phrase"))
    return builder.build_index(
        spark, corpus, out, n_buckets=8, postings_per_group=128, positions=True
    )


@pytest.fixture(scope="module")
def doc_tokens(corpus):
    return {
        r.doc_id: tokenize_text(r.content)
        for r in corpus.select("doc_id", "content").collect()
    }


def brute_phrase_ids(doc_tokens: dict, terms: list[str], slop: int) -> list[int]:
    """Reference semantics: in-order chain, each next term strictly after the
    previous match and within 1+slop positions."""
    hits = []
    for doc_id, toks in doc_tokens.items():
        pos = {t: [i for i, x in enumerate(toks) if x == t] for t in set(terms)}

        def chain(k: int, p: int) -> bool:
            if k == len(terms):
                return True
            return any(
                p < q <= p + 1 + slop and chain(k + 1, q) for q in pos[terms[k]]
            )

        if any(chain(1, p) for p in pos.get(terms[0], [])):
            hits.append(doc_id)
    return sorted(hits)


CASES = [
    (["merge", "postings"], 0),
    (["merge", "postings"], 2),
    (["block", "max"], 0),
    (["scan", "merge"], 1),  # typically empty — the no-hit path
    (["merge"], 0),  # single-term degenerates to term match
    (["merge", "postings", "block"], 3),  # 3-token sloppy chain
]


@pytest.mark.parametrize("terms,slop", CASES)
def test_phrase_candidates_matches_bruteforce(spark, index, doc_tokens, terms, slop):
    want = brute_phrase_ids(doc_tokens, terms, slop)
    got = sorted(
        r.doc_id for r in ph.phrase_candidates(spark, index, terms, slop).collect()
    )
    assert got == want


@pytest.mark.parametrize("terms,slop", CASES)
def test_local_phrase_ids_matches_bruteforce(index, doc_tokens, terms, slop):
    want = brute_phrase_ids(doc_tokens, terms, slop)
    got = ph.local_phrase_ids(index, terms, slop)
    assert got.dtype == np.int64
    assert got.tolist() == want


def test_repeated_token_phrase(spark, index, doc_tokens):
    # phrase with a duplicated term exercises the uniq-pivot reuse path
    terms = ["merge", "merge"]
    want = brute_phrase_ids(doc_tokens, terms, 1)
    got = sorted(
        r.doc_id for r in ph.phrase_candidates(spark, index, terms, 1).collect()
    )
    loc = ph.local_phrase_ids(index, terms, 1).tolist()
    assert got == want and loc == want


def test_phrase_freq_counts_starts(spark):
    # chain_count_expr unit check on hand-built position arrays
    df = spark.createDataFrame(
        [
            # "a b" at 0-1 and 5-6 -> 2 exact starts; slop=1 adds start 8 (8->10)
            ([0, 5, 8], [1, 6, 10]),
            ([3], [1]),  # out of order -> 0
        ],
        ["p0", "p1"],
    )
    got = df.select(
        ph.chain_count_expr([F.col("p0"), F.col("p1")], 0).alias("exact"),
        ph.chain_count_expr([F.col("p0"), F.col("p1")], 1).alias("slop1"),
    ).collect()
    assert (got[0].exact, got[0].slop1) == (2, 3)
    assert (got[1].exact, got[1].slop1) == (0, 0)


def test_search_phrase_rank_identity_and_scoring(spark, index, doc_tokens):
    """Spark path == serving path, and the score is the plain 2-required-group
    BM25 of the phrase terms restricted to the phrase-verified docs."""
    eng = SearchEngine(spark, index)
    serving = SearchEngine(spark, index, serving=True)
    opts = SearchOptions(k=15)
    a = [(r.doc_id, round(r.score, 9)) for r in eng.search_phrase(
        ["merge", "postings"], opts).collect()]
    b = [(r.doc_id, round(r.score, 9)) for r in serving.search_phrase(
        ["merge", "postings"], opts).collect()]
    assert a == b and a
    allowed = set(brute_phrase_ids(doc_tokens, ["merge", "postings"], 0))
    assert {d for d, _ in a} <= allowed


def test_slop_supersets_exact(spark, index):
    eng = SearchEngine(spark, index)
    exact = {r.doc_id for r in ph.phrase_candidates(
        spark, index, ["merge", "postings"], 0).collect()}
    sloppy = {r.doc_id for r in ph.phrase_candidates(
        spark, index, ["merge", "postings"], 2).collect()}
    assert exact <= sloppy


def test_positions_sidecar_matches_duckdb(spark, index, corpus):
    """Oracle validity: the persisted positions table equals a DuckDB
    recompute from the raw content via duckdb_tokens_full_sql — the exact
    recompute the phrase_match/phrase_near oracle SQL performs (ordered
    stream equality, not just multiset)."""
    got = {
        (r.term, r.doc_id): list(r.positions)
        for r in spark.read.parquet(index.paths.positions).collect()
    }
    pdf = corpus.select("doc_id", F.col("content").alias("text")).toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    toks = duckdb_tokens_full_sql("text")
    want_rows = con.sql(
        f"""
        WITH pt AS (
          SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) - 1 AS pos
          FROM (SELECT doc_id, {toks} AS l FROM documents)
        )
        SELECT term, doc_id, list_sort(list(pos)) AS positions
        FROM pt GROUP BY term, doc_id
        """
    ).fetchall()
    want = {(t, d): list(p) for t, d, p in want_rows}
    assert got == want


def test_phrase_requires_positions_sidecar(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_nopos"))
    idx = builder.build_index(spark, corpus.limit(50), out, n_buckets=4)
    with pytest.raises(ValueError, match="positions"):
        ph.phrase_candidates(spark, idx, ["merge", "postings"])
    with pytest.raises(ValueError, match="positions"):
        ph.local_phrase_ids(idx, ["merge", "postings"])


def test_empty_phrase_raises(spark, index):
    with pytest.raises(ValueError):
        ph.phrase_candidates(spark, index, [])
    eng = SearchEngine(spark, index)
    with pytest.raises(ValueError):
        eng.search_phrase("")
