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


# ---------------------------------------------------------------------------
# quoted-phrase query syntax in the search ladder (engine._phrase_rung)
# ---------------------------------------------------------------------------

def test_parse_phrase_query():
    assert ph.parse_phrase_query('"merge postings"') == (
        [(["merge", "postings"], 0, None)], "")
    assert ph.parse_phrase_query('"merge postings"~2 block') == (
        [(["merge", "postings"], 2, None)], "block")
    two = ph.parse_phrase_query('"block max" near "merge postings"~1')
    assert two == (
        [(["block", "max"], 0, None), (["merge", "postings"], 1, None)],
        "near",
    )
    # match_phrase_prefix form: trailing * inside the quotes
    assert ph.parse_phrase_query('"merge post*"') == (
        [(["merge"], 0, "post")], "")
    assert ph.parse_phrase_query('"merge post*"~1') == (
        [(["merge"], 1, "post")], "")
    # camelCase last word: fixed sub-tokens stay slots, tail is the prefix
    assert ph.parse_phrase_query('"mergePost*"') == (
        [(["merge"], 0, "post")], "")
    assert ph.parse_phrase_query('"post*"') == ([([], 0, "post")], "")
    # no quotes / unbalanced / empty quotes -> ordinary ladder
    assert ph.parse_phrase_query("merge postings") is None
    assert ph.parse_phrase_query('"merge postings') is None
    assert ph.parse_phrase_query('"" merge') is None


def test_quoted_query_matches_explicit_api(spark, index):
    """'"merge postings"' through search() == the explicit search_phrase
    API, on both the Spark path and the serving executor path."""
    eng = SearchEngine(spark, index)
    srv = SearchEngine(spark, index, serving=True)
    opts = SearchOptions(k=15)
    want = [
        (r.doc_id, round(r.score, 9))
        for r in eng.search_phrase(["merge", "postings"], opts).collect()
    ]
    assert want
    got_spark = [
        (r.doc_id, round(r.score, 9))
        for r in eng.search('"merge postings"', opts).collect()
    ]
    got_srv = [
        (r.doc_id, round(r.score, 9))
        for r in srv.search('"merge postings"', opts).collect()
    ]
    assert got_spark == want
    assert got_srv == want


def test_quoted_query_slop_residual_rank_identity(spark, index, doc_tokens):
    """Sloppy phrase + residual text outside the quotes: Spark == serving,
    and every hit satisfies BOTH the positional chain and the residual
    term's presence (the residual joins as a required group)."""
    eng = SearchEngine(spark, index)
    srv = SearchEngine(spark, index, serving=True)
    opts = SearchOptions(k=20)
    q = '"merge postings"~2 block'
    a = [(r.doc_id, round(r.score, 9)) for r in eng.search(q, opts).collect()]
    bhits = [(r.doc_id, round(r.score, 9)) for r in srv.search(q, opts).collect()]
    assert a == bhits and a
    allowed = set(brute_phrase_ids(doc_tokens, ["merge", "postings"], 2))
    for d, _ in a:
        assert d in allowed
        assert "block" in doc_tokens[d]


def test_quoted_response_meta(spark, index):
    srv = SearchEngine(spark, index, serving=True)
    resp = srv.search_response('"merge postings"~1 block', SearchOptions(k=5))
    assert resp["parsed_query"]["phrases"] == [
        {"terms": ["merge", "postings"], "slop": 1}
    ]
    assert resp["rung"] == 1
    assert resp["hits"]


def test_single_token_quoted_is_exactness_only(spark, index):
    """A one-word quote needs no positional verify — it is an exact required
    term (no fuzzy/prefix), identical to the plain one-term rung."""
    srv = SearchEngine(spark, index, serving=True)
    opts = SearchOptions(k=10)
    a = [(r.doc_id, round(r.score, 9))
         for r in srv.search('"merge"', opts).collect()]
    b = [(r.doc_id, round(r.score, 9))
         for r in srv.search("merge", opts).collect()]
    assert a == b and a


def test_quoted_query_without_positions_raises(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_nopos_quoted"))
    idx = builder.build_index(spark, corpus.limit(60), out, n_buckets=4)
    for engine in (SearchEngine(spark, idx), SearchEngine(spark, idx, serving=True)):
        with pytest.raises(ValueError, match="positions"):
            engine.search('"merge postings"', SearchOptions(k=5))


# ---------------------------------------------------------------------------
# multi-generation phrase: segments inherit the positions sidecar; quoted
# queries verify each generation independently; compaction merges live rows
# ---------------------------------------------------------------------------

def _hid(df):
    return df.withColumn(
        "doc_id",
        F.xxhash64("repo", "path", "commit").bitwiseAND(F.lit((1 << 62) - 1)),
    )


def _rewrite(corpus0, lo, hi, tag, content):
    """Version `tag` of docs [lo, hi) with content REPLACED (not appended) —
    the old version's phrases must disappear from live results."""
    return (
        corpus0.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .withColumn(
            "commit",
            F.sha1(F.concat(F.col("doc_id").cast("string"), F.lit(tag))),
        )
        .withColumn("content", F.lit(content))
        .drop("doc_id")
    )


def test_multigen_quoted_phrase_and_compaction(spark, tmp_path_factory):
    from gazetteer_search_spark.index import segments

    root = str(tmp_path_factory.mktemp("seg_phrase"))
    corpus0 = synthetic_corpus(spark, 300).cache()
    builder.build_index(
        spark, _hid(corpus0.drop("doc_id")), root, n_buckets=4, positions=True
    )

    # gen 2 via the LOCAL micro-batch path (default gate), gen 3 via the
    # DISTRIBUTED path (local_threshold=0) — both must inherit positions
    marker = "zephyr quantum flux calibration"
    seg2 = segments.add_segment(
        spark, _rewrite(corpus0, 0, 30, "v2", marker), root, n_buckets=4
    )
    assert seg2.meta.get("positions") is True
    seg3 = segments.add_segment(
        spark, _rewrite(corpus0, 30, 50, "v3", marker), root,
        n_buckets=4, local_threshold=0,
    )
    assert seg3.meta.get("positions") is True
    new_ids = {
        r.doc_id
        for s in (seg2, seg3)
        for r in spark.read.parquet(s.paths.docs).select("doc_id").collect()
    }
    assert len(new_ids) == 50

    eng = segments.open_multi_search(root)  # Spark-free serving
    opts = SearchOptions(k=60)
    hits = eng.search_hits('"zephyr quantum"', opts)
    assert {r.doc_id for r in hits} == new_ids
    # sloppy variant spanning the rewritten content
    near = eng.search_hits('"zephyr flux"~1', opts)
    assert {r.doc_id for r in near} == new_ids

    # a phrase from the ORIGINAL content of the rewritten docs must not
    # surface their superseded versions: every hit is a live doc
    live_ids = {
        r.doc_id
        for r in segments.live_view(spark, root)[0].select("doc_id").collect()
    }
    base_hits = eng.search_hits('"merge postings"', opts)
    assert base_hits and {r.doc_id for r in base_hits} <= live_ids

    # compaction merges the live position rows and keeps phrase capability
    cdir = str(tmp_path_factory.mktemp("seg_phrase_compact"))
    cidx = segments.compact(spark, root, cdir, n_buckets=8)  # bucket change
    assert cidx.meta.get("positions") is True
    got = set(ph.local_phrase_ids(cidx, ["zephyr", "quantum"]).tolist())
    assert got == new_ids
    # candidate sets identical multi-gen vs compacted for a base phrase
    multi = {
        int(i) for i in np.unique(np.concatenate([
            ph.local_phrase_ids(builder.load_index_local(g), ["merge", "postings"])
            for g in segments._gen_dirs(root)
        ])) if int(i) in live_ids
    }
    compacted = set(ph.local_phrase_ids(cidx, ["merge", "postings"]).tolist())
    assert compacted == multi
    ce = SearchEngine(None, builder.load_index_local(cdir), serving=True)
    chits = ce.search_hits('"zephyr quantum"', opts)
    assert {r.doc_id for r in chits} == new_ids


def brute_prefix_phrase_ids(
    doc_tokens: dict, fixed: list[str], prefix: str, slop: int = 0
) -> list[int]:
    """match_phrase_prefix reference semantics: the fixed chain followed by
    ANY token starting with ``prefix`` at the next (slop-windowed) step."""
    hits = []
    for doc_id, toks in doc_tokens.items():
        starts = (
            [i for i, x in enumerate(toks) if x == fixed[0]]
            if fixed
            else [i for i, x in enumerate(toks) if x.startswith(prefix)]
        )
        slots = fixed[1:] if fixed else []

        def chain(k: int, p: int) -> bool:
            if k < len(slots):
                return any(
                    p < q <= p + 1 + slop and chain(k + 1, q)
                    for q, x in enumerate(toks)
                    if x == slots[k]
                )
            if not fixed:  # bare "pre*" phrase: start already matched
                return True
            return any(
                p < q <= p + 1 + slop and toks[q].startswith(prefix)
                for q in range(len(toks))
            )

        if any(chain(0, p) for p in starts):
            hits.append(doc_id)
    return sorted(hits)


@pytest.mark.parametrize("q,fixed,prefix,slop", [
    ('"merge post*"', ["merge"], "post", 0),
    ('"merge post*"~1', ["merge"], "post", 1),
    ('"block ma*"', ["block"], "ma", 0),
])
def test_match_phrase_prefix_bruteforce_both_tiers(
    spark, index, doc_tokens, q, fixed, prefix, slop
):
    """The ES match_phrase_prefix form ("... tail*"): quoted-syntax results
    equal the brute-force token walk on BOTH tiers, and the expansion set
    is the dictionary prefix scan."""
    want = brute_prefix_phrase_ids(doc_tokens, fixed, prefix, slop)
    assert want  # fixture corpus must exercise the hit path
    eng = SearchEngine(spark, index)
    srv = SearchEngine(spark, index, serving=True)
    opts = SearchOptions(k=N_DOCS)
    got_spark = sorted(r.doc_id for r in eng.search(q, opts).collect())
    got_srv = sorted(r.doc_id for r in srv.search(q, opts).collect())
    assert got_spark == want
    assert got_srv == want


def test_match_phrase_prefix_edges(spark, index, doc_tokens):
    eng = SearchEngine(spark, index)
    opts = SearchOptions(k=N_DOCS)
    # unsatisfiable tail: zero dictionary expansions -> zero hits (never
    # degrades to the fixed terms alone)
    assert eng.search('"merge zzzyx*"', opts).collect() == []
    # bare single-slot prefix phrase: presence-only (== prefix term match)
    got = sorted(r.doc_id for r in eng.search('"post*"', opts).collect())
    want = sorted(
        d for d, toks in doc_tokens.items()
        if any(t.startswith("post") for t in toks)
    )
    assert got == want
    # envelope carries the prefix on the phrase clause
    env = eng.search_response('"merge post*"', SearchOptions(k=5))
    assert env["parsed_query"]["phrases"] == [
        {"terms": ["merge"], "slop": 0, "prefix": "post"}
    ]


# ---------------------------------------------------------------------------
# unordered proximity (span_near in_order=false)
# ---------------------------------------------------------------------------

def brute_unordered_ids(
    doc_tokens: dict, terms: list[str], window: int
) -> list[int]:
    """Reference semantics: a choice of one position per DISTINCT term with
    max - min <= window, any order."""
    import itertools

    uniq = list(dict.fromkeys(terms))
    hits = []
    for doc_id, toks in doc_tokens.items():
        pos = [
            [i for i, x in enumerate(toks) if x == t] for t in uniq
        ]
        if any(not p for p in pos):
            continue
        if any(
            max(c) - min(c) <= window
            for c in itertools.product(*pos)
        ):
            hits.append(doc_id)
    return sorted(hits)


UNORDERED_CASES = [
    (["postings", "merge"], 1),   # reversed order still hits adjacents
    (["merge", "postings"], 4),
    (["block", "max"], 2),
    (["merge", "postings", "block"], 8),  # k=3 -> pandas-UDF sweep path
    (["merge"], 0),
]


@pytest.mark.parametrize("terms,window", UNORDERED_CASES)
def test_unordered_candidates_matches_bruteforce(
    spark, index, doc_tokens, terms, window
):
    got = sorted(
        r.doc_id
        for r in ph.unordered_candidates(
            spark, index, terms, window
        ).collect()
    )
    assert got == brute_unordered_ids(doc_tokens, terms, window)


@pytest.mark.parametrize("terms,window", UNORDERED_CASES)
def test_local_unordered_ids_match_spark(spark, index, doc_tokens, terms, window):
    got = ph.local_unordered_near_ids(index, terms, window).tolist()
    assert got == brute_unordered_ids(doc_tokens, terms, window)


def test_unordered_superset_of_ordered(spark, index, doc_tokens):
    """Ordered slop-N hits are a subset of unordered window-(1+N) hits for
    two terms (an ordered chain a<b<=a+1+N implies span <= 1+N)."""
    ordered = set(brute_phrase_ids(doc_tokens, ["merge", "postings"], 2))
    unordered = set(
        ph.local_unordered_near_ids(
            index, ["merge", "postings"], 3
        ).tolist()
    )
    assert ordered <= unordered


def test_engine_search_near_unordered(spark, index, doc_tokens):
    eng = SearchEngine(spark, index, serving=True)
    rows = eng.search_near_unordered(
        ["merge", "postings"], 4, SearchOptions(k=50)
    ).collect()
    got = sorted(r.doc_id for r in rows)
    expect = brute_unordered_ids(doc_tokens, ["merge", "postings"], 4)
    assert got == sorted(expect)[: len(got)] or set(got) <= set(expect)
    # rank-identity with the Spark path
    eng_spark = SearchEngine(spark, index, serving=False)
    rows2 = eng_spark.search_near_unordered(
        ["merge", "postings"], 4, SearchOptions(k=50)
    ).collect()
    assert [(r.doc_id, round(r.score, 6)) for r in rows] == [
        (r.doc_id, round(r.score, 6)) for r in rows2
    ]


# ---------------------------------------------------------------------------
# span_first
# ---------------------------------------------------------------------------

def brute_span_first_ids(doc_tokens: dict, term: str, end: int) -> list[int]:
    return sorted(
        d for d, toks in doc_tokens.items()
        if any(x == term for x in toks[:end])
    )


@pytest.mark.parametrize("term,end", [("merge", 3), ("postings", 1), ("merge", 50)])
def test_span_first_both_tiers(spark, index, doc_tokens, term, end):
    got_spark = sorted(
        r.doc_id
        for r in ph.span_first_candidates(spark, index, term, end).collect()
    )
    got_local = ph.local_span_first_ids(index, term, end).tolist()
    want = brute_span_first_ids(doc_tokens, term, end)
    assert got_spark == want and got_local == want


def test_span_first_engine_rank_identity(spark, index):
    a = SearchEngine(spark, index, serving=True).search_span_first(
        "merge", 5, SearchOptions(k=30)
    ).collect()
    b = SearchEngine(spark, index, serving=False).search_span_first(
        "merge", 5, SearchOptions(k=30)
    ).collect()
    assert [(r.doc_id, round(r.score, 6)) for r in a] == [
        (r.doc_id, round(r.score, 6)) for r in b
    ]
    with pytest.raises(ValueError):
        ph.local_span_first_ids(index, "merge", 0)
