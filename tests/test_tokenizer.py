"""Tokenizer goldens (FIXTURES.md §4) + kernel/native-expr/DuckDB equivalence."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from gazetteer_search_spark.analyzer.tokenizer import (
    duckdb_tokens_sql,
    native_tokens_expr,
    tokenize_pandas,
    tokenize_text,
)
from gazetteer_search_spark.analyzer.query_ir import analyze_query


GOLDENS = [
    # camelCase split + joined identifier (reference transliteration-doubling
    # analog, IndexAnalyzer.java:60-78)
    ("getUserName", ["get", "user", "name", "getusername"]),
    # snake_case
    ("parse_query_token", ["parse", "query", "token", "parsequerytoken"]),
    # acronym boundary
    ("HTTPServer", ["http", "server", "httpserver"]),
    # digit boundaries
    ("utf8Parser", ["utf", "8", "parser", "utf8parser"]),
    # NFD diacritics fold (IndexAnalyzer.removeDiactrics, :33-36)
    ("Bebić", ["bebic"]),
    # punctuation separators / brackets
    ("try { run(); } catch (e) {}", ["try", "run", "catch", "e"]),
    # plain single word: no doubling
    ("spark", ["spark"]),
    ("", []),
    # transliteration doubling (A9 literal, IndexAnalyzer.java:60-78): the
    # Cyrillic identifier is searchable by its Latin spelling AND verbatim
    ("результат", ["rezultat", "результат"]),
    ("Результат èФайл", ["rezultat", "efail", "результат", "фаил"]),
    ("σ λambda", ["s", "lambda", "σ", "λ"]),
]


@pytest.mark.parametrize("text,expected", GOLDENS)
def test_goldens(text, expected):
    assert tokenize_text(text) == expected


def test_batch_matches_single():
    texts = [t for t, _ in GOLDENS]
    batch = tokenize_pandas(pd.Series(texts))
    for t, got in zip(texts, batch):
        assert got == tokenize_text(t)


def test_native_expr_matches_kernel_on_plain_text(spark):
    texts = [
        "key agg row scan slow fast table value",
        "the quick brown fox 42 jumps",
        "spark sql window",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["content"])
    native = [
        r.toks
        for r in df.select(native_tokens_expr(F.col("content")).alias("toks")).collect()
    ]
    kernel = [tokenize_text(t, joined_identifiers=False) for t in texts]
    assert native == kernel


def test_duckdb_sql_matches_kernel_on_plain_text():
    texts = ["key agg row scan slow fast", "camelCase splitsHere too", "a_b c1d"]
    expr = duckdb_tokens_sql("t")
    for t in texts:
        got = duckdb.sql(f"select {expr} as toks from (select ? as t)", params=[t]).fetchone()[0]
        assert got == tokenize_text(t, joined_identifiers=False), t


def test_query_ir_typing():
    q = analyze_query("def mergePostings retries 42 ")
    texts = [t.text for t in q.tokens]
    assert q.prefix is None  # trailing space disables prefix (Query.java:178-185)
    assert "merge" in texts and "postings" in texts and "mergepostings" in texts
    by_text = {t.text: t for t in q.tokens}
    assert by_text["def"].optional  # stop token gates nothing
    assert by_text["42"].numbers_only and by_text["42"].has_numbers
    assert not by_text["merge"].optional


def test_query_ir_prefix():
    q = analyze_query("spark table getUserNam")
    assert q.prefix == "nam"  # last sub-token of the mid-typed identifier
    texts = [t.text for t in q.tokens]
    assert texts == ["spark", "table", "get", "user"]


def test_query_ir_synonym_variants():
    q = analyze_query("str config ")
    by_text = {t.text: t for t in q.tokens}
    assert "string" in by_text["str"].variants
    assert "cfg" in by_text["config"].variants


# ---------------------------------------------------------------------------
# full-kernel DuckDB SQL equivalence (the oracle-side tokenizer): bag-equal to
# the pandas kernel on arbitrary text — camelCase, digits, underscores,
# accents — so BM25 oracles see the same doc_len/tf/df as the engine
# ---------------------------------------------------------------------------

GOLDEN_FULL = [
    "getUserName setVal", "HTTPServer parse", "utf8Parser v2",
    "snake_case_id foo", "__init__ self", "Bebić naïveCache", "результат ok",
    "a_B_c9 X", "MAX_RETRIES 0x1f", "(tokens, flags)",
    "try { run(); } catch (e) {}", "merge sort window", "", "   ",
    "x = 42 y=3.14", "A", "camelCase_mixed_Snake99", "München Straße",
    "éclair_Éclair", "foo123bar", "_",
]


def _duckdb_full_tokens(texts):
    import duckdb

    from gazetteer_search_spark.analyzer.tokenizer import duckdb_tokens_full_sql

    con = duckdb.connect()
    sql = duckdb_tokens_full_sql("t")
    return [
        con.execute(f"SELECT {sql} FROM (SELECT ? AS t)", [s]).fetchone()[0]
        for s in texts
    ]


def test_duckdb_full_sql_matches_pandas_kernel_goldens():
    import pandas as pd

    from gazetteer_search_spark.analyzer.tokenizer import tokenize_pandas

    duck = _duckdb_full_tokens(GOLDEN_FULL)
    kern = tokenize_pandas(pd.Series(GOLDEN_FULL))
    for s, d, k in zip(GOLDEN_FULL, duck, kern):
        assert sorted(d) == sorted(k), s


def test_duckdb_full_sql_matches_pandas_kernel_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pandas as pd

    from gazetteer_search_spark.analyzer.tokenizer import tokenize_pandas

    alphabet = "aB9_ (.;/Ä{é-\t\n" + "zQ0" + "жяРёйσλЩ"

    @settings(max_examples=150, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=40))
    def check(s):
        d = _duckdb_full_tokens([s])[0]
        k = list(tokenize_pandas(pd.Series([s])).iloc[0])
        assert sorted(d) == sorted(k), repr(s)

    check()


def test_bracket_optional_extraction():
    """A5 (IndexAnalyzer.java:105-110,143-152): bracketed tokens are optional."""
    q = analyze_query("mergeSort (legacy variant)", prefix=False)
    by_text = {t.text: t for t in q.tokens}
    assert not by_text["merge"].optional and not by_text["sort"].optional
    assert by_text["legacy"].optional and by_text["variant"].optional
    # a query ending in a bracket group has no search-as-you-type prefix
    q2 = analyze_query("mergeSort (legacy)", prefix=True)
    assert q2.prefix is None
    # without brackets the same last word WOULD be a prefix
    q3 = analyze_query("mergeSort legacy", prefix=True)
    assert q3.prefix == "legacy"


def test_removed_pre_pass_keeps_removed_set():
    """A7 (QueryAnalyzerImpl.java:114-120,282-298): pure function words are
    removed from matching but kept on the IR; keywords stay as optional."""
    q = analyze_query("the merge of postings", prefix=False)
    assert [t.text for t in q.tokens] == ["merge", "postings"]
    assert sorted(q.removed) == ["of", "the"]
    # language keywords are OPTIONAL (still boost), not removed
    q2 = analyze_query("def merge", prefix=False)
    assert {t.text: t.optional for t in q2.tokens} == {"def": True, "merge": False}
    # a removed word never becomes the prefix
    q3 = analyze_query("merge the", prefix=True)
    assert q3.prefix is None and "the" in q3.removed


def test_variant_rules_widened():
    from gazetteer_search_spark.analyzer.rules import expand_variants

    assert "implementation" in expand_variants("impl")
    assert "context" in expand_variants("ctx")
    assert "posting" in expand_variants("postings")  # plural fold variant
    assert "utility" in expand_variants("utilities")  # ies -> y
    assert "2" in expand_variants("v2")
