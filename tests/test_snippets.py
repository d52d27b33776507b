"""Snippets / highlight (search/snippets.py + store_content docs store):
best-line selection semantics, <em> marking (plain + HTML-safe), serving vs
Spark-tier equivalence, missing-stored-content error, segment/compaction
inheritance of the stored content column."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.index import builder, segments
from gazetteer_search_spark.search import snippets as snip
from gazetteer_search_spark.search.engine import (
    SearchEngine,
    SearchOptions,
    TermGroup,
)

DOCS = [
    # doc 0: one line matches both terms (line 3), earlier lines match one
    (
        0,
        "r0",
        "src/a.py",
        "c0",
        "py",
        "import os\n"
        "def mergeRuns(xs):\n"
        "    return merge(sort(xs))\n"
        "    # sort helper below\n",
    ),
    # doc 1: two lines tie on 1 matched term -> earliest line wins
    (
        1,
        "r0",
        "src/b.py",
        "c1",
        "py",
        "x = 1\n"
        "y = merge(a)\n"
        "z = merge(b)\n",
    ),
    # doc 2: camelCase identifier carries the term as a sub-token
    (
        2,
        "r1",
        "src/c.py",
        "c2",
        "py",
        "class SortedMergeJoin:\n"
        "    pass\n",
    ),
    # doc 3: no query term at all (never returned by the search)
    (3, "r1", "src/d.py", "c3", "py", "nothing here\nat all\n"),
]
SCHEMA = "doc_id long, repo string, path string, commit string, lang string, content string"
TERMS = {"merge", "sort"}


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, SCHEMA).cache()


@pytest.fixture(scope="module")
def stored_index(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("snip_idx"))
    return builder.build_index(
        spark, corpus, out, n_buckets=4, store_content=True
    )


# ---------------------------------------------------------------------------
# pure-kernel units
# ---------------------------------------------------------------------------

def test_mark_line_whole_identifier_run():
    # sub-token query marks the WHOLE identifier (grep-practical)
    assert (
        snip.mark_line("def getUserName(self):", {"user"})
        == "def <em>getUserName</em>(self):"
    )
    # joined-identifier query form matches the split identifier too
    assert (
        snip.mark_line("def getUserName(self):", {"getusername"})
        == "def <em>getUserName</em>(self):"
    )
    assert snip.mark_line("plain text", {"zzz"}) == "plain text"


def test_mark_line_html_escapes_outside_marks():
    out = snip.mark_line_html("a & getUserName<b>", {"user"})
    assert out == "a &amp; <em>getUserName</em>&lt;b&gt;"
    # a term equal to an entity substring never corrupts the entity
    out2 = snip.mark_line_html("x & y", {"amp"})
    assert out2 == "x &amp; y"


def test_best_lines_order_and_ties():
    content = DOCS[0][5]
    best = snip.best_lines(content, TERMS, n_lines=3)
    # line 3 matches both terms; lines 2 and 4 match one each (earliest first)
    assert [(b["line_no"], b["n_matched"]) for b in best] == [
        (3, 2),
        (2, 1),
        (4, 1),
    ]
    assert best[0]["snippet"] == "    return merge(sort(xs))"
    assert "<em>merge</em>" in best[0]["marked"]
    assert "<em>sort</em>" in best[0]["marked"]

    tie = snip.best_lines(DOCS[1][5], TERMS, n_lines=1)
    assert tie[0]["line_no"] == 2  # earliest of the equal-score lines


def test_best_lines_truncates_raw_before_marking():
    content = "pad " * 50 + "merge target"
    best = snip.best_lines(content, {"merge"}, n_lines=1, max_len=40)
    assert len(best[0]["snippet"]) == 40
    assert best[0]["snippet"] == (content.split("\n")[0])[:40]


def test_camel_subtoken_matches_line():
    best = snip.best_lines(DOCS[2][5], TERMS, n_lines=1)
    assert best[0]["line_no"] == 1
    assert "<em>SortedMergeJoin</em>" in best[0]["marked"]


# ---------------------------------------------------------------------------
# stored content + serving path
# ---------------------------------------------------------------------------

def test_store_content_flag_persisted(stored_index):
    assert stored_index.stored_content
    assert "content" in [f.name for f in stored_index.docs.schema.fields]


def test_search_response_snippets(spark, stored_index):
    eng = SearchEngine(spark, stored_index, serving=True)
    resp = eng.search_response(
        "merge sort",
        SearchOptions(k=10, prefix=False, fuzzy=False),
        snippet_lines=1,
    )
    hits = {h["doc_id"]: h for h in resp["hits"]}
    assert 0 in hits
    s0 = hits[0]["snippets"][0]
    assert s0["line_no"] == 3
    assert s0["snippet"] == "    return merge(sort(xs))"
    assert "<em>merge</em>" in s0["marked"]
    # every returned hit that contains a query term got a snippet
    for h in resp["hits"]:
        assert h["snippets"], f"doc {h['doc_id']} missing snippet"


def test_snippets_require_stored_content(spark, corpus, tmp_path):
    idx = builder.build_index(
        spark, corpus, str(tmp_path / "plain"), n_buckets=4
    )
    eng = SearchEngine(spark, idx, serving=True)
    with pytest.raises(ValueError, match="store_content"):
        eng.search_response(
            "merge", SearchOptions(k=5, prefix=False, fuzzy=False),
            snippet_lines=1,
        )


def test_serving_matches_spark_tier(spark, corpus, stored_index):
    """The serving kernel (best_lines) and the Spark-tier snippet_df return
    the same (line_no, snippet, n_matched) per winner."""
    eng = SearchEngine(spark, stored_index, serving=True)
    hits = eng.search_rung(
        [
            TermGroup(group_id=0, terms=("merge",), required=True, weight=1.0),
            TermGroup(group_id=1, terms=("sort",), required=True, weight=1.0),
        ],
        2,
        SearchOptions(k=10),
    ).select("doc_id", "score")
    spark_side = {
        r["doc_id"]: (r["line_no"], r["snippet"], r["n_matched"])
        for r in snip.snippet_df(
            hits, corpus, sorted(TERMS), n_lines=1
        ).collect()
    }
    ids = list(spark_side)
    serving_side = eng.snippets_for(ids, TERMS, n_lines=1)
    assert spark_side and set(serving_side) == set(spark_side)
    for i in ids:
        s = serving_side[i][0]
        assert (s["line_no"], s["snippet"], s["n_matched"]) == spark_side[i]


# ---------------------------------------------------------------------------
# generations: segments + compaction inherit stored content
# ---------------------------------------------------------------------------

def test_segment_and_compaction_inherit_content(spark, corpus, tmp_path):
    root = str(tmp_path / "gen")
    builder.build_index(spark, corpus, root, n_buckets=4, store_content=True)
    batch = corpus.filter(F.col("doc_id") == 1).withColumn(
        "content", F.lit("only line\nnew merge sort line\n")
    ).withColumn("commit", F.lit("c1b"))
    segments.add_segment(spark, batch, root, key_cols=("repo", "path"))
    seg_docs = spark.read.parquet(
        builder.IndexPaths(segments.list_segments(root)[-1]["path"]).docs
    )
    assert "content" in seg_docs.columns  # localbuild kept the column

    out = str(tmp_path / "compacted")
    idx2 = segments.compact(spark, root, out)
    assert idx2.stored_content
    eng2 = SearchEngine(spark, idx2, serving=True)
    resp = eng2.search_response(
        "merge sort", SearchOptions(k=10, prefix=False, fuzzy=False),
        snippet_lines=1,
    )
    hit1 = next(h for h in resp["hits"] if h["doc_id"] == 1)
    assert hit1["snippets"][0]["line_no"] == 2
    assert hit1["snippets"][0]["snippet"] == "new merge sort line"
