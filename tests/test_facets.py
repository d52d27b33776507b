"""Facet aggregations over the FULL match set (ES aggregations-on-query
analog; beyond reference — the reference's ES queries attach aggs the same
way): Spark single-pass agg vs the serving executor's numpy twin vs the
multi-generation merge, plus the HTTP surface."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.index import builder
from gazetteer_search_spark.search.engine import (
    SearchEngine,
    SearchOptions,
    TermGroup,
)
from gazetteer_search_spark.server import make_server
from gazetteer_search_spark.sources import synthetic_corpus

N_DOCS = 400


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_facet"))
    return builder.build_index(
        spark, synthetic_corpus(spark, N_DOCS), out, n_buckets=4
    )


@pytest.fixture(scope="module")
def spark_eng(spark, index):
    return SearchEngine(spark, index)


@pytest.fixture(scope="module")
def local_eng(spark, index):
    return SearchEngine(spark, index, serving=True)


def _grp(gid, terms, required=True, weight=1.0):
    return TermGroup(
        group_id=gid, terms=tuple(terms), required=required, weight=weight
    )


CASES = [
    ([_grp(0, ["postings"])], 1, SearchOptions()),
    ([_grp(0, ["merge"]), _grp(1, ["postings"])], 2, SearchOptions()),
    ([_grp(0, ["merge"]), _grp(1, ["block"])], 1, SearchOptions()),
    ([_grp(0, ["postings"])], 1, SearchOptions(lang="python")),
    ([_grp(0, ["postings"])], 1, SearchOptions(repo="org1/repo1")),
    ([], 0, SearchOptions()),  # match_all facets = whole-corpus histogram
    ([], 0, SearchOptions(path_prefix="src/pkg1/")),
]


@pytest.mark.parametrize("groups,msm,opts", CASES)
def test_local_facets_match_spark(spark_eng, local_eng, groups, msm, opts):
    keys = ("lang", "repo")
    want = sorted(
        (r.facet, r.value, r.doc_count)
        for r in spark_eng.facets(groups, msm, opts, keys=keys, size=100).collect()
    )
    got = sorted(
        (r.facet, r.value, r.doc_count)
        for r in local_eng.facets(groups, msm, opts, keys=keys, size=100).collect()
    )
    assert got == want
    assert want, "facet case must produce buckets"


def test_facet_counts_match_exhaustive_search(spark_eng):
    """Bucket counts equal the real match-set partition: the match set's
    own groupBy, recomputed independently via match_set."""
    groups = [_grp(0, ["postings"])]
    m = spark_eng.match_set(groups, 1, SearchOptions())
    want = {
        (r["lang"], r["n"])
        for r in m.groupBy("lang").agg(F.count("*").alias("n")).collect()
        if r["lang"] is not None
    }
    got = {
        (r.value, r.doc_count)
        for r in spark_eng.facets(
            groups, 1, SearchOptions(), keys=("lang",), size=100
        ).collect()
    }
    assert got == want
    # and the total across buckets is the distinct match count (no nulls in
    # the synthetic lang column)
    assert sum(c for _, c in got) == m.count()


def test_facet_bucket_order_and_size(local_eng):
    rows = local_eng.facet_rows(
        [_grp(0, ["postings"])], 1, SearchOptions(), keys=("repo",), size=3
    )
    assert len(rows) <= 3
    counts = [c for _, _, c in rows]
    assert counts == sorted(counts, reverse=True)


def test_facet_unknown_key_raises(spark_eng, local_eng):
    for eng in (spark_eng, local_eng):
        with pytest.raises(ValueError, match="facet"):
            eng.facets([_grp(0, ["postings"])], 1, SearchOptions(), keys=("nope",))


def test_facets_multigen(spark, index, tmp_path_factory):
    """Across generations: upserted docs count in exactly ONE generation
    (tombstones mask the superseded copies)."""
    import shutil

    from gazetteer_search_spark.index import segments as segs

    root = str(tmp_path_factory.mktemp("idx_facet_seg"))
    shutil.rmtree(root)
    shutil.copytree(index.paths.root, root)
    upd = (
        synthetic_corpus(spark, 30)
        .withColumn("lang", F.lit("zig"))
        .withColumn("commit", F.sha1(F.concat_ws("-", "path", F.lit("v2"))))
    )
    segs.add_segment(spark, upd, root, n_buckets=2)
    meng = segs.open_multi_search(root)
    rows = meng.facet_rows([], 0, SearchOptions(), keys=("lang",), size=100)
    by_val = {v: c for _, v, c in rows}
    assert by_val.get("zig") == 30
    # total live docs unchanged: 30 upserts tombstone their 30 old copies
    assert sum(by_val.values()) == N_DOCS


def test_http_facet_param(local_eng):
    srv = make_server(local_eng, SearchOptions(k=5, prefix=False), port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(
            f"{base}/search?q=postings&facet=lang&facet=repo&facet_size=3"
        ) as r:
            env = json.loads(r.read())
        assert set(env["facets"]) == {"lang", "repo"}
        assert env["facets"]["lang"], "lang buckets must exist"
        assert all(len(b) <= 3 for b in env["facets"].values())
        # facet counts cover the FULL match set, not the k=5 page
        assert sum(
            b["doc_count"] for b in env["facets"]["lang"]
        ) >= env["total_hits"]
        # no facet param -> no facets key
        with urllib.request.urlopen(f"{base}/search?q=postings") as r:
            env2 = json.loads(r.read())
        assert "facets" not in env2
    finally:
        srv.shutdown()


def test_significant_terms_shape_and_gates(spark_eng):
    """significant_terms (ES significant_terms analog): every returned term
    is genuinely over-represented (fg% > bg%), respects min_doc_count,
    excludes name-field postings, and an impossible query yields zero rows."""
    from gazetteer_search_spark.search.engine import SearchOptions, TermGroup

    g = [TermGroup(group_id=0, terms=("merge",), required=True)]
    rows = spark_eng.significant_terms(g, 1, SearchOptions(), size=20).collect()
    assert rows
    n = spark_eng.index.n_docs
    fg_total = spark_eng.count_matches(g, 1, SearchOptions())
    for r in rows:
        assert ":" not in r.term
        assert r.fg_count >= 2
        assert r.fg_count / fg_total > r.bg_count / n
        fgp, bgp = r.fg_count / fg_total, r.bg_count / n
        assert r.score == pytest.approx((fgp - bgp) * (fgp / bgp), abs=1e-5)
    # the query term itself is trivially most significant when fg == df
    assert rows[0].term in {rt.term for rt in rows}
    empty = spark_eng.significant_terms(
        [TermGroup(group_id=0, terms=("zzznotaword",), required=True)], 1
    )
    assert empty.count() == 0
