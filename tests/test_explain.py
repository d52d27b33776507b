"""Explain API (ES GET /_explain / explain=true analog; beyond reference —
the reference delegates scoring transparency to ES): per-hit per-term BM25
contributions, identical between the Spark path (winners broadcast-joined
onto the bucket-pruned postings decode) and the serving executor's block
point-lookup, and exactly reconstructing each hit's score."""

from __future__ import annotations

import pytest

from gazetteer_search_spark.index import builder
from gazetteer_search_spark.search.engine import (
    SearchEngine,
    SearchOptions,
    TermGroup,
)
from gazetteer_search_spark.sources import synthetic_corpus

N_DOCS = 400


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_explain"))
    return builder.build_index(
        spark, synthetic_corpus(spark, N_DOCS), out, n_buckets=4,
        postings_per_group=128,
    )


@pytest.fixture(scope="module")
def spark_eng(spark, index):
    return SearchEngine(spark, index)


@pytest.fixture(scope="module")
def local_eng(spark, index):
    eng = SearchEngine(spark, index, serving=True)
    assert eng._local is not None
    return eng


def _grp(gid, terms, required=True, weight=1.0):
    return TermGroup(
        group_id=gid, terms=tuple(terms), required=required, weight=weight
    )


CASES = [
    ([_grp(0, ["postings"])], 1, SearchOptions()),
    ([_grp(0, ["merge"]), _grp(1, ["postings"], weight=2.0)], 2, SearchOptions()),
    # dis_max group: only one term per (doc, group) wins, but explain lists
    # every matched term's contribution
    ([_grp(0, ["merge", "block"]), _grp(1, ["index"])], 2, SearchOptions()),
    ([_grp(0, ["postings"])], 1, SearchOptions(lang="python")),
]


@pytest.mark.parametrize("groups,msm,opts", CASES)
def test_local_explain_matches_spark(spark_eng, local_eng, groups, msm, opts):
    want = spark_eng.explain_rung(groups, msm, opts).collect()
    got = local_eng.explain_rung(groups, msm, opts).collect()
    key = lambda r: (r.doc_id, r.term, r.group_id)  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    wmap = {key(r): (r.contrib, r.weighted) for r in want}
    for r in got:
        c, w = wmap[key(r)]
        assert r.contrib == pytest.approx(c, abs=1e-4)
        assert r.weighted == pytest.approx(w, abs=1e-4)


@pytest.mark.parametrize("eng_name", ["spark_eng", "local_eng"])
def test_explanation_reconstructs_score(request, eng_name):
    """The score invariant: sum over clauses of max(weighted contribution)
    equals the hit's reported score (no doc-side boosts in play)."""
    eng = request.getfixturevalue(eng_name)
    groups = [_grp(0, ["merge"]), _grp(1, ["postings"], weight=1.5)]
    opts = SearchOptions()
    hits = {
        r.doc_id: r.score
        for r in eng.search_rung(groups, 2, opts).collect()
    }
    assert hits, "query must match at this corpus size"
    expl = eng.explain_hits(list(hits), groups, opts)
    assert set(expl) == set(hits)
    for doc_id, score in hits.items():
        per_group: dict[int, float] = {}
        for e in expl[doc_id]:
            g = e["group"]
            per_group[g] = max(per_group.get(g, float("-inf")), e["weighted"])
        assert sum(per_group.values()) == pytest.approx(score, abs=2e-3)


def test_explain_point_lookup_skips_blocks(local_eng):
    """The serving explain decodes only blocks whose docID interval holds a
    winner — a point lookup, not a postings scan."""
    ex = local_eng._local
    hits = ex.search_rung([_grp(0, ["postings"])], 1, SearchOptions(k=2))
    ids = [h.doc_id for h in hits]
    ex.counters.reset()
    ex._decode_terms(["postings"])
    total_blocks = ex.counters.decoded.value
    ex.counters.reset()
    rows = ex.explain_hits(ids, [_grp(0, ["postings"])])
    assert rows and {r[0] for r in rows} <= set(ids)
    point_blocks = ex.counters.decoded.value
    # salt runs are contiguous docID ranges, so each winner lands in one
    # block per (term, attr sub-run); two winners must decode strictly
    # fewer blocks than the term's full list holds
    assert point_blocks < total_blocks or total_blocks <= len(ids)


def test_explain_response_envelope(local_eng):
    resp = local_eng.search_response(
        "merge postings", SearchOptions(prefix=False, fuzzy=False), explain=True
    )
    assert resp["hits"]
    for h in resp["hits"]:
        terms = {e["term"] for e in h["explanation"]}
        assert terms  # every hit carries at least one contribution
        assert terms <= {"merge", "postings"}
        for e in h["explanation"]:
            assert set(e) == {"term", "group", "contrib", "weighted"}


def test_explain_empty_ids(local_eng):
    assert local_eng.explain_hits([], [_grp(0, ["postings"])]) == {}
