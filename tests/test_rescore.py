"""Rescore API (ES rescore analog; beyond reference): re-rank the primary
rung's top-window with a secondary query's weighted contribution. The Spark
path (window doc_ids broadcast onto the secondary terms' pruned postings
scan) and the serving path (block point-lookup) must rank identically, the
combined score must reconstruct exactly, and docs the secondary misses must
keep query_weight x primary."""

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
    out = str(tmp_path_factory.mktemp("idx_rescore"))
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


PRIMARY = [_grp(0, ["merge"]), _grp(1, ["postings"])]
SECONDARY = [_grp(0, ["block"]), _grp(1, ["index"], weight=0.5)]


def test_serving_matches_spark_path(spark_eng, local_eng):
    a = spark_eng.rescore(
        PRIMARY, 1, SECONDARY, window_size=40, rescore_weight=2.0
    ).collect()
    b = local_eng.rescore(
        PRIMARY, 1, SECONDARY, window_size=40, rescore_weight=2.0
    ).collect()
    assert [(r.doc_id, round(r.score, 6)) for r in a] == [
        (r.doc_id, round(r.score, 6)) for r in b
    ]


def test_combined_score_reconstructs(spark_eng, local_eng):
    # combined = qw*primary + rw*sum-over-groups(max weighted contrib),
    # with 0 for secondary misses — checked per hit via explain
    qw, rw = 0.7, 2.0
    hits = local_eng.rescore_rows(
        PRIMARY, 1, SECONDARY, window_size=40,
        query_weight=qw, rescore_weight=rw,
    )
    prim = {
        h.doc_id: h.score
        for h in local_eng._local.search_rung(PRIMARY, 1, SearchOptions(k=40))
    }
    sec = local_eng._local.group_max_scores(list(prim), SECONDARY)
    for h in hits:
        want = qw * prim[h.doc_id] + rw * sec.get(h.doc_id, 0.0)
        assert h.score == pytest.approx(want, abs=1e-9)


def test_secondary_miss_keeps_weighted_primary(local_eng):
    # a secondary query matching nothing must reproduce the primary page
    # scaled by query_weight (rank unchanged)
    base = local_eng._local.search_rung(PRIMARY, 1, SearchOptions(k=20))
    miss = [_grp(0, ["zzznotaword"])]
    hits = local_eng.rescore_rows(
        PRIMARY, 1, miss, window_size=40, query_weight=3.0
    )
    assert [h.doc_id for h in hits] == [h.doc_id for h in base]
    for h, b in zip(hits, base):
        assert h.score == pytest.approx(3.0 * b.score, abs=1e-9)


def test_rescore_changes_ranking(local_eng):
    # sanity that the op does something: with a heavy rescore weight, docs
    # also containing the secondary terms must outrank equal-primary docs
    hits = local_eng.rescore_rows(
        PRIMARY, 1, SECONDARY, window_size=60, rescore_weight=10.0
    )
    base = local_eng._local.search_rung(PRIMARY, 1, SearchOptions(k=20))
    assert [h.doc_id for h in hits] != [h.doc_id for h in base]


def test_k_beyond_window_rejected(spark_eng, local_eng):
    for eng in (spark_eng, local_eng):
        with pytest.raises(ValueError, match="window_size"):
            eng.rescore(
                PRIMARY, 1, SECONDARY, window_size=10,
                options=SearchOptions(k=20),
            )
