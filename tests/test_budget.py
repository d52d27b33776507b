"""ES search-budget params: terminate_after + timeout (serving tier).

terminate_after is deterministic (collection-order cut) and verified
against a brute-force recompute; timeout is best-effort and verified at
its two edges (expired-immediately and effectively-unlimited).
"""

from __future__ import annotations

import json
import threading
import urllib.request
from dataclasses import replace

import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.index import builder
from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("budget") / "idx")
    # every doc contains 'alpha'; varying doc lengths vary the BM25 score
    corpus = spark.range(0, 60).select(
        (F.col("id") * 7 % 101).alias("doc_id"),  # non-contiguous ids
        F.lit("org/r").alias("repo"),
        F.format_string("src/%d.py", "id").alias("path"),
        F.lit("c").alias("commit"),
        F.lit("python").alias("lang"),
        F.concat(
            F.lit("alpha "),
            F.expr("repeat('filler ', CAST(id % 13 AS INT))"),
            F.when(F.col("id") % 3 == 0, F.lit(" beta")).otherwise(F.lit("")),
        ).alias("content"),
    )
    builder.build_index(spark, corpus, root, n_buckets=2)
    return SearchEngine(spark, builder.load_index(spark, root), serving=True)


OPTS = SearchOptions(k=10, prefix=False, fuzzy=False, coalesce=False)


def test_terminate_after_matches_bruteforce(eng):
    """The cut keeps the FIRST N matching docs in docID order; ranking
    then happens among those N only — recomputed from the full result."""
    full = eng.search_hits("alpha", replace(OPTS, k=1000))
    assert len(full) == 60  # every doc matches
    by_id = sorted(full, key=lambda h: h.doc_id)
    n = 7
    surviving = {h.doc_id for h in by_id[:n]}
    expected = sorted(
        (h for h in full if h.doc_id in surviving),
        key=lambda h: (-round(h.score, 9), h.doc_id),
    )[:10]

    cut = eng.search_hits("alpha", replace(OPTS, terminate_after=n))
    assert [(h.doc_id, round(h.score, 9)) for h in cut] == [
        (h.doc_id, round(h.score, 9)) for h in expected
    ]
    flags = eng.last_search_flags()
    assert flags["terminated_early"] is True and flags["timed_out"] is False


def test_terminate_after_above_match_count_is_noop(eng):
    base = eng.search_hits("alpha", OPTS)
    same = eng.search_hits("alpha", replace(OPTS, terminate_after=10_000))
    assert [(h.doc_id, round(h.score, 9)) for h in base] == [
        (h.doc_id, round(h.score, 9)) for h in same
    ]
    assert eng.last_search_flags()["terminated_early"] is False


def test_timeout_edges(eng):
    # effectively-unlimited budget: identical results, flag down
    base = eng.search_hits("alpha beta", OPTS)
    ok = eng.search_hits("alpha beta", replace(OPTS, timeout_ms=60_000))
    assert [(h.doc_id, round(h.score, 9)) for h in ok] == [
        (h.doc_id, round(h.score, 9)) for h in base
    ]
    assert eng.last_search_flags()["timed_out"] is False
    # already-expired budget: partial (here: empty) results, flag up
    gone = eng.search_hits("alpha beta", replace(OPTS, timeout_ms=1e-9))
    assert gone == []
    assert eng.last_search_flags()["timed_out"] is True


def test_http_budget_params(eng):
    from gazetteer_search_spark.server import make_server

    srv = make_server(eng, OPTS, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        def get(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}"
            ) as r:
                return json.loads(r.read()), r.headers.get("X-Cache")

        # default envelope carries NO budget keys (byte-stable contract)
        env, _ = get("/search?q=alpha&size=3")
        assert "timed_out" not in env and "terminated_early" not in env

        env, _ = get("/search?q=alpha&size=3&terminate_after=5")
        assert env["terminated_early"] is True and env["timed_out"] is False
        assert len(env["hits"]) == 3

        env, _ = get("/search?q=alpha&size=3&timeout_ms=60000")
        assert env["timed_out"] is False and len(env["hits"]) == 3

        # a timed-out partial page is never request-cached: the repeat
        # stays a MISS (fresh shot at completing within its budget)
        env, cache1 = get("/search?q=alpha&size=3&timeout_ms=0.000001")
        assert env["timed_out"] is True and env["hits"] == []
        env, cache2 = get("/search?q=alpha&size=3&timeout_ms=0.000001")
        assert cache1 == "MISS" and cache2 == "MISS"
    finally:
        srv.shutdown()


def test_deadline_cleared_after_search(eng):
    """A timed-out search must not poison later non-search decodes: the
    deadline is this search's budget only (regression: it stayed armed,
    so match_count/facets/explain silently returned empty forever after)."""
    ex = eng._local
    assert ex is not None
    gone = eng.search_hits("alpha", replace(OPTS, timeout_ms=1e-9))
    assert gone == [] and eng.last_search_flags()["timed_out"] is True
    # the very next non-search decode is exact, not deadline-gated
    from gazetteer_search_spark.analyzer.query_ir import analyze_query
    from gazetteer_search_spark.search.engine import TermGroup

    groups = [TermGroup(group_id=0, terms=("alpha",), required=True)]
    assert ex._deadline is None
    assert ex.match_count(groups, 1, OPTS) == 60
    # and a later un-budgeted search is full-fidelity
    assert len(eng.search_hits("alpha", OPTS)) == 10


def test_must_not_never_violated_under_timeout(eng):
    """Timeout partials must be best-effort, never WRONG: the must_not
    exclusion set always decodes completely (deadline suspended), so no
    returned hit can positively match an excluded term."""
    ex = eng._local
    # control: beta docs excluded without a budget
    base = eng.search_hits("alpha", replace(OPTS, exclude_terms=("beta",)))
    assert base, "control query must match"
    beta_ids = {int(i) for i in ex._excluded_id_set(("beta",))}
    assert beta_ids and not ({h.doc_id for h in base} & beta_ids)
    # expired budget + exclusions: empty page (never a wrongly-included doc)
    gone = eng.search_hits(
        "alpha", replace(OPTS, exclude_terms=("beta",), timeout_ms=1e-9)
    )
    assert gone == []
    # the exclusion decode itself ignores an armed, already-expired deadline
    ex._deadline = 0.0
    try:
        assert {int(i) for i in ex._excluded_id_set(("beta",))} == beta_ids
    finally:
        ex._deadline = None


def test_http_terminate_after_zero_means_disabled(eng):
    """ES semantics: terminate_after=0 = no early termination (regression:
    '0' was clamped to 1, collapsing the page to a single doc)."""
    import threading
    import urllib.request

    from gazetteer_search_spark.server import make_server

    srv = make_server(eng, OPTS, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/search?q=alpha&size=10&terminate_after=0"
        ) as r:
            env = json.loads(r.read())
        assert len(env["hits"]) == 10
        assert "terminated_early" not in env  # disabled = no budget keys
    finally:
        srv.shutdown()


def test_spark_tier_cut_applies_but_flags_omitted(spark, eng, tmp_path):
    """The Spark tier applies the terminate_after cut (finalize_ranked)
    but its lazy plan cannot report whether it fired — the envelope omits
    the flag there instead of hardcoding a misleading False."""
    from gazetteer_search_spark.index import builder
    from gazetteer_search_spark.search.engine import SearchEngine

    # Spark-only engine over the same index (serving executor disabled)
    root = eng.index.paths.root
    spark_eng = SearchEngine(spark, builder.load_index(spark, root))
    assert spark_eng._local is None
    full = spark_eng.search_hits("alpha", replace(OPTS, k=1000))
    n = 7
    by_id = sorted(full, key=lambda r: r.doc_id)
    surviving = {r.doc_id for r in by_id[:n]}
    cut = spark_eng.search_hits("alpha", replace(OPTS, terminate_after=n))
    assert {r.doc_id for r in cut} <= surviving  # the cut fired on Spark
    env = spark_eng.search_response("alpha", replace(OPTS, terminate_after=n))
    assert "terminated_early" not in env and "timed_out" not in env
