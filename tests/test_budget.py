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
