"""Persisted vector sidecar + serving-side exact KNN + hybrid RRF routes."""

from __future__ import annotations

import json
import threading
import urllib.request

import numpy as np
import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.index import builder, vectors
from gazetteer_search_spark.operators import similarity
from gazetteer_search_spark.sources import synthetic_corpus


@pytest.fixture(scope="module")
def vidx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("knn_idx"))
    corpus = synthetic_corpus(spark, 300).drop("doc_id").withColumn(
        "doc_id",
        F.xxhash64("repo", "path", "commit").bitwiseAND(F.lit((1 << 62) - 1)),
    )
    builder.build_index(
        spark, corpus, root, n_buckets=2, postings_per_group=1 << 16,
        store_content=True,
    )
    stats = vectors.build_vectors(spark, root, dim=32)
    assert stats["dim"] == 32 and stats["n_docs"] == 300
    return root, corpus


def test_knn_handle_matches_spark_pipeline(spark, vidx):
    root, corpus = vidx
    h = vectors.KnnIndex(root)
    assert h.matrix.shape == (300, 32)
    row0 = corpus.orderBy("doc_id").limit(1).collect()[0]
    # query == a document's text -> the query embeds onto that doc's vector
    qv = h.embed(row0.content)
    stored = h.matrix[np.where(h.doc_ids == row0.doc_id)[0][0]]
    assert np.allclose(qv, stored, atol=1e-9)
    top = h.knn(row0.content, k=5)
    assert top[0][0] == row0.doc_id and top[0][1] == pytest.approx(1.0)
    # rank identity vs the Spark-side pipeline (vectorize + cosine_topk)
    vec = similarity.vectorize_docs(
        corpus.select("doc_id", F.col("content").alias("text")),
        dim=32, hash_fn="md5_60",
    ).select(F.col("doc_id").alias("vec_id"), F.col("vector").alias("embedding"))
    sp = similarity.cosine_topk_query(vec, [float(x) for x in qv], k=5).collect()
    assert [r.vec_id for r in sp] == [d for d, _ in top]
    for r, (_, c) in zip(sp, top):
        assert r.cosine == pytest.approx(c, abs=1e-6)
    # brute-force numpy twin: exact same ranking
    sims = h.matrix @ qv
    brute = sorted(
        zip((int(d) for d in h.doc_ids), (float(s) for s in sims)),
        key=lambda r: (-round(r[1], 9), r[0]),
    )[:5]
    assert brute == top


def test_rrf_fuse_rows_matches_spark_rrf(spark):
    a = [(1, 9.0), (2, 8.0), (3, 7.0)]
    b = [(3, 0.9), (4, 0.8), (1, 0.7)]
    py = vectors.rrf_fuse_rows([a, b], k0=60, topk=4)
    da = spark.createDataFrame(a, "doc_id long, score double")
    db = spark.createDataFrame(b, "doc_id long, score double")
    sp = similarity.rrf_fuse([da, db], k0=60, topk=4).collect()
    assert [(r.doc_id, round(r.score, 9)) for r in sp] == [
        (d, round(s, 9)) for d, s in py
    ]


def test_build_vectors_requires_content_or_source(spark, tmp_path):
    root = str(tmp_path / "plain")
    corpus = synthetic_corpus(spark, 50).drop("doc_id").withColumn(
        "doc_id",
        F.xxhash64("repo", "path", "commit").bitwiseAND(F.lit((1 << 62) - 1)),
    )
    builder.build_index(spark, corpus, root, n_buckets=2, postings_per_group=1 << 16)
    with pytest.raises(ValueError, match="stored content"):
        vectors.build_vectors(spark, root, dim=16)
    # explicit source works without stored content
    st = vectors.build_vectors(spark, root, dim=16, source=corpus)
    assert st["n_docs"] == 50
    assert vectors.has_vectors(root)


def test_http_knn_and_hybrid_routes(spark, vidx):
    from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions
    from gazetteer_search_spark.server import make_server

    root, corpus = vidx
    eng = SearchEngine(spark, builder.load_index(spark, root), serving=True)
    srv = make_server(
        eng, SearchOptions(k=5, prefix=False, fuzzy=False), port=0,
        index_path=root,
    )
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        row0 = corpus.orderBy("doc_id").limit(1).collect()[0]
        q = urllib.request.quote(" ".join(row0.content.split()[:6]))
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/knn?q={q}&size=5"
        ) as r:
            env = json.loads(r.read())
        assert len(env["hits"]) == 5
        assert all(
            set(h) == {"doc_id", "cosine"} for h in env["hits"]
        )
        # route == handle-level call
        h = vectors.KnnIndex(root)
        expect = h.knn(" ".join(row0.content.split()[:6]), k=5)
        assert [x["doc_id"] for x in env["hits"]] == [d for d, _ in expect]

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/hybrid?q={q}&size=5"
        ) as r:
            env = json.loads(r.read())
        assert env["lexical_hits"] > 0 and env["knn_hits"] == 5
        assert len(env["hits"]) == 5
        # fused page == the pinned python RRF over the two pages
        bm = eng.search_hits(
            " ".join(row0.content.split()[:6]),
            SearchOptions(k=5, prefix=False, fuzzy=False),
        )
        fused = vectors.rrf_fuse_rows(
            [[(int(x.doc_id), float(x.score)) for x in bm], expect],
            k0=60, topk=5,
        )
        assert [x["doc_id"] for x in env["hits"]] == [d for d, _ in fused]
    finally:
        srv.shutdown()


def test_knn_idf_default_for_unseen_features(spark, vidx):
    """Query tokens whose hashed feature never occurred in the corpus get
    the build formula's df=0 idf — ln((N+1)/1)+1 — not 1.0, so reported
    cosines equal the true TF-IDF cosine the Spark pipeline would compute
    for the same query (regression: unit default deflated the query norm
    and inflated every cosine for out-of-corpus tokens)."""
    import math

    root, _corpus = vidx
    h = vectors.KnnIndex(root)
    expected_unseen = math.log(h.n_docs + 1.0) + 1.0
    seen = {int(f) for f in h.stats["df"]}
    for feat in range(h.dim):
        if feat not in seen:
            assert h._idf[feat] == pytest.approx(expected_unseen)
    # a seen feature keeps its smoothed idf
    f0 = next(iter(seen))
    dfc = int(h.stats["df"][str(f0)])
    assert h._idf[f0] == pytest.approx(
        math.log((h.n_docs + 1.0) / (dfc + 1.0)) + 1.0
    )


def test_http_knn_hybrid_param_validation(spark, vidx):
    """Bad numeric params return HTTP 400 (not a reset connection), and
    k0 is clamped positive (regression: size=abc raised ValueError with no
    response; k0=-1 hit ZeroDivisionError inside rrf_fuse_rows)."""
    import urllib.error

    from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions
    from gazetteer_search_spark.server import make_server

    root, corpus = vidx
    eng = SearchEngine(spark, builder.load_index(spark, root), serving=True)
    srv = make_server(
        eng, SearchOptions(k=5, prefix=False, fuzzy=False), port=0,
        index_path=root,
    )
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        def code(path):
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}"
                ) as r:
                    return r.status
            except urllib.error.HTTPError as e:
                return e.code

        assert code("/knn?q=alpha&size=abc") == 400
        assert code("/hybrid?q=alpha&k0=notanint") == 400
        # k0 <= 0 clamps to 1 instead of dividing by zero at rank 1
        assert code("/hybrid?q=alpha&size=3&k0=-1") == 200
        assert code("/knn?q=alpha&size=3") == 200
    finally:
        srv.shutdown()


def test_http_knn_filtered(spark, vidx):
    """ES filtered kNN (lang= pre-filter): the page is taken AMONG the
    allowed docs — every hit carries the filter lang, the page still fills
    to k, and the ranking equals a brute-force cosine over exactly the
    allowed subset. An unknown filter column 400s."""
    import urllib.error

    from gazetteer_search_spark.index import builder as _b
    from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions
    from gazetteer_search_spark.server import make_server

    root, corpus = vidx
    eng = SearchEngine(spark, _b.load_index(spark, root), serving=True)
    srv = make_server(
        eng, SearchOptions(k=5, prefix=False, fuzzy=False), port=0,
        index_path=root,
    )
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        langs = {r.lang: r.doc_id for r in corpus.collect()}
        lang = sorted(langs)[0]
        row0 = corpus.orderBy("doc_id").limit(1).collect()[0]
        text = " ".join(row0.content.split()[:6])
        q = urllib.request.quote(text)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/knn?q={q}&size=5&lang={lang}"
        ) as r:
            env = json.loads(r.read())
        assert env["filter"] == {"lang": lang}
        assert len(env["hits"]) == 5  # pre-filter fills the page

        allowed = {
            r.doc_id for r in corpus.filter(F.col("lang") == lang).collect()
        }
        assert set(x["doc_id"] for x in env["hits"]) <= allowed

        # ranking == brute-force cosine over exactly the allowed subset
        h = vectors.KnnIndex(root)
        qv = h.embed(text)
        sims = h.matrix @ qv
        brute = sorted(
            (
                (int(d), float(s))
                for d, s in zip(h.doc_ids, sims)
                if int(d) in allowed
            ),
            key=lambda r: (-round(r[1], 9), r[0]),
        )[:5]
        assert [x["doc_id"] for x in env["hits"]] == [d for d, _ in brute]

        # handle-level mask form agrees with the route
        mask = h.mask_for_ids(np.array(sorted(allowed), dtype=np.int64))
        assert h.knn(text, k=5, mask=mask) == brute

        # a filter matching nothing returns an empty page, never an error
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/knn?q={q}&size=5&repo=no/such/repo"
        ) as r:
            assert json.loads(r.read())["hits"] == []
    finally:
        srv.shutdown()


def test_http_hybrid_filtered(spark, vidx):
    """/hybrid with lang=: BOTH legs scope to the filter — every fused hit
    is from the allowed lang, and the page equals the pinned RRF over the
    lang-scoped BM25 page and the mask-filtered kNN page."""
    from dataclasses import replace

    from gazetteer_search_spark.index import builder as _b
    from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions
    from gazetteer_search_spark.server import make_server

    root, corpus = vidx
    eng = SearchEngine(spark, _b.load_index(spark, root), serving=True)
    opts = SearchOptions(k=5, prefix=False, fuzzy=False)
    srv = make_server(eng, opts, port=0, index_path=root)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        lang = sorted({r.lang for r in corpus.select("lang").collect()})[0]
        row0 = corpus.orderBy("doc_id").limit(1).collect()[0]
        text = " ".join(row0.content.split()[:6])
        q = urllib.request.quote(text)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/hybrid?q={q}&size=5&lang={lang}"
        ) as r:
            env = json.loads(r.read())
        assert env["filter"] == {"lang": lang}
        allowed = {
            r.doc_id for r in corpus.filter(F.col("lang") == lang).collect()
        }
        assert set(x["doc_id"] for x in env["hits"]) <= allowed

        h = vectors.KnnIndex(root)
        mask = h.mask_for_ids(np.array(sorted(allowed), dtype=np.int64))
        bm = eng.search_hits(text, replace(opts, lang=lang))
        fused = vectors.rrf_fuse_rows(
            [
                [(int(x.doc_id), float(x.score)) for x in bm],
                h.knn(text, k=5, mask=mask),
            ],
            k0=60, topk=5,
        )
        assert [x["doc_id"] for x in env["hits"]] == [d for d, _ in fused]
    finally:
        srv.shutdown()
