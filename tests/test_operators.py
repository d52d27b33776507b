"""Dedup / similarity / textstats / multimodal operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.operators import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),  # near dup of 0
        (3, "completely different content about spark engines"),
        (4, "el perro y el gato de la casa que ladra y los vecinos"),
        (5, "the quick brown fox jumps over the lazy dog today"),  # near dup
        (6, "short"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_exact_dedup(docs):
    kept = dedup.exact_dedup(docs)
    ids = {r.doc_id for r in kept.collect()}
    assert 0 in ids and 1 not in ids  # representative = min doc_id
    assert ids == {0, 2, 3, 4, 5, 6}
    groups = dedup.exact_dup_groups(docs).collect()
    assert len(groups) == 1 and groups[0].n_dups == 2 and groups[0].keep_id == 0


def test_ngram_jaccard_pairs(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs  # one-word change in a 9-word doc
    assert not any({a, b} == {0, 3} for a, b in pairs)


def test_minhash_lsh_finds_exact_and_near_dups(docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(
            docs, n=3, num_hashes=32, bands=8, threshold=0.5
        ).collect()
    }
    assert (0, 1) in pairs
    # verification step keeps jaccard exact: no false positives below threshold
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert pairs <= exact


def test_simhash_pairs(docs):
    sig = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    assert sig[0] == sig[1]  # identical text -> identical signature
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_pairs(docs, max_hamming=12, bands=16).collect()
    }
    assert pairs[(0, 1)] == 0


def test_cosine_topk_and_pairs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    top = similarity.cosine_topk_query(emb, [1.0, 0.0, 0.0], k=2).collect()
    assert [r.vec_id for r in top] == [0, 1]
    assert top[0].cosine == pytest.approx(1.0)

    pairs = {
        (r.id_a, r.id_b): r.cosine
        for r in similarity.cosine_similar_pairs(emb, threshold=0.9).collect()
    }
    assert (0, 1) in pairs and len(pairs) == 1


def test_lsh_ann_recall(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.standard_normal((200, 16))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(base)],
        ["vec_id", "embedding"],
    )
    q = [float(x) for x in base[0]]
    exact = [r.vec_id for r in similarity.cosine_topk_query(emb, q, k=5).collect()]
    ann = [r.vec_id for r in similarity.lsh_ann_topk(emb, q, k=5, n_planes=16, bands=8).collect()]
    assert exact[0] == 0 and ann[0] == 0  # self is always found (band match guaranteed)
    recall = len(set(exact) & set(ann)) / 5
    assert recall >= 0.4  # LSH is approximate; self + near neighbors survive


def test_text_stats(docs):
    st = {r.doc_id: r for r in textstats.text_stats(docs).collect()}
    assert st[0].n_tokens == 9
    assert st[0].lang_guess == "en"
    assert st[4].lang_guess == "es"
    assert st[0].fingerprint == st[1].fingerprint  # order-insensitive canon
    assert all(0.0 <= r.quality <= 1.0 for r in st.values())
    # the short doc misses the length band both docs share otherwise
    assert st[6].quality != st[0].quality


def test_decontaminate(spark, docs):
    # benchmark = doc 0's text verbatim plus an unrelated prompt
    bench = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            (101, "what is the capital of france"),
        ],
        ["doc_id", "text"],
    )
    train = docs.filter(F.col("doc_id") != 0)  # keep dups/near-dups of 0
    hits = {
        r.doc_id: r.n_contaminated_ngrams
        for r in dedup.decontaminate(train, bench, n=5).collect()
    }
    # doc 1 is an exact copy: all 5 of its distinct 5-grams overlap
    assert hits[1] == 5
    # doc 2 differs in the last word: 5-grams not touching word 9 survive
    assert 1 <= hits[2] < 5
    # doc 5 = doc 0 + one trailing word: every doc-0 5-gram present
    assert hits[5] >= 5
    # docs 3/4/6 share no 5-gram with the benchmark
    assert 3 not in hits and 4 not in hits and 6 not in hits
    # default n=8: doc 2 keeps only the leading 8-gram (the change is word 9)
    hits8 = {
        r.doc_id: r.n_contaminated_ngrams
        for r in dedup.decontaminate(train, bench, n=8).collect()
    }
    assert hits8[1] == 2 and hits8[2] == 1


def test_redact_pii(spark):
    rows = [
        (0, "mail me at alice.smith+x@corp.example.com or call +14155552671"),
        (1, "server at 10.0.42.7 and backup at 192.168.0.1"),
        (2, "nothing sensitive here"),
        (3, "multi a@b.co b@c.org and ip 8.8.8.8 tel +491701234567 end"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in textstats.redact_pii(df).collect()}
    assert out[0].n_email == 1 and out[0].n_phone == 1 and out[0].n_ipv4 == 0
    assert out[0].redacted == "mail me at <EMAIL> or call <PHONE>"
    assert out[1].n_ipv4 == 2
    assert out[1].redacted == "server at <IP> and backup at <IP>"
    assert out[2].n_email == out[2].n_ipv4 == out[2].n_phone == 0
    assert out[2].redacted == "nothing sensitive here"
    assert out[3].n_email == 2 and out[3].n_ipv4 == 1 and out[3].n_phone == 1
    assert out[3].redacted == "multi <EMAIL> <EMAIL> and ip <IP> tel <PHONE> end"


def test_repetition_stats(spark):
    rows = [
        (0, "a a a a"),  # one word repeated: dup=0.75, one bigram "a a" x3
        (1, "one two three four"),  # all distinct, each bigram unique
        (2, "x y x y x y"),  # dup 4/6; bigrams: "x y"x3 "y x"x2 -> 3/5
        (3, ""),  # empty: zeros, no bigrams
        (4, "solo"),  # one word: no bigrams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    st = {r.doc_id: r for r in textstats.repetition_stats(df).collect()}
    assert st[0].n_words == 4 and st[0].dup_word_frac == 0.75
    assert st[0].top_bigram_frac == 1.0
    assert st[1].dup_word_frac == 0.0 and abs(st[1].top_bigram_frac - 1 / 3) < 1e-6
    assert abs(st[2].dup_word_frac - 4 / 6) < 1e-6
    assert abs(st[2].top_bigram_frac - 3 / 5) < 1e-6
    assert st[3].n_words == 0 and st[3].dup_word_frac == 0.0
    assert st[3].top_bigram_frac == 0.0 and st[4].top_bigram_frac == 0.0


def test_sampling_deterministic_and_stratified(spark):
    from gazetteer_search_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "zh") for i in range(3000)], ["doc_id", "lang"]
    ).cache()
    s1 = sampling.hash_sample(df, 0.2)
    s2 = sampling.hash_sample(df, 0.2)
    ids1 = sorted(r.doc_id for r in s1.collect())
    assert ids1 == sorted(r.doc_id for r in s2.collect())  # deterministic
    assert 0.15 < len(ids1) / 3000 < 0.25  # ~rate
    # nested property: a lower rate selects a subset of a higher rate
    ids_small = {r.doc_id for r in sampling.hash_sample(df, 0.05).collect()}
    assert ids_small <= set(ids1)
    # salt decorrelates
    ids_salted = {r.doc_id for r in sampling.hash_sample(df, 0.2, salt=7).collect()}
    assert ids_salted != set(ids1)
    # stratified: zh kept fully, en down-sampled, per-stratum rates hold
    strat = sampling.stratified_sample(df, "lang", {"en": 0.1, "zh": 1.0})
    counts = {r.lang: r.n for r in strat.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["zh"] == 1000
    assert 120 < counts["en"] < 280
    # absent stratum + default_rate=0 -> dropped entirely
    strat0 = sampling.stratified_sample(df, "lang", {"zh": 1.0})
    assert strat0.filter(F.col("lang") == "en").count() == 0
    # md5_60 family (the oracle twin) behaves the same way
    m = sampling.hash_sample(df, 0.2, hash_fn="md5_60")
    assert 0.15 < m.count() / 3000 < 0.25
    assert sorted(r.doc_id for r in m.collect()) == sorted(
        r.doc_id for r in sampling.hash_sample(df, 0.2, hash_fn="md5_60").collect()
    )


def test_multimodal_plumbing(spark):
    media = multimodal.synthetic_media(spark, 30)
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r.features) == multimodal.FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r.features)
    # determinism: same payload bytes -> same features
    again = {r.media_id: r.features for r in multimodal.extract_features(media).collect()}
    assert all(again[r.media_id] == r.features for r in rows)
    plan = multimodal.frame_sample_plan(media, every_n=5)
    assert plan.filter(F.col("frame_no") % 5 != 0).count() == 0


def test_ivf_ann_recall(spark):
    """IVF coarse quantizer + n_probe clusters + exact rerank: high recall vs
    the brute-force baseline at these settings."""
    import numpy as np

    rng = np.random.RandomState(11)
    base = rng.standard_normal((300, 16))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(base)],
        ["vec_id", "embedding"],
    )
    qv = [float(x) for x in base[0]]
    want = [r.vec_id for r in similarity.cosine_topk_query(emb, qv, k=10).collect()]
    got = [
        r.vec_id
        for r in similarity.ivf_ann_topk(
            emb, qv, k=10, n_centroids=8, n_probe=3
        ).collect()
    ]
    overlap = len(set(got) & set(want))
    assert overlap >= 6, (overlap, got, want)
    # deterministic across invocations (seeded sample + kmeans)
    again = [
        r.vec_id
        for r in similarity.ivf_ann_topk(
            emb, qv, k=10, n_centroids=8, n_probe=3
        ).collect()
    ]
    assert got == again


def test_ann_persisted_path_identical(spark):
    """The scale form: signatures/clusters persisted at ingest, probes skip
    retraining — outputs identical to the self-contained form."""
    import numpy as np

    rng = np.random.RandomState(13)
    base = rng.standard_normal((250, 16))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(base)],
        ["vec_id", "embedding"],
    )
    qv = [float(x) for x in base[3]]

    # LSH: persisted signature column drives the band filter
    pre = similarity.add_lsh_signature(emb, n_planes=16, seed=42).cache()
    want = [
        r.vec_id
        for r in similarity.lsh_ann_topk(emb, qv, k=8, n_planes=16, bands=8).collect()
    ]
    got = [
        r.vec_id
        for r in similarity.lsh_ann_topk(
            pre, qv, k=8, n_planes=16, bands=8, sig_col="lsh_sig"
        ).collect()
    ]
    assert got == want

    # IVF: trained centroids + persisted cluster column drive the probe
    cents = similarity.train_ivf_centroids(emb, n_centroids=8)
    clustered = similarity.add_ivf_cluster(emb, cents).cache()
    want = [
        r.vec_id
        for r in similarity.ivf_ann_topk(emb, qv, k=8, n_centroids=8, n_probe=3).collect()
    ]
    got = [
        r.vec_id
        for r in similarity.ivf_ann_topk(
            clustered, qv, k=8, n_probe=3, centroids=cents, cluster_col="ivf_cluster"
        ).collect()
    ]
    assert got == want
    with pytest.raises(ValueError):
        similarity.ivf_ann_topk(clustered, qv, cluster_col="ivf_cluster")


def test_ivf_trained_matches_independent_numpy_recompute(spark):
    """ann_ivf_trained's independent-recomputation check (the VERDICT r3 #6
    treatment for the one pipeline SQL cannot express): the WHOLE trained-IVF
    probe — Lloyd training on the seeded sample, cosine assignment, n_probe
    centroid selection, in-cluster exact rerank — is recomputed here in pure
    numpy over data read WITHOUT Spark, and must reproduce the Spark
    pipeline's top-k (which routes through the pandas-UDF assignment and
    Catalyst cosine) row for row."""
    import numpy as np

    base_dir = "/root/testdata/sf0.001"
    emb = (
        spark.read.parquet(f"{base_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
    )
    cents = similarity.train_ivf_centroids(emb, n_centroids=8)
    clustered = similarity.add_ivf_cluster(emb, cents)
    qv = emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    got = [
        (r.vec_id, round(r.cosine, 9))
        for r in similarity.ivf_ann_topk(
            clustered, qv, k=10, n_probe=3, centroids=cents,
            cluster_col="ivf_cluster",
        ).collect()
    ]

    # ---- independent numpy twin (pyarrow read, no Spark) --------------------
    import pyarrow.dataset as ds_mod

    t = ds_mod.dataset(f"{base_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"]
    )
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    M = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]

    # train: same spec — seeded sample of the 512 smallest ids, Lloyd x5
    sample = M[: min(512, len(ids))]
    rng = np.random.RandomState(42)
    c = sample[rng.choice(sample.shape[0], size=8, replace=False)].copy()
    for _ in range(5):
        sn = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
        cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(sn @ cn.T, axis=1)
        for j in range(8):
            m = assign == j
            if m.any():
                c[j] = sample[m].mean(axis=0)
    cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    cluster = np.argmax(Mn @ cn.T, axis=1)
    q = M[ids == 0][0]
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = set(np.argsort(-(cn @ qn))[:3].tolist())
    cand = np.isin(cluster, list(probes))
    cos = np.round((M[cand] @ q) / (np.linalg.norm(M[cand], axis=1) * np.linalg.norm(q)), 9)
    cids = ids[cand]
    rank = np.lexsort((cids, -cos))[:10]
    want = [(int(cids[i]), float(cos[i])) for i in rank]
    assert got == want


@pytest.mark.skipif(
    not multimodal.has_pillow(), reason="pillow not installed (stub decoder in use)"
)
def test_multimodal_pillow_decode(spark):
    """Real image decode through the same mapInPandas plumbing, active only
    where pillow exists (VERDICT r4 #8). The payloads are real PNG bytes;
    features are the 2x2 mean-pooled RGB thumbnail in [0, 1]."""
    import io

    from PIL import Image

    imgs = []
    for i in range(6):
        im = Image.new("RGB", (8, 8), (i * 40 % 256, 10, 200))
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        imgs.append((i, "image", "image/png", buf.getvalue(), {"src": "t"}))
    media = spark.createDataFrame(imgs, multimodal.MEDIA_SCHEMA)
    feats = multimodal.extract_features(
        media, batch_decode=multimodal.pillow_image_decode
    ).collect()
    assert len(feats) == 6
    for r in feats:
        assert len(r.features) == multimodal.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r.features)
    # deterministic: constant-colour image decodes to its own colour value
    r0 = next(r for r in feats if r.media_id == 0)
    assert r0.features[0] == pytest.approx(0.0, abs=1e-6)  # R channel of (0,10,200)


def test_aggs_histogram_and_stats(spark):
    from gazetteer_search_spark.operators import aggs

    d = spark.createDataFrame(
        [(0, 5, "a"), (1, 12, "b"), (2, 19, "a"), (3, None, "c")],
        "doc_id long, v long, g string",
    )
    hist = {(r.bucket, r.doc_count) for r in aggs.histogram(d, "v", 10).collect()}
    assert hist == {(0.0, 1), (10.0, 2)}  # NULL dropped
    row = aggs.numeric_stats(d, "v", (0.5,)).collect()[0]
    assert (row.n, row.mn, row.mx, row.total) == (3, 5, 19, 36)
    assert row.mean == pytest.approx(12.0)
    assert row.p50 == pytest.approx(12.0)
    assert aggs.cardinality(d, "g").collect()[0].cardinality == 3
    # HLL sketch twin: tolerance, not equality
    approx = aggs.cardinality(d, "g", exact=False).collect()[0].cardinality
    assert 2 <= approx <= 4
    with pytest.raises(ValueError, match="interval"):
        aggs.histogram(d, "v", 0)


def test_aggs_date_histogram(spark):
    from datetime import datetime as DT

    from gazetteer_search_spark.operators import aggs

    d = spark.createDataFrame(
        [
            (DT(2024, 1, 1, 10, 5), 1.0),
            (DT(2024, 1, 1, 10, 40), 2.0),
            (DT(2024, 1, 1, 13, 0), 4.0),   # 11:00 and 12:00 empty
            (DT(2024, 1, 2, 1, 0), 8.0),
            (None, 99.0),                    # NULL ts drops, like ES
        ],
        "ts timestamp, value double",
    )
    # min_doc_count=1 (default): only non-empty buckets
    got = aggs.date_histogram(d, "ts", "hour", value_col="value").collect()
    assert [(r.bucket.hour, r.doc_count, r.value_sum) for r in got] == [
        (10, 2, 3.0), (13, 1, 4.0), (1, 1, 8.0)
    ]
    # fill_empty: every hour between first and last bucket, zeros filled
    filled = aggs.date_histogram(
        d, "ts", "hour", value_col="value", fill_empty=True
    ).collect()
    assert len(filled) == 16  # 10:00 Jan 1 .. 01:00 Jan 2 inclusive
    z = {r.bucket.hour: (r.doc_count, r.value_sum) for r in filled[:4]}
    assert z[11] == (0, 0.0) and z[12] == (0, 0.0) and z[13] == (1, 4.0)
    assert sum(r.doc_count for r in filled) == 4
    # day granularity + count only
    days = aggs.date_histogram(d, "ts", "day").collect()
    assert [(r.bucket.day, r.doc_count) for r in days] == [(1, 3), (2, 1)]
    with pytest.raises(ValueError, match="interval must be one of"):
        aggs.date_histogram(d, "ts", "fortnight")


def test_aggs_filters_range_rare(spark):
    """ES filters / range / rare_terms aggs: overlapping named buckets from
    one conditional-sum pass; half-open range semantics with open ends;
    the long-tail complement of a terms agg."""
    from gazetteer_search_spark.operators import aggs

    d = spark.createDataFrame(
        [(0, 10, "en"), (1, 55, "en"), (2, 95, "fr"), (3, 95, "en"),
         (4, None, "fr")],
        "doc_id long, v long, lang string",
    )
    got = {
        (r.bucket, r.doc_count)
        for r in aggs.filters_agg(
            d,
            {
                "en": F.col("lang") == "en",
                "big_en": (F.col("lang") == "en") & (F.col("v") >= 50),
                "none": F.col("lang") == "zz",  # empty bucket still emitted
            },
        ).collect()
    }
    assert got == {("en", 3), ("big_en", 2), ("none", 0)}  # overlap allowed

    rng = {
        (r.bucket, r.doc_count)
        for r in aggs.range_agg(
            d, "v", [(None, 50.0), (50.0, 100.0), (90.0, None)]
        ).collect()
    }
    # NULL drops; 95 counts in BOTH 50-100 and 90-* (ES overlap semantics)
    assert rng == {("*-50", 1), ("50-100", 3), ("90-*", 2)}

    rare = [(r.value, r.doc_count) for r in aggs.rare_terms(d, "v").collect()]
    assert rare == [(10, 1), (55, 1)]  # 95 has df 2, NULL drops
    assert aggs.rare_terms(d, "v", max_doc_count=2, size=2).count() == 2
    with pytest.raises(ValueError, match="at least one"):
        aggs.filters_agg(d, {})
    with pytest.raises(ValueError, match="empty range"):
        aggs.range_agg(d, "v", [(5.0, 5.0)])
    with pytest.raises(ValueError, match="max_doc_count"):
        aggs.rare_terms(d, "v", max_doc_count=0)


def test_aggs_filters_one_pass_plan(spark):
    """The N-bucket filters agg is ONE aggregation over ONE scan — the plan
    contains a single HashAggregate pair (partial+final) and one relation
    scan, not one job per bucket."""
    from gazetteer_search_spark.operators import aggs

    d = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
    )
    plan = aggs.filters_agg(
        d, {f"b{i}": F.col("v") == i for i in range(5)}
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1  # one scan of the source
    # one partial + one final hash aggregate, regardless of bucket count
    assert plan.count("HashAggregate") == 2


def test_mixture_sample_hits_target_shares(spark):
    from gazetteer_search_spark.operators import sampling

    d = spark.range(0, 9000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 9 < 6, "en")
        .when(F.col("id") % 9 < 8, "fr")
        .otherwise("zh")
        .alias("lang"),
    )  # corpus: 6000 en / 2000 fr / 1000 zh
    out = sampling.mixture_sample(d, "lang", {"en": 0.5, "fr": 0.3, "zh": 0.2})
    got = {r.lang: r.c for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    # bottleneck: zh needs 20% -> T = 1000/0.2 = 5000 -> targets 2500/1500/1000
    assert got["zh"] > 950  # bottleneck stratum kept (nearly) whole
    assert got["en"] == pytest.approx(2500, rel=0.1)
    assert got["fr"] == pytest.approx(1500, rel=0.1)
    # deterministic: same input -> identical membership
    a = {r.doc_id for r in out.collect()}
    b = {
        r.doc_id
        for r in sampling.mixture_sample(
            d, "lang", {"en": 0.5, "fr": 0.3, "zh": 0.2}
        ).collect()
    }
    assert a == b
    with pytest.raises(ValueError, match="share"):
        sampling.mixture_sample(d, "lang", {"en": 0.0})
    with pytest.raises(ValueError, match="stratum"):
        sampling.mixture_sample(d, "lang", {"xx": 1.0})


def test_rrf_fuse_semantics(spark):
    from gazetteer_search_spark.operators import similarity

    a = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(3, 0.9), (4, 0.8), (1, 0.7)], "doc_id long, score double"
    )
    rows = {r.doc_id: r.score for r in similarity.rrf_fuse([a, b], k0=60).collect()}
    # doc 1: rank 1 in a, rank 3 in b; doc 3: rank 3 in a, rank 1 in b
    assert rows[1] == pytest.approx(1 / 61 + 1 / 63, abs=1e-9)
    assert rows[3] == pytest.approx(1 / 63 + 1 / 61, abs=1e-9)
    assert rows[2] == pytest.approx(1 / 62, abs=1e-9)  # missing from b
    assert rows[4] == pytest.approx(1 / 62, abs=1e-9)
    # topk cut honors the fused order, doc_id breaks the 1==3 and 2==4 ties
    top = [r.doc_id for r in similarity.rrf_fuse([a, b], k0=60, topk=3).collect()]
    assert top == [1, 3, 2]
    with pytest.raises(ValueError, match="at least one"):
        similarity.rrf_fuse([])


def test_percolate_clause_gates_and_broadcast(spark):
    from gazetteer_search_spark.operators.percolate import percolate
    from gazetteer_search_spark.plans import assert_no_cartesian, uses_broadcast_join
    from gazetteer_search_spark.search.engine import TermGroup

    def g(gid, terms, required=True):
        return TermGroup(group_id=gid, terms=tuple(terms), required=required)

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (1, "alpha only here"),
            (2, "beta delta"),
            (3, "nothing relevant"),
        ],
        "doc_id long, content string",
    )
    regs = [
        ("both", [g(0, ["alpha"]), g(1, ["beta"])], 2),
        ("either", [g(0, ["alpha", "delta"])], 1),
    ]
    out = percolate(spark, docs, regs)
    got = {(r.doc_id, r.query_id) for r in out.collect()}
    assert got == {(0, "both"), (0, "either"), (1, "either"), (2, "either")}
    uses_broadcast_join(out)
    assert_no_cartesian(out)
    # dis_max semantics: two terms of one group count as ONE clause
    one = percolate(
        spark, docs, [("dm", [g(0, ["alpha", "beta"]), g(1, ["gamma"])], 2)]
    )
    assert {r.doc_id for r in one.collect()} == {0}
    import pytest as _pt
    with _pt.raises(ValueError, match="registry"):
        percolate(spark, docs, [])


def test_mixture_sample_bottleneck_rate_float_edge(spark):
    # shares/counts whose bottleneck rate float-rounds above 1.0
    # (0.3 * (7 / 0.3) / 7 = 1.0000000000000002) must not raise
    from gazetteer_search_spark.operators import sampling

    rows = [(i, "en") for i in range(7)] + [(100 + i, "fr") for i in range(1000)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.mixture_sample(d, "lang", {"en": 0.3, "fr": 0.7})
    got = {r.lang: r.c for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert got["en"] == 7  # bottleneck stratum kept whole


def test_numeric_stats_percentile_labels(spark):
    from gazetteer_search_spark.operators import aggs

    d = spark.range(0, 101).select(F.col("id").alias("v"))
    row = aggs.numeric_stats(d, "v", (0.29, 0.99, 0.999)).collect()[0]
    # 0.29 must not truncate to p28; 0.99 vs 0.999 must not collide
    assert set(row.asDict()) >= {"p29", "p99", "p99_9"}
    assert row.p29 == pytest.approx(29.0)


def test_pack_sequences_duplicate_ids_rows_frame(spark):
    # two rows sharing (group, id): the ROWS frame must give each its own
    # prefix sum — slices tile without overlap and mass is conserved
    from gazetteer_search_spark.operators import packing

    d = spark.createDataFrame(
        [(1, "g", 5), (1, "g", 5), (2, "g", 5)],
        "doc_id long, grp string, n long",
    )
    packed = packing.pack_sequences(d, budget=8, token_col="n", group_col="grp")
    total = packed.agg(F.sum("n_slice")).collect()[0][0]
    assert total == 15
    man = packing.sequence_manifest(packed).orderBy("seq_id").collect()
    assert [r.n_tokens for r in man] == [8, 7]


def test_lsh_cosine_pairs_exact_precision_and_filtered_ann(spark):
    """lsh_cosine_pairs: every emitted pair is a TRUE >=threshold pair with
    its exact cosine (precision 1 — verify is exact); the pair set is a
    subset of the brute-force all-pairs set (recall <= 1, the LSH contract).
    lsh_ann_topk(filter_cond=): pre-filter semantics — the page equals the
    probe over the pre-filtered table and every hit is compliant."""
    import numpy as np

    rng = np.random.RandomState(5)
    base = rng.standard_normal((150, 16))
    # plant exact near-dups so >=0.95 pairs exist
    base[10] = base[3] + 0.01 * rng.standard_normal(16)
    base[11] = base[3] + 0.01 * rng.standard_normal(16)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], int(i % 3)) for i, v in enumerate(base)],
        ["vec_id", "embedding", "label"],
    )

    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in similarity.cosine_similar_pairs(emb, threshold=0.95).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cosine
        for r in similarity.lsh_cosine_pairs(
            emb, threshold=0.95, n_planes=16, bands=8
        ).collect()
    }
    assert lsh, "planted near-dups must surface"
    assert set(lsh) <= set(exact)  # precision: no false pairs
    for k, v in lsh.items():
        assert v == pytest.approx(exact[k])  # verify is exact cosine
    # near-identical planted vectors agree on every band -> always candidates
    assert (3, 10) in lsh and (3, 11) in lsh

    qv = [float(x) for x in base[3]]
    filt = similarity.lsh_ann_topk(
        emb, qv, k=5, n_planes=16, bands=8, filter_cond=F.col("label") == 1
    ).collect()
    pre = similarity.lsh_ann_topk(
        emb.filter(F.col("label") == 1), qv, k=5, n_planes=16, bands=8
    ).collect()
    assert [(r.vec_id, r.cosine) for r in filt] == [
        (r.vec_id, r.cosine) for r in pre
    ]
    labels = {r.vec_id: int(r.vec_id % 3) for r in filt}
    assert all(v == 1 for v in labels.values())


def test_semantic_dup_clusters_closure(spark):
    """Components are the transitive closure of the LSH pair relation:
    comp = min reachable id (checked vs a python union-find over the SAME
    pair set), representatives are component minima, sizes consistent."""
    import numpy as np

    rng = np.random.RandomState(9)
    base = rng.standard_normal((120, 16))
    # chain of near-dups: 0~20, 20~40 (transitive 0..40 in one component)
    base[20] = base[0] + 0.01 * rng.standard_normal(16)
    base[40] = base[20] + 0.01 * rng.standard_normal(16)
    base[55] = base[50] + 0.01 * rng.standard_normal(16)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(base)],
        ["vec_id", "embedding"],
    )
    pairs = similarity.lsh_cosine_pairs(
        emb, threshold=0.95, n_planes=16, bands=8
    ).collect()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r.id_a), find(r.id_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    got = {
        r.node: (r.comp, r.cluster_size, r.is_representative)
        for r in similarity.semantic_dup_clusters(
            emb, threshold=0.95, n_planes=16, bands=8
        ).collect()
    }
    assert {n: c for n, (c, _, _) in got.items()} == want
    comp_of = {n: c for n, (c, _, _) in got.items()}
    assert comp_of[0] == comp_of[20] == comp_of[40] == 0  # transitive chain
    for n, (c, size, rep) in got.items():
        assert rep == (n == c)
        assert size == sum(1 for v in comp_of.values() if v == c)


def test_aggs_multi_terms_and_adjacency(spark):
    """multi_terms: composite-key buckets (joint counts, NULL components
    drop, count-desc/key-asc order, size cut). adjacency_matrix: singleton
    + pairwise-intersection counts, zero cells dropped, one-pass plan."""
    from gazetteer_search_spark.operators import aggs

    d = spark.createDataFrame(
        [
            ("en", "web", 10), ("en", "web", 20), ("en", "book", 30),
            ("fr", "web", 40), ("fr", None, 50), (None, "web", 60),
        ],
        "lang string, source string, n int",
    )
    mt = [tuple(r) for r in aggs.multi_terms(d, ["lang", "source"], size=2).collect()]
    # joint counts: en|web=2; ties en|book / fr|web break key-asc
    assert mt == [("en", "web", 2, "en|web"), ("en", "book", 1, "en|book")]
    with __import__("pytest").raises(ValueError):
        aggs.multi_terms(d, ["lang"])

    am = {
        r["key"]: r["doc_count"]
        for r in aggs.adjacency_matrix(
            d,
            {
                "en": F.col("lang") == "en",
                "web": F.col("source") == "web",
                "big": F.col("n") >= 100,  # empty cell -> dropped
            },
        ).collect()
    }
    assert am == {"en": 3, "web": 4, "en&web": 2}
    assert "big" not in am and "en&big" not in am
    # one-pass contract: single scan, one partial+final HashAggregate pair
    plan = (
        aggs.adjacency_matrix(
            spark.range(0, 50).select((F.col("id") % 5).alias("v")),
            {f"b{i}": F.col("v") == i for i in range(4)},
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Range (0, 50") == 1
    assert plan.count("HashAggregate") == 2
    with __import__("pytest").raises(ValueError):
        aggs.adjacency_matrix(d, {})


def test_quality_classifier_learns_and_matches_numpy_twin(spark):
    """Distributed hashed-BoW logistic regression: (a) the Spark trainer's
    weights match an independent dense-numpy GD over the SAME feature rows
    to float tolerance, (b) the model learns the seed-term signal (positive
    seed-feature weight, high train accuracy), (c) scoring keep-cut is
    consistent with the rounded probability."""
    from gazetteer_search_spark.operators import classifier

    # balanced classes: with zero init + few full-batch steps the bias
    # stays near 0 and the 0.5 cut separates as soon as the seed feature
    # weight moves (margins are small early — +-0.11 after step 1)
    rows = [
        (i, ("spark query join " if i % 2 == 0 else "table scan merge ") * 3)
        for i in range(60)
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    feats = classifier.featurize(d, n_features=256, hash_fn="md5_60")
    labels = d.select(
        "doc_id", classifier.seed_label(F.col("text"), ["spark"]).alias("y")
    )
    w = classifier.train_logreg(feats, labels, lr=2.0, iters=4, l2=1e-4)

    # (a) independent numpy recompute from the same rows
    frows = [(r.doc_id, r.feat, r.val) for r in feats.collect()]
    lrows = [(r.doc_id, r.y) for r in labels.collect()]
    w_np = classifier.train_logreg_numpy(frows, lrows, lr=2.0, iters=4, l2=1e-4)
    assert set(w) == set(w_np)
    for f in w:
        assert abs(w[f] - w_np[f]) < 1e-9, f

    # (b) the hashed 'spark' feature carries the largest positive weight
    import pyspark.sql.functions as SF
    h = d.sparkSession.createDataFrame([("spark",)], ["t"]).select(
        SF.pmod(dedup.hash64_col("md5_60", SF.col("t")), SF.lit(256)).alias("f")
    ).collect()[0].f
    assert w[h] == max(v for f, v in w.items() if f != classifier.BIAS)
    scored = classifier.score(feats, w, threshold=0.5)
    got = {r.doc_id: (r.prob, r.keep) for r in scored.collect()}
    acc = sum(
        1 for i in range(60) if (got[i][0] >= 0.5) == (i % 2 == 0)
    ) / 60.0
    assert acc >= 0.95
    # (c) keep derives from the rounded prob
    assert all((p >= 0.5) == bool(k) for p, k in got.values())


def test_quality_classifier_empty_doc_gets_bias_only_score(spark):
    from gazetteer_search_spark.operators import classifier

    d = spark.createDataFrame(
        [(0, "spark spark"), (1, ""), (2, "scan merge")], ["doc_id", "text"]
    )
    feats = classifier.featurize(d, n_features=64, hash_fn="md5_60")
    # every doc (incl. the empty one) has the bias row -> never dropped
    assert feats.filter(F.col("doc_id") == 1).count() == 1
    labels = d.select(
        "doc_id", classifier.seed_label(F.col("text"), ["spark"]).alias("y")
    )
    w = classifier.train_logreg(feats, labels, lr=1.0, iters=2, l2=0.0)
    out = classifier.score(feats, w).collect()
    assert {r.doc_id for r in out} == {0, 1, 2}
    p1 = [r.prob for r in out if r.doc_id == 1][0]
    assert p1 == round(round(classifier.sigmoid(w[classifier.BIAS]), 9), 4)


def test_curate_tagger_mixer(spark):
    from gazetteer_search_spark.operators import curate as cur

    rows = [
        (0, "alpha beta " * 30),                      # clean-ish, long, varied? no: repeated
        (1, "one two three four five six seven eight nine ten eleven twelve "
            "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty one2"),
        (2, "short doc"),                             # too_short
        (3, ("the and for with from this that " * 5) + "mail a@b.co"),  # pii + repetitive
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in cur.curate(df).collect()}
    # doc 0: 60 tokens of 2 distinct -> dup frac ~0.967 -> too_repetitive
    assert out[0].keep == 0 and out[0].reasons == "too_repetitive"
    # doc 1: 21 distinct tokens, no repeats, stopword-free but long enough
    assert out[1].dup_word_frac == 0.0
    assert out[1].keep in (0, 1)  # depends only on quality band
    # doc 2: under 20 tokens
    assert out[2].keep == 0 and "too_short" in out[2].reasons
    # doc 3: fired rules are SORTED and comma-joined; pii counted
    assert out[3].n_email == 1
    assert out[3].keep == 0
    assert out[3].reasons == ",".join(sorted(out[3].reasons.split(",")))
    assert "has_pii" in out[3].reasons and "too_repetitive" in out[3].reasons
    # audit trail: every dropped doc carries at least one reason
    assert all((r.keep == 1) == (r.reasons == "") for r in out.values())

    # re-mix over persisted tags with new thresholds: no text needed
    tags = cur.tag(df)
    loose = (cur.DropRule("too_short", "n_tokens < 1"),)
    out2 = {r.doc_id: r.keep for r in cur.mix(tags, loose).collect()}
    assert all(v == 1 for v in out2.values())

    with pytest.raises(ValueError, match="empty"):
        cur.mix(tags, ())
    with pytest.raises(ValueError, match="duplicate"):
        cur.mix(tags, (cur.DropRule("a", "1=1"), cur.DropRule("a", "1=0")))


def test_curate_is_one_scan_no_shuffle(spark):
    from gazetteer_search_spark.operators import curate as cur

    df = spark.range(0, 200).select(
        "id", F.concat(F.lit("word sample text number "), F.col("id").cast("string")).alias("text")
    ).withColumnRenamed("id", "doc_id")
    plan = (
        cur.curate(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # tag + mix collapse into one codegen stage over one scan: no Exchange,
    # no aggregate — the cheapest possible 100-TB plan for a curation pass
    assert "Exchange" not in plan
    assert "HashAggregate" not in plan


def test_vectorize_docs_tfidf(spark):
    import math

    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta gamma"),      # identical text -> identical vector
        (2, "delta delta epsilon"),
        (3, ""),                      # tokenless -> zero vector, no NaN
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.vector for r in similarity.vectorize_docs(df, dim=32).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert all(len(v) == 32 for v in out.values())
    assert out[0] == out[1]
    # unit L2 norm for non-empty docs; exact zero vector for the empty one
    for d in (0, 2):
        assert math.sqrt(sum(x * x for x in out[d])) == pytest.approx(1.0)
    assert out[3] == [0.0] * 32
    assert not any(math.isnan(x) for v in out.values() for x in v)
    # composition with the ANN family: identical docs are each other's
    # nearest neighbours at cosine 1
    # tokenless docs carry the zero vector: drop them before cosine (ANSI
    # division guard — same contract as any embedding table with null rows)
    emb = (
        similarity.vectorize_docs(df, dim=32)
        .filter(F.aggregate("vector", F.lit(0.0), lambda a, x: a + x * x) > 0)
        .select(F.col("doc_id").alias("vec_id"), F.col("vector").alias("embedding"))
    )
    qv = [float(x) for x in out[0]]
    top = similarity.cosine_topk_query(emb, qv, k=2).collect()
    assert {r.vec_id for r in top} == {0, 1}
    assert all(r.cosine == pytest.approx(1.0) for r in top)
    # tf weighting: doc 2's repeated 'delta' dominates its vector
    i_delta = max(range(32), key=lambda i: abs(out[2][i]))
    assert abs(out[2][i_delta]) > 0.7


def test_percolate_doc_twin_matches_spark_operator(spark):
    """Serving twin equality: percolate_doc (python kernel, Spark-free)
    gives exactly the Spark operator's matches for every doc — same
    tokenizer stream, same msm/required/dis_max gate."""
    from gazetteer_search_spark.operators.percolate import (
        parse_registry, percolate, percolate_doc,
    )

    raw = [
        {"id": "both", "msm": 2, "groups": [
            {"group_id": 0, "terms": ["alpha"]},
            {"group_id": 1, "terms": ["beta"]},
        ]},
        {"id": "either", "groups": [
            {"group_id": 0, "terms": ["alpha", "delta"]},
        ]},
        {"id": "camel", "groups": [
            # code-aware split: camelCase sub-tokens must match
            {"group_id": 0, "terms": ["postings"]},
        ]},
        {"id": "opt", "msm": 1, "groups": [
            {"group_id": 0, "terms": ["alpha"]},
            {"group_id": 1, "terms": ["zzz"], "required": False},
        ]},
    ]
    regs = parse_registry(raw)
    texts = [
        "alpha beta gamma",
        "alpha only here",
        "beta delta",
        "nothing relevant",
        "mergePostings blockMax kernel",
        "",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, content string"
    )
    sp = {}
    for r in percolate(spark, docs, regs).collect():
        sp.setdefault(int(r.doc_id), []).append(r.query_id)
    for i, t in enumerate(texts):
        assert percolate_doc(t, regs) == sorted(sp.get(i, [])), (i, t)


def test_http_percolate_route(spark, tmp_path):
    """POST /percolate: the alerting primitive at the serving surface."""
    import json as _json
    import threading
    import urllib.request

    from pyspark.sql import functions as F

    from gazetteer_search_spark.index import builder
    from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions
    from gazetteer_search_spark.server import make_server

    corpus = spark.range(0, 20).select(
        F.col("id").alias("doc_id"), F.lit("org/r").alias("repo"),
        F.format_string("src/%d.py", "id").alias("path"),
        F.lit("c").alias("commit"), F.lit("python").alias("lang"),
        F.lit("alpha shared words").alias("content"),
    )
    root = str(tmp_path / "idx")
    builder.build_index(spark, corpus, root, n_buckets=2)
    eng = SearchEngine(spark, builder.load_index(spark, root), serving=True)
    srv = make_server(eng, SearchOptions(k=5, prefix=False, fuzzy=False), port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        def post(body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/percolate",
                data=_json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status, _json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, _json.loads(e.read())

        regs = [
            {"id": "hit", "groups": [{"group_id": 0, "terms": ["mergepostings"]}]},
            {"id": "miss", "groups": [{"group_id": 0, "terms": ["zzz"]}]},
        ]
        code, env = post({"content": "mergePostings blockMax", "queries": regs})
        assert code == 200 and env["matches"] == ["hit"] and env["queries"] == 2
        assert post({"queries": regs})[0] == 400       # missing content
        assert post({"content": "x"})[0] == 400        # missing registry
    finally:
        srv.shutdown()


def test_percolate_msm0_join_semantics_parity(spark):
    """msm=0 all-optional queries: the batch operator's term JOIN means a
    doc must share >= 1 term to produce a (doc, query) pair — the serving
    twin must agree, not match every document (regression)."""
    from gazetteer_search_spark.operators.percolate import (
        parse_registry, percolate, percolate_doc,
    )

    raw = [{"id": "opt0", "msm": 0, "groups": [
        {"group_id": 0, "terms": ["alpha"], "required": False},
    ]}]
    regs = parse_registry(raw)
    texts = ["alpha here", "nothing relevant"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, content string"
    )
    sp = {}
    for r in percolate(spark, docs, regs).collect():
        sp.setdefault(int(r.doc_id), []).append(r.query_id)
    for i, t in enumerate(texts):
        assert percolate_doc(t, regs) == sorted(sp.get(i, [])), (i, t)
    assert percolate_doc("nothing relevant", regs) == []


# ---------------------------------------------------------------------------
# incremental novelty filter (Bloom-prefiltered dedup against a corpus)
# ---------------------------------------------------------------------------

def test_novelty_filter_bit_identical_to_antijoin(spark, tmp_path):
    """novel_rows == the plain sha2 anti-join on every bloom size — a tiny
    bitmap FORCES false positives, which must cost verification only, never
    correctness; a roomy bitmap must certify most novel rows join-free."""
    corpus = spark.range(0, 400).select(
        "id", F.format_string("corpus document body %d", "id").alias("text")
    )
    # 30 of the 100 batch rows repeat corpus texts (ids 0..29), 70 are new
    batch = spark.range(0, 100).select(
        (F.col("id") + 10_000).alias("id"),
        F.when(
            F.col("id") < 30,
            F.format_string("corpus document body %d", "id"),
        ).otherwise(
            F.format_string("brand new document %d", "id")
        ).alias("text"),
    )
    expect = {
        r.id
        for r in batch.join(
            corpus.select("text"), on="text", how="left_anti"
        ).collect()
    }
    assert len(expect) == 70

    for n_bits in (256, 1 << 20):
        bloom = dedup.build_novelty_bloom(corpus, n_bits=n_bits)
        got = dedup.novel_rows(spark, batch, corpus, bloom=bloom)
        assert {r.id for r in got.collect()} == expect, f"n_bits={n_bits}"
        # schema passthrough: the batch's own columns, no helper residue
        assert got.columns == batch.columns

        flags = dedup.novelty_candidates(spark, batch, bloom).collect()
        maybe = {r.id for r in flags if r._maybe_dup}
        # Bloom filters have NO false negatives: every true dup is flagged
        assert set(range(10_000, 10_030)) <= maybe
        if n_bits == 256:
            # 400 keys in 256 bits: saturated -> false positives exist
            assert len(maybe) > 30
        else:
            # ~0 FP at 1<<20 bits for 400 keys: novel rows skip verification
            assert len(maybe) <= 35

    # persisted artifact roundtrip
    p = str(tmp_path / "corpus.bloom")
    bloom = dedup.build_novelty_bloom(corpus, n_bits=1 << 16)
    bloom.save(p)
    loaded = dedup.NoveltyBloom.load(p)
    assert (loaded.n_bits, loaded.n_hashes) == (bloom.n_bits, bloom.n_hashes)
    assert loaded.bits == bloom.bits
    got = dedup.novel_rows(spark, batch, corpus, bloom=loaded)
    assert {r.id for r in got.collect()} == expect
    with pytest.raises(ValueError, match="novelty-bloom"):
        (tmp_path / "junk").write_bytes(b"nope")
        dedup.NoveltyBloom.load(str(tmp_path / "junk"))


def test_novelty_filter_corpus_never_shuffled(spark):
    """100-TB shape: the verification joins are BROADCAST on the (small)
    candidate/matched key sets — no sort-merge join, no corpus shuffle —
    and empty corpora / empty batches behave."""
    corpus = spark.range(0, 50).select(
        "id", F.format_string("c %d", "id").alias("text")
    )
    batch = spark.range(0, 20).select(
        "id", F.format_string("c %d", "id").alias("text")
    )
    plan = dedup.novel_rows(spark, batch, corpus)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "SortMergeJoin" not in plan

    # all-dup batch -> empty; empty corpus -> everything is novel
    assert dedup.novel_rows(spark, batch, corpus).count() == 0
    empty = corpus.filter("id < 0")
    assert dedup.novel_rows(spark, batch, empty).count() == 20


def test_minhash_lsh_against_matches_selfjoin(spark):
    """Incremental near-dup (batch vs corpus) agrees with the self-join
    operator restricted to cross-split pairs — under fresh AND persisted
    corpus signatures (the reuse contract: same hash family => same band
    buckets)."""
    rows = []
    for i in range(40):
        base = f"shared tokens alpha beta gamma delta epsilon zeta {i % 8}"
        rows.append((i, base))
    # 8 text groups of 5 members each -> plenty of near/exact dup pairs
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    corpus = df.filter("doc_id % 2 = 0")
    batch = df.filter("doc_id % 2 = 1")
    kw = dict(n=1, num_hashes=16, bands=4, threshold=0.8)

    self_pairs = {
        (r.id_a, r.id_b): round(r.jaccard, 6)
        for r in dedup.minhash_lsh_pairs(df, **kw).collect()
    }
    expect = {}
    for (a, b), j in self_pairs.items():
        if a % 2 == 1 and b % 2 == 0:
            expect[(a, b)] = j
        elif b % 2 == 1 and a % 2 == 0:
            expect[(b, a)] = j
    assert expect  # the construction must actually produce cross pairs

    got = {
        (r.id_batch, r.id_corpus): round(r.jaccard, 6)
        for r in dedup.minhash_lsh_against(batch, corpus, **kw).collect()
    }
    assert got == expect

    # persisted-signature reuse: precomputed corpus sigs, identical output
    sigs = dedup.minhash_signatures(corpus, n=1, num_hashes=16)
    got2 = {
        (r.id_batch, r.id_corpus): round(r.jaccard, 6)
        for r in dedup.minhash_lsh_against(
            batch, corpus, corpus_sigs=sigs, **kw
        ).collect()
    }
    assert got2 == expect

    # the batch band rows ride a broadcast join (the corpus never shuffles
    # for candidate generation)
    plan = (
        dedup.minhash_lsh_against(batch, corpus, **kw)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan

    # disjoint vocabularies -> zero pairs
    other = spark.createDataFrame(
        [(100 + i, f"totally different words {i}") for i in range(5)],
        ["doc_id", "text"],
    )
    assert dedup.minhash_lsh_against(other, corpus, **kw).count() == 0


def test_diversified_sample(spark):
    """ES sampler / diversified_sampler analog: per-value cap before the
    global rank cut, NULL diversity values drop, plain-sampler form with
    diversity_col=None, deterministic (order desc, id asc) everywhere."""
    from gazetteer_search_spark.operators import sampling

    rows = [
        # (doc_id, lang, n): 'en' has 4 rows so the cap must bite
        (0, "en", 100), (1, "en", 90), (2, "en", 80), (3, "en", 70),
        (4, "fr", 95), (5, "fr", 60),
        (6, None, 99),  # NULL diversity -> dropped
        (7, "zh", 50),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n"])

    got = [
        (r.doc_id, r.lang, r.n)
        for r in sampling.diversified_sample(
            df, "n", "lang", max_per_value=2, size=5
        ).collect()
    ]
    # en keeps its best 2 (100, 90); fr both; zh its one; NULL row gone;
    # global order (n desc, doc_id asc), size cut at 5
    assert got == [
        (0, "en", 100), (4, "fr", 95), (1, "en", 90), (5, "fr", 60),
        (7, "zh", 50),
    ]

    # plain sampler: no diversity cap, NULL rows kept, pure rank cut
    plain = [
        r.doc_id
        for r in sampling.diversified_sample(
            df, "n", None, size=3
        ).collect()
    ]
    assert plain == [0, 6, 4]

    # ties in the order column break doc_id-ascending (reproducible sample)
    tied = spark.createDataFrame(
        [(3, "en", 10), (1, "en", 10), (2, "en", 10)],
        ["doc_id", "lang", "n"],
    )
    assert [
        r.doc_id
        for r in sampling.diversified_sample(
            tied, "n", "lang", max_per_value=2, size=10
        ).collect()
    ] == [1, 2]

    with pytest.raises(ValueError):
        sampling.diversified_sample(df, "n", "lang", max_per_value=0)
    with pytest.raises(ValueError):
        sampling.diversified_sample(df, "n", "lang", size=0)


def test_select_to_budget(spark):
    """Token-budget corpus selection == the brute-force one-window prefix
    on every input tried: randomized corpora, tied order values straddling
    bucket cuts, degenerate n_buckets, budget edges, NULL drops."""
    import random

    from gazetteer_search_spark.operators import sampling

    def brute(rows, budget):
        kept, cum = [], 0
        for did, _, tok in sorted(rows, key=lambda r: (-r[1], r[0])):
            cum += tok
            if cum > budget:
                break
            kept.append(did)
        return set(kept)

    rng = random.Random(7)
    for trial in range(4):
        rows = [
            (i, rng.choice([1.0, 2.0, 3.0, 5.0]), rng.randint(0, 40))
            for i in range(120)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "q", "tok"])
        total = sum(t for _, _, t in rows)
        for budget in (0, 37, total // 3, total - 1, total, total + 10):
            for nb in (1, 4, 64):
                got = {
                    r.doc_id
                    for r in sampling.select_to_budget(
                        df, budget, "q", "tok", n_buckets=nb
                    ).collect()
                }
                assert got == brute(rows, budget), (trial, budget, nb)

    # NULL order or token values drop before selection
    df2 = spark.createDataFrame(
        [(0, 2.0, 5), (1, None, 5), (2, 1.0, None), (3, 1.0, 5)],
        "doc_id long, q double, tok long",
    )
    assert {
        r.doc_id
        for r in sampling.select_to_budget(df2, 10, "q", "tok").collect()
    } == {0, 3}

    with pytest.raises(ValueError):
        sampling.select_to_budget(df2, -1, "q", "tok")


def test_weighted_sample(spark):
    """DSIR-style importance resampling: per-row keep rates — rate 1.0
    always keeps, 0.0 never keeps, NULL drops, out-of-range clamps, and
    membership at a mid rate equals the hash predicate computed directly."""
    from gazetteer_search_spark.operators import sampling
    from gazetteer_search_spark.operators.dedup import hash64_col

    rows = [
        (0, 1.0), (1, 0.0), (2, None), (3, 2.5), (4, -1.0),
        *[(i, 0.5) for i in range(5, 105)],
    ]
    df = spark.createDataFrame(rows, "doc_id long, rate double")
    got = {r.doc_id for r in sampling.weighted_sample(df, "rate").collect()}
    assert 0 in got and 3 in got        # rate >= 1 (clamped) always keeps
    assert 1 not in got and 4 not in got  # rate <= 0 never keeps
    assert 2 not in got                  # NULL rate drops

    buckets = {
        r.doc_id: r.b
        for r in df.select(
            "doc_id",
            F.pmod(
                hash64_col(
                    "xxhash64", F.col("doc_id").cast("string"), F.lit("0")
                ),
                F.lit(sampling.MODULUS),
            ).alias("b"),
        ).collect()
    }
    expect_mid = {
        i for i in range(5, 105) if buckets[i] < 0.5 * sampling.MODULUS
    }
    assert got & set(range(5, 105)) == expect_mid
    assert 0 < len(expect_mid) < 100  # the mid rate actually splits


def test_cosine_pairs_guard_raises_above_bound(spark):
    # the all-pairs form must refuse corpus-scale inputs and point at the
    # LSH twin (VERDICT r5 #9); max_rows=None bypasses deliberately
    import pytest as _pytest

    from gazetteer_search_spark.operators import similarity

    emb = spark.range(5).selectExpr(
        "id as vec_id", "array(double(id), 1.0d) as embedding"
    )
    with _pytest.raises(ValueError, match="lsh_cosine_pairs"):
        similarity.cosine_similar_pairs(emb, threshold=0.5, max_rows=3)
    assert (
        similarity.cosine_similar_pairs(
            emb, threshold=-1.0, max_rows=None
        ).count()
        == 10
    )
