#!/usr/bin/env python
"""Extra benchmarks: per-operator phase isolation with noop sinks.

`bench.py` is FROZEN for the driver's measurement; this file holds the
stage-level bisection used while optimizing (guide §1.4 — noop sink so the
computation is timed, not the sink; §1.5 — labelled jobs). Usage:

    SPARK_GRAFT_SF_DIR=/tmp/sf1.0 python bench_extra.py hard_negatives
    python bench_extra.py classifier dedup vector

Each section prints one JSON line per phase. Not part of the driver
contract; numbers are cited in OPTIMIZATION_r06.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn):
    spark.sparkContext.setJobDescription(label)
    t = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"phase": label, "sec": round(dt, 3), "out": out}))
    return dt


def get_session():
    from gazetteer_search_spark.session import get_spark

    return get_spark("bench_extra", cpus=CPUS)


def sec_hard_negatives(spark):
    from pyspark.sql import functions as F

    from gazetteer_search_spark.search import bm25
    from gazetteer_search_spark.operators import negatives, ensure_min_partitions

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    df = ensure_min_partitions(docs)
    base = df.select(
        F.col("doc_id"),
        F.col("text").alias("content"),
        F.sha2(F.col("text"), 256).alias("sha"),
        bm25.tokens_col(F.col("text"), "pandas").alias("tokens"),
    ).withColumn("doc_len", F.size("tokens")).persist()
    timed(spark, "hn/base_tokenize_persist", lambda: base.count())
    tf = bm25.term_freqs(base.select("doc_id", "doc_len", "tokens")).persist()
    timed(spark, "hn/tf_agg_persist", lambda: tf.count())
    tstats = bm25.term_stats(tf)
    cs = None

    def _cs():
        nonlocal cs
        cs = base.agg(F.count("*").alias("n_docs"), F.avg("doc_len").alias("a")).collect()[0]
        return [cs.n_docs]

    timed(spark, "hn/corpus_stats", _cs)
    scored = bm25.scored_postings(tf, tstats, int(cs.n_docs), float(cs.a)).select(
        "term", "doc_id", "score"
    )
    timed(spark, "hn/scored_noop", lambda: noop(scored))
    base.unpersist(); tf.unpersist()
    timed(
        spark,
        "hn/full",
        lambda: negatives.mine_hard_negatives(docs, [0, 1, 2, 3, 4], k=5).count(),
    )
    timed(
        spark,
        "hn/full2",
        lambda: negatives.mine_hard_negatives(docs, [0, 1, 2, 3, 4], k=5).count(),
    )


def sec_classifier(spark):
    from pyspark.sql import functions as F

    from gazetteer_search_spark.operators import classifier

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    feats = classifier.featurize(docs, n_features=1024)
    timed(spark, "cl/featurize_noop", lambda: noop(feats))
    labels = docs.select(
        "doc_id", classifier.seed_label(F.col("text"), ["spark", "query"]).alias("y")
    )
    timed(spark, "cl/labels_noop", lambda: noop(labels))
    w = {}

    def _train():
        nonlocal w
        w = classifier.train_logreg(feats, labels, lr=2.0, iters=4)
        return len(w)

    timed(spark, "cl/train4", _train)
    timed(spark, "cl/score", lambda: classifier.score(feats, w, threshold=0.5).count())
    spark.catalog.clearCache()
    t = time.perf_counter()
    f2 = classifier.featurize(docs, n_features=1024)
    l2 = docs.select(
        "doc_id", classifier.seed_label(F.col("text"), ["spark", "query"]).alias("y")
    )
    w2 = classifier.train_logreg(f2, l2, lr=2.0, iters=4)
    classifier.score(f2, w2, threshold=0.5).count()
    print(json.dumps({"phase": "cl/end_to_end", "sec": round(time.perf_counter() - t, 3)}))


def sec_dedup(spark):
    from pyspark.sql import functions as F

    from gazetteer_search_spark.operators import dedup, graph

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t = time.perf_counter()
    n = dedup.minhash_lsh_pairs(docs, n=1, num_hashes=32, bands=4, threshold=0.8).count()
    print(json.dumps({"phase": "dd/full_count", "sec": round(time.perf_counter() - t, 3), "pairs": n}))
    pairs = dedup.minhash_lsh_pairs(docs, n=1, num_hashes=32, bands=4, threshold=0.8).persist()
    timed(spark, "dd/pairs_persist", lambda: pairs.count())
    timed(spark, "dd/dup_clusters", lambda: graph.dup_clusters(pairs).count())
    pairs.unpersist()


def sec_vector(spark):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from gazetteer_search_spark.index import vectors as _vec
    from gazetteer_search_spark.index import builder
    from gazetteer_search_spark.operators import similarity as _sim
    from gazetteer_search_spark.sources import documents_as_corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src = docs.select("doc_id", F.col("text"))
    feats_md5 = _sim.hashed_feats(src, 64, hash_fn="md5_60")
    timed(spark, "vec/hashed_feats_md5_noop", lambda: noop(feats_md5))
    feats_xx = _sim.hashed_feats(src, 64, hash_fn="xxhash64")
    timed(spark, "vec/hashed_feats_xx_noop", lambda: noop(feats_xx))
    fp = _sim.hashed_feats(src, 64, hash_fn="md5_60").persist()
    fp.count()
    vec = _sim.vectorize_docs(src, dim=64, hash_fn="md5_60", feats=fp,
                              n_docs=float(docs.count()),
                              dfreq=fp.groupBy("feat").agg(F.count("*").cast("double").alias("dfc")))
    timed(spark, "vec/vectorize_noop", lambda: noop(vec))
    fp.unpersist()
    out = tempfile.mkdtemp(prefix="gssvecx")
    corpus = documents_as_corpus(spark, SF_DIR)
    builder.build_index(spark, corpus.limit(100), out, n_buckets=2)
    t = time.perf_counter()
    _vec.build_vectors(spark, out, dim=64, source=docs.select("doc_id", F.col("text").alias("content")))
    print(json.dumps({"phase": "vec/build_vectors_full", "sec": round(time.perf_counter() - t, 3)}))
    shutil.rmtree(out, ignore_errors=True)


SECTIONS = {
    "hard_negatives": sec_hard_negatives,
    "classifier": sec_classifier,
    "dedup": sec_dedup,
    "vector": sec_vector,
}


def main():
    names = sys.argv[1:] or list(SECTIONS)
    spark = get_session()
    for n in names:
        SECTIONS[n](spark)
    spark.stop()


if __name__ == "__main__":
    main()
