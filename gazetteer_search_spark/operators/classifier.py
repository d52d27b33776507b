"""Trained quality classifier: hashed bag-of-words logistic regression.

The CCNet / fastText-style *trained* quality filter — the learned
counterpart of the heuristic rules in :mod:`textstats` (CCNet trains a
linear model against a target domain and keeps documents the model scores
high; fastText's supervised mode is the same hashed-linear shape). The
reference repo has no ML filtering (it delegates relevance entirely to
ES/Lucene BM25 — ``/root/reference/src/main/java/me/osm/gazetteer/search/
imp/addr/AddressesIndexer.java`` builds the index, ranking is query-time),
so this operator family is part of the LLM-data-pipeline surface the brief
asks for beyond reference parity.

Design (Spark-first, 100-TB shape):

- **Features**: the feature-hashing trick (Weinberger et al., ICML 2009)
  over ``[a-z0-9]+`` tokens — ``feat = hash64(token) % n_features``, value
  = tf / doc_len (L1-normalised bag of words) plus one reserved bias
  feature. No vocabulary is ever built or shipped: the feature space is
  O(n_features) regardless of corpus size.
- **Training**: full-batch gradient descent on L2-regularised logistic
  loss, run AS SPARK AGGREGATIONS — per iteration one broadcast join of
  the (tiny, <= n_features+1 rows) weight table onto the feature rows to
  get per-doc margins, one groupBy(feat) for the gradient, one k-bounded
  collect of <= n_features+1 gradient rows. The corpus is never collected;
  driver state is O(n_features). Fixed iteration count + deterministic
  init (zeros) make the trained weights a pure function of the input.
- **Oracle**: with ``hash_fn='md5_60'`` (:func:`dedup.hash64_col`) every
  step — featurisation, every GD iteration, scoring — is recomputable by
  the DuckDB harness as unrolled CTEs, the same trick that oracled the
  Lloyd-trained IVF quantizer (``__spark_entry__.oracle_sql()``'s
  ``ann_ivf_trained``). The scale default stays ``xxhash64``.
- **Weak labels**: callers pass any deterministic label column. The
  shipped helper labels docs containing seed terms (CCNet's "target
  domain" reduced to a seed-term membership rule — no external data).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from gazetteer_search_spark.operators.textstats import words_col

BIAS = -1  # reserved feature index for the intercept (never a hash value)


def seed_label(text: Column, seed_terms: list[str]) -> Column:
    """Weak label: 1.0 when the tokenised text contains any seed term."""
    ws = words_col(text)
    hit = None
    for t in seed_terms:
        c = F.array_contains(ws, t)
        hit = c if hit is None else (hit | c)
    return F.when(hit, F.lit(1.0)).otherwise(F.lit(0.0))


def featurize(
    df: DataFrame,
    n_features: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_id, feat, val) hashed-BoW rows: tf/doc_len per hashed token
    plus a bias row (feat=BIAS, val=1.0) for every doc — so every doc has
    at least one feature row and the margin join never drops a doc."""
    # the explode+pmod(hash)+groupBy tf stage mirrors similarity.hashed_feats
    # (same tokenizer, same pmod), with the doc length carried through the
    # explode as a grouping column instead of re-aggregated + joined back
    # (guide §2.4 — one shuffle, not two plus a join): n = size(words) =
    # sum of tf over the doc's features, the identical integer.
    from gazetteer_search_spark.operators import ensure_min_partitions
    from gazetteer_search_spark.operators.dedup import hash64_col
    from gazetteer_search_spark.operators.textstats import words_col

    df = ensure_min_partitions(df)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        words_col(F.col(text_col)).alias("_ws"),
    ).select(
        "doc_id", F.size("_ws").alias("n"), F.explode("_ws").alias("t")
    )
    tf = (
        toks.withColumn(
            "feat", F.pmod(hash64_col(hash_fn, F.col("t")), F.lit(n_features))
        )
        .groupBy("doc_id", "n", "feat")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    feats = tf.select(
        "doc_id", "feat", (F.col("tf") / F.col("n")).alias("val")
    )
    bias = df.select(
        F.col(id_col).alias("doc_id"),
        F.lit(BIAS).cast("long").alias("feat"),
        F.lit(1.0).alias("val"),
    )
    return feats.unionByName(bias)


def train_logreg(
    feats: DataFrame,
    labels: DataFrame,
    lr: float = 2.0,
    iters: int = 4,
    l2: float = 1e-4,
) -> dict[int, float]:
    """Full-batch GD on L2-regularised logistic loss, each step one Spark
    pass (margin broadcast-join + gradient groupBy + <=D-row collect).

    ``labels`` is (doc_id, y) with y in {0.0, 1.0}. Returns {feat: weight}
    for every feature present in the corpus (absent features stay 0 under
    zero init and never move — their gradient is 0 and l2 keeps them 0),
    so tracking only present features is exact, not an approximation.
    """
    spark = feats.sparkSession
    feats = feats.persist()
    n_docs = labels.count()
    # fl is cached HASH-PARTITIONED BY doc_id: every later iteration's
    # margin is a window over doc_id (see below), and a cached partitioning
    # that already satisfies the window's distribution means iterations
    # 1..n-1 pay ZERO data exchanges over the feature rows — only the
    # <= n_features-row gradient shuffle (guide §2.4 remove shuffles:
    # establish the partitioning once, reuse it every round).
    fl = (
        feats.join(labels.select("doc_id", "y"), "doc_id")
        .repartition("doc_id")
        .persist()
    )
    if iters <= 0:
        # contract: zero-trained weights still enumerate present features
        w0 = {
            int(r.feat): 0.0
            for r in feats.select("feat").distinct().collect()
        }
        fl.unpersist()
        return w0
    w: dict[int, float] = {}
    for it in range(iters):
        if it == 0:
            # zero-initialized weights mean iteration 1's margin is EXACTLY
            # 0 for every doc (sum(val * 0.0) = 0.0, sigmoid(0) = 0.5 —
            # bit-identical to the joined form), so the margins join+agg is
            # skipped and p is the literal 0.5; the gradient's key set is
            # also exactly the present-feature set, replacing the separate
            # distinct-collect the r5 form paid up front (two fewer jobs
            # per training run, same math to the last ulp).
            grad_src = fl.withColumn("p", F.lit(0.5))
        else:
            from pyspark.sql.window import Window as _W

            wdf = spark.createDataFrame(
                [(int(f), float(v)) for f, v in w.items()], "feat long, wv double"
            )
            # per-doc margin as a WINDOW over the doc_id-partitioned cached
            # fl instead of a separate aggregate + join back (the r6-start
            # form exchanged the feature rows TWICE per iteration: once for
            # the margin groupBy, once to join margins onto fl). The weight
            # lookup is a broadcast join (map-side), the window's required
            # distribution is fl's cached partitioning, and the only
            # remaining exchange is the <= n_features-row gradient agg.
            # Unlabeled docs never reach fl, and their old margins were
            # dropped by the join anyway — the gradient sums the identical
            # multiset of (p - y) * val terms. w covers every feat present
            # in fl (the iteration-0 gradient enumerates exactly that set),
            # so the inner join drops no rows.
            m = F.sum(F.col("val") * F.col("wv")).over(_W.partitionBy("doc_id"))
            grad_src = (
                fl.join(F.broadcast(wdf), "feat")
                .withColumn("p", F.lit(1.0) / (F.lit(1.0) + F.exp(-m)))
            )
        grad_rows = (
            grad_src
            .groupBy("feat")
            .agg((F.sum((F.col("p") - F.col("y")) * F.col("val")) / F.lit(float(n_docs))).alias("g"))
            .collect()  # k-bounded: <= n_features + 1 rows
        )
        g = {int(r.feat): float(r.g) for r in grad_rows}
        if it == 0:
            # every feature present in the corpus appears in the first
            # gradient (groupBy over all feature rows); absent features
            # stay 0 forever under zero init + L2, so this set is exact
            w = {int(r.feat): 0.0 for r in grad_rows}
        w = {f: wv - lr * (g.get(f, 0.0) + l2 * wv) for f, wv in w.items()}
    fl.unpersist()
    # feats stays persisted DELIBERATELY: the caller passed it and almost
    # always scores the same frame next (classifier.score) — releasing it
    # here would force a full featurize recompute; ownership of the cache
    # stays with the caller's session (evictable storage level).
    return w


def score(
    feats: DataFrame,
    weights: dict[int, float],
    threshold: float | None = None,
) -> DataFrame:
    """(doc_id, prob[, keep]) — sigmoid of the broadcast weight dot-product.
    ``prob`` is double-rounded (9 then 4 places) so the value hash is stable
    across summation orders; ``keep`` derives from the ROUNDED prob so the
    cut never flips on last-ulp noise."""
    spark = feats.sparkSession
    wdf = spark.createDataFrame(
        [(int(f), float(v)) for f, v in weights.items()], "feat long, wv double"
    )
    probs = (
        feats.join(F.broadcast(wdf), "feat")
        .groupBy("doc_id")
        .agg(F.sum(F.col("val") * F.col("wv")).alias("m"))
        .select(
            "doc_id",
            F.round(F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))), 9), 4).alias("prob"),
        )
    )
    if threshold is None:
        return probs
    return probs.withColumn(
        "keep", (F.col("prob") >= F.lit(threshold)).cast("int")
    )


def train_logreg_numpy(
    feat_rows: list[tuple[int, int, float]],
    label_rows: list[tuple[int, float]],
    lr: float = 2.0,
    iters: int = 4,
    l2: float = 1e-4,
) -> dict[int, float]:
    """Independent single-node recompute of :func:`train_logreg` (same role
    as the numpy Lloyd twin in test_operators): dense numpy GD over the
    same (doc_id, feat, val) rows. Used by tests to pin the distributed
    trainer's math; never in the pipeline."""
    docs = sorted({d for d, _, _ in feat_rows})
    feats = sorted({f for _, f, _ in feat_rows})
    di = {d: i for i, d in enumerate(docs)}
    fi = {f: i for i, f in enumerate(feats)}
    X = np.zeros((len(docs), len(feats)))
    for d, f, v in feat_rows:
        X[di[d], fi[f]] = v
    y = np.zeros(len(docs))
    for d, yy in label_rows:
        y[di[d]] = yy
    w = np.zeros(len(feats))
    n = float(len(label_rows))
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        g = X.T @ (p - y) / n
        w = w - lr * (g + l2 * w)
    return {f: float(w[fi[f]]) for f in feats}


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
