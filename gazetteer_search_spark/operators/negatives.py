"""Hard-negative mining for retrieval-model training (LLM-pipeline family).

Contrastive retrieval training needs, per training query, the top-ranked
NON-relevant documents under a first-stage ranker (BM25) — "hard"
negatives, the rows a bi-encoder most needs to learn to push away
(Karpukhin et al. 2020, DPR; Xiong et al. 2021, ANCE use exactly this
BM25-top-k construction).

ONE Spark job for the whole query batch — no per-query search loop:

1. Score table: the corpus's BM25 postings (term, doc_id, score) — the
   same tf/df/length pipeline the index builder runs (search/bm25.py).
2. Query side: distinct analyzed terms per query — (query_id, term).
3. Join on term (the only data-keyed shuffle), hash-agg the per-(query,
   doc) score sum, drop self-pairs and exact-duplicate pairs (sha
   equality — a mined "negative" that is literally the positive's copy
   would poison the loss), then one window row_number per query cuts
   top-k.

Scale shape: queries usually number 10^4-10^6 against 10^9+ docs; the
term join fans out by query-term df, so the optional ``max_term_df`` cap
drops stop-like terms from the QUERY side (they contribute ~0 BM25 mass
but dominate the join fan-out) — the same hot-key suppression the dedup
family uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gazetteer_search_spark.search import bm25


def mine_hard_negatives(
    df: DataFrame,
    query_ids: DataFrame | list[int],
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_term_df: int | None = None,
    tokenizer: str = "pandas",
) -> DataFrame:
    """Top-``k`` BM25 hard negatives per query document.

    ``df``: the corpus (documents shape). ``query_ids``: the training
    queries, given as ids into the same corpus (a DataFrame with an id
    column, or a literal list). Output: (query_id, doc_id, score, rank),
    rank 1-based per query, self and exact-text-duplicate pairs excluded.
    """
    spark = df.sparkSession
    if isinstance(query_ids, list):
        qids = spark.createDataFrame(
            [(int(i),) for i in query_ids], "query_id long"
        )
    else:
        qids = query_ids.select(
            F.col(query_ids.columns[0]).cast("long").alias("query_id")
        )

    # ONE tokenize pass (guide §4.1 — the Arrow tokenizer kernel is the
    # expensive stage): the corpus-stats action, the scored-postings
    # pipeline, the query-term projection and the sha dup-exclusion all
    # read this persisted frame instead of re-running the UDF per subtree
    # (the unpersisted form evaluated the tokenizer up to 4x per call).
    from gazetteer_search_spark.operators import ensure_min_partitions

    df = ensure_min_partitions(df)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("content"),
        F.sha2(F.col(text_col), 256).alias("sha"),
        bm25.tokens_col(F.col(text_col), tokenizer).alias("tokens"),
    ).withColumn("doc_len", F.size("tokens")).persist()

    # tf appears TWICE in the scored-postings plan (the term_stats branch
    # and the postings side of their join) — persist so the explode +
    # hash-agg over the corpus tokens runs once, not per branch
    tf = bm25.term_freqs(base.select("doc_id", "doc_len", "tokens")).persist()
    tstats = bm25.term_stats(tf)
    cs = base.agg(
        F.count("*").alias("n_docs"), F.avg("doc_len").alias("avg_doc_len")
    ).collect()[0]
    scored = bm25.scored_postings(
        tf, tstats, int(cs.n_docs), float(cs.avg_doc_len)
    ).select("term", "doc_id", "score")

    qterms = (
        base.join(F.broadcast(qids), base.doc_id == qids.query_id)
        .select("query_id", F.explode(F.array_distinct("tokens")).alias("term"))
        .distinct()
    )
    if max_term_df is not None:
        hot = tstats.filter(F.col("df") > max_term_df).select("term")
        qterms = qterms.join(F.broadcast(hot), "term", "left_anti")

    pairs = (
        qterms.join(scored, "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("score").alias("score"))
    )
    # exact-duplicate exclusion: sha-equality pairs against the queries
    qsha = base.join(
        F.broadcast(qids), base.doc_id == qids.query_id
    ).select("query_id", F.col("sha").alias("qsha"))
    dup = (
        qsha.join(base.select("doc_id", "sha"), F.col("sha") == F.col("qsha"))
        .filter(F.col("doc_id") != F.col("query_id"))
        .select("query_id", "doc_id")
    )
    # dup is bounded by (batch size x exact-duplicate multiplicity) — tiny
    # next to the scored pairs; broadcasting turns the anti-join map-side
    # (the planner's SMJ LeftAnti exchanged + sorted every scored pair).
    # Same contract as decontaminate's broadcast: if a pathological corpus
    # (every query a boilerplate text duplicated millions of times) ever
    # outgrows broadcast range, drop the hint and this degrades gracefully
    # to a shuffle anti-join with identical semantics.
    pairs = pairs.join(F.broadcast(dup), ["query_id", "doc_id"], "left_anti")

    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 9).desc(), F.col("doc_id").asc()
    )
    return (
        pairs.select(
            "query_id",
            "doc_id",
            F.round("score", 4).alias("score"),
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
