"""Retrieval-evaluation metrics (the IR-eval op a retrieval-training
pipeline runs after mining/serving: MRR, recall@k, NDCG@k over a run).

Input contract = the TREC run shape: ``run`` (query_id, doc_id, rank) —
rank 1-based within query (ties already broken upstream) — and ``qrels``
(query_id, doc_id) holding the relevant pairs (binary relevance; graded
relevance extends the gain column).

All metrics in ONE pass over the run: join run-to-qrels on (query_id,
doc_id) (hash join on the composite key), then one per-query hash agg —
no window, no sort (ranks are input data). Queries with zero relevant
docs are excluded from the macro averages (the trec_eval convention).

- ``rr``        1/rank of the first relevant hit (0 when none in the run)
- ``recall``    |relevant ∩ top-k| / |relevant|
- ``ndcg``      DCG@k / ideal-DCG@k with the binary-gain
                1/log2(rank+1) discount
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retrieval_metrics(
    run: DataFrame, qrels: DataFrame, k: int = 10
) -> DataFrame:
    """Per-query metrics: (query_id, n_rel, rr, recall, ndcg), query-id
    ascending. Use ``macro_metrics`` for the averages row."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    r = run.filter(F.col("rank") <= k).select(
        "query_id", "doc_id", "rank"
    )
    q = qrels.select("query_id", "doc_id").distinct()
    n_rel = q.groupBy("query_id").agg(F.count("*").alias("n_rel"))
    hits = r.join(q, ["query_id", "doc_id"]).select(
        "query_id", "rank"
    )
    per_q = hits.groupBy("query_id").agg(
        F.min("rank").alias("_first"),
        F.count("*").alias("_nhit"),
        F.sum(
            F.lit(1.0) / F.log2(F.col("rank").cast("double") + F.lit(1.0))
        ).alias("_dcg"),
    )
    # ideal DCG@k for n relevant docs: sum_{i=1..min(n,k)} 1/log2(i+1)
    idcg = F.expr(
        f"aggregate(sequence(1, int(least(n_rel, {k}))), 0.0D, "
        "(acc, i) -> acc + 1.0D / log2(double(i) + 1.0D))"
    )
    return (
        n_rel.join(per_q, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.round(
                F.coalesce(F.lit(1.0) / F.col("_first"), F.lit(0.0)), 6
            ).alias("rr"),
            F.round(
                F.coalesce(F.col("_nhit"), F.lit(0)) / F.col("n_rel"), 6
            ).alias("recall"),
            F.round(
                F.coalesce(F.col("_dcg"), F.lit(0.0)) / idcg, 6
            ).alias("ndcg"),
        )
        .orderBy("query_id")
    )


def macro_metrics(per_query: DataFrame) -> DataFrame:
    """Macro averages over the per-query metric rows — one tiny agg."""
    return per_query.agg(
        F.count("*").alias("n_queries"),
        F.round(F.avg("rr"), 6).alias("mrr"),
        F.round(F.avg("recall"), 6).alias("macro_recall"),
        F.round(F.avg("ndcg"), 6).alias("macro_ndcg"),
    )


def metrics_rows(
    run_rows: list[tuple],
    qrels_rows: list[tuple],
    k: int = 10,
) -> list[dict]:
    """Pure-python twin of retrieval_metrics for k-bounded serving use
    (the POST /rank_eval route): same inputs as lists of (query_id,
    doc_id, rank) and (query_id, doc_id), same per-query outputs —
    equality with the Spark form is pinned by test. Driver-side because a
    rank_eval request carries a handful of queries with k-bounded runs;
    batch-scale evaluation belongs to retrieval_metrics."""
    import math as _m

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    rel: dict = {}
    for qid, did in qrels_rows:
        rel.setdefault(qid, set()).add(did)
    byq: dict = {}
    for qid, did, rank in run_rows:
        if rank <= k:
            byq.setdefault(qid, []).append((rank, did))
    out = []
    for qid in sorted(rel, key=lambda x: (str(type(x)), x)):
        rset = rel[qid]
        hits = sorted(
            (r, d) for r, d in byq.get(qid, []) if d in rset
        )
        rr = 1.0 / hits[0][0] if hits else 0.0
        recall = len(hits) / len(rset)
        dcg = sum(1.0 / _m.log2(r + 1.0) for r, _ in hits)
        idcg = sum(
            1.0 / _m.log2(i + 1.0)
            for i in range(1, min(len(rset), k) + 1)
        )
        out.append(
            {
                "query_id": qid,
                "n_rel": len(rset),
                "rr": round(rr, 6),
                "recall": round(recall, 6),
                "ndcg": round(dcg / idcg, 6) if idcg else 0.0,
            }
        )
    return out
