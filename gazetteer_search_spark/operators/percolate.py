"""Percolator: reverse search (ES percolate-query analog, beyond reference).

A normal search matches one query against an indexed corpus; a percolator
matches a BATCH OF DOCUMENTS against a registry of stored queries — the
alerting / routing primitive ("which saved filters does this incoming doc
satisfy?"). In a training-data pipeline this is the router: every incoming
document is tagged with the subscriptions (quality filters, topic hooks,
takedown patterns) it triggers, in one pass.

Spark shape: the query registry is SMALL by construction (that's the
percolator premise), so it broadcasts; documents tokenize with the
CATALYST-NATIVE full kernel (analyzer.tokenizer.native_tokens_expr — the
same token stream the index builder produces, equivalence pinned by the
3-way kernel tests), explode to (doc, term), one broadcast join + one
map-side-combined groupBy gates each (doc, query) pair on msm distinct
required clauses. No UDF, one shuffle, corpus-shaped exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gazetteer_search_spark.analyzer.tokenizer import native_tokens_expr


def percolate(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[str, list, int]],
    text_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, query_id) for every (document, registered query) match.

    ``queries``: (query_id, [TermGroup, ...], msm) triples — the same
    TermGroup/msm IR the search engine executes, so a query can be
    registered verbatim from the parser. A document matches when >= msm
    DISTINCT required clauses have at least one term present (dis_max
    membership: any term of a group marks the group). Unregistered terms
    cost nothing — the broadcast join drops them at the probe."""
    if not queries:
        raise ValueError("percolate: empty query registry")
    qrows = [
        (qid, t, int(g.group_id), bool(g.required))
        for qid, groups, _msm in queries
        for g in groups
        for t in g.terms
    ]
    if not qrows:
        raise ValueError("percolate: registry has no terms")
    qdf = spark.createDataFrame(
        qrows, "query_id string, term string, group_id int, required boolean"
    )
    msm_df = spark.createDataFrame(
        [(qid, int(msm)) for qid, _g, msm in queries],
        "query_id string, msm int",
    )
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(native_tokens_expr(F.col(text_col)))
        ).alias("term"),
    )
    matched = (
        toks.join(F.broadcast(qdf), "term")
        .groupBy(id_col, "query_id")
        .agg(
            F.countDistinct(
                F.when(F.col("required"), F.col("group_id"))
            ).alias("matched_required")
        )
    )
    return (
        matched.join(F.broadcast(msm_df), "query_id")
        .filter(F.col("matched_required") >= F.col("msm"))
        .select(id_col, "query_id")
    )


def percolate_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    queries: list[tuple[str, list, int]],
    out_path: str,
    checkpoint_dir: str,
    text_col: str = "content",
    id_col: str = "doc_id",
):
    """Streaming percolation — routing at INGEST: every micro-batch of the
    document stream is matched against the registry and the (doc, query)
    matches land in a parquet sink. foreachBatch delivers batches
    AT-LEAST-ONCE, so the sink must be idempotent to reach exactly-once:
    each batch OVERWRITES its own ``batch=<id>`` partition directory — a
    replayed batch rewrites the same directory instead of appending
    duplicates (the same batch-id-keyed idempotence Spark's own file sink
    uses). Read the sink as one partitioned dataset
    (``spark.read.parquet(out_path)`` — ``batch`` surfaces as a partition
    column). Returns the StreamingQuery — started with availableNow so a
    finite backlog drains and terminates; long-running deployments drop the
    trigger."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        percolate(spark, batch_df, queries, text_col, id_col).write.mode(
            "overwrite"
        ).parquet(f"{out_path}/batch={int(batch_id)}")

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def parse_registry(raw: list) -> list[tuple]:
    """JSON registry rows -> (query_id, [TermGroup...], msm) triples — the
    one parser shared by the CLI batch job, the streaming router and the
    serving route, so the registry format is defined exactly once."""
    from gazetteer_search_spark.search.engine import TermGroup

    return [
        (
            q["id"],
            [
                TermGroup(
                    group_id=int(g["group_id"]),
                    terms=tuple(g["terms"]),
                    required=bool(g.get("required", True)),
                )
                for g in q["groups"]
            ],
            int(
                q.get(
                    "msm",
                    sum(1 for g in q["groups"] if g.get("required", True)),
                )
            ),
        )
        for q in raw
    ]


def percolate_doc(text: str, queries: list[tuple]) -> list[str]:
    """Spark-free single-document percolation — the serving twin of
    :func:`percolate` (equality pinned by tests): tokenize with the python
    kernel (same token stream as the Catalyst expression), then gate each
    stored query on >= msm DISTINCT required groups having at least one
    term present (dis_max membership). Returns matching query ids,
    sorted."""
    from gazetteer_search_spark.analyzer.tokenizer import tokenize_text

    toks = set(tokenize_text(text))
    out = []
    for qid, groups, msm in queries:
        # join-semantics parity with the batch operator: a (doc, query)
        # pair exists only when the doc shares >= 1 term with the query
        # (the broadcast term join), so an msm=0 all-optional query still
        # needs SOME term present — it never matches every document
        has_any = any(t in toks for g in groups for t in g.terms)
        matched_required = len(
            {
                g.group_id
                for g in groups
                if g.required and any(t in toks for t in g.terms)
            }
        )
        if has_any and matched_required >= int(msm):
            out.append(qid)
    return sorted(out)
