"""Physical-plan shape assertions: the scale contract (SURVEY §4.2).

These tests pin the plan properties that matter at 100 TB: term lookups prune
postings partitions AND push term predicates into the parquet scan; dimension
joins broadcast; nothing goes cartesian.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.index import builder
from gazetteer_search_spark.plans import (
    assert_no_cartesian,
    assert_partition_pruned,
    assert_pushed_filters,
    uses_broadcast_join,
)
from gazetteer_search_spark.sources import synthetic_corpus


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_plans"))
    return builder.build_index(
        spark, synthetic_corpus(spark, 200), out, n_buckets=8, postings_per_group=128
    )


def test_term_lookup_prunes_partitions_and_pushes_filters(spark, index):
    terms = ["merge", "postings"]
    buckets = sorted({builder.term_bucket_py(t, index.n_buckets) for t in terms})
    pruned = index.postings.filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
    )
    assert_partition_pruned(pruned, "term_bucket")
    assert_pushed_filters(pruned, "In(term,")


def test_docs_scan_pushes_lang_filter(spark, index):
    d = index.docs.filter(F.col("lang") == "python").select("doc_id")
    assert_pushed_filters(d, "EqualTo(lang,python)")


def test_dim_join_broadcasts(spark):
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    assert uses_broadcast_join(j)
    assert_no_cartesian(j)


def test_engine_query_no_cartesian(spark, index):
    from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions, TermGroup

    eng = SearchEngine(spark, index)
    res = eng.search_rung(
        [TermGroup(0, ("merge",), True), TermGroup(1, ("postings",), True)],
        2,
        SearchOptions(),
    )
    assert_no_cartesian(res)


def test_wand_plan_no_broadcast_for_groups(spark, index):
    """The wand serving path maps term->group with a CASE projection, not a
    broadcast join — no exchange on the hot path; blocks scan stays pruned."""
    from gazetteer_search_spark.search.engine import TermGroup
    from gazetteer_search_spark.search.wand import wand_topk

    res = wand_topk(
        spark, index,
        [TermGroup(0, ("merge",), True), TermGroup(1, ("postings",), True)],
        2, k=5, n_ranges=4, range_gate=False,
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    # everything upstream of the kernel (FlatMapGroupsInPandas) is join-free:
    # term->group is a CASE projection, so the only join in the whole plan is
    # the k-row docs lookup AFTER the kernel
    upstream = plan.split("FlatMapGroupsInPandas")[-1]
    assert "Join" not in upstream, upstream
    assert "CASE WHEN" in plan
    assert_no_cartesian(res)


def test_field_postings_share_pruned_layout(spark, tmp_path_factory):
    """Per-field postings live in the same partition layout: a name-field term
    lookup prunes to its crc32 bucket and pushes the term filter."""
    out = str(tmp_path_factory.mktemp("idx_plans_f"))
    idx = builder.build_index(
        spark, synthetic_corpus(spark, 200), out, n_buckets=8,
        postings_per_group=128, extra_fields={"name": "path"},
    )
    term = "name:src"
    b = builder.term_bucket_py(term, idx.n_buckets)
    pruned = idx.postings.filter(
        (F.col("term_bucket") == b) & (F.col("term") == term)
    )
    assert_partition_pruned(pruned, "term_bucket")
    assert_pushed_filters(pruned, "EqualTo(term,name:src)")
    assert pruned.count() > 0


def test_rescore_secondary_join_broadcasts_and_prunes(spark, index):
    """Rescore's secondary pass joins the (k-bounded) window doc_ids onto
    the secondary terms' postings decode: the window side must broadcast
    (never shuffle the postings on doc_id for <= window rows) and the
    postings scan must stay bucket-pruned; no cartesian anywhere."""
    from gazetteer_search_spark.search.engine import (
        SearchEngine, SearchOptions, TermGroup,
    )

    eng = SearchEngine(spark, index)
    g = [TermGroup(group_id=0, terms=("merge",), required=True)]
    sec = [TermGroup(group_id=0, terms=("block",), required=True)]
    df = eng.rescore(g, 1, sec, window_size=30, options=SearchOptions(k=10))
    assert uses_broadcast_join(df)
    assert_no_cartesian(df)
    assert_partition_pruned(df, "term_bucket")


def test_pack_sequences_single_exchange(spark):
    """Packing is one window cumsum + one explode: exactly ONE shuffle (the
    window's hashpartitioning on pack_group) in the whole plan — a second
    exchange would mean the packing re-shuffles what the window already
    co-located."""
    from gazetteer_search_spark.operators import packing
    from gazetteer_search_spark.plans import explain_str

    d = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("grp"),
        (F.col("id") % 17 + 1).alias("n"),
    )
    packed = packing.pack_sequences(d, budget=64, token_col="n", group_col="grp")
    plan = explain_str(packed, mode="simple")
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
    assert_no_cartesian(packed)


def test_significant_terms_no_cartesian_and_pruned_match(spark, index):
    """The fg pass is corpus-shaped by nature (full postings decode), but
    the match-set side must still be bucket-pruned and every join keyed —
    no cartesian, no broadcast of the corpus-sized fg side."""
    from gazetteer_search_spark.search.engine import (
        SearchEngine, SearchOptions, TermGroup,
    )

    eng = SearchEngine(spark, index)
    g = [TermGroup(group_id=0, terms=("merge",), required=True)]
    df = eng.significant_terms(g, 1, SearchOptions(), size=5, eager=False)
    assert_no_cartesian(df)


def test_chunk_documents_map_only(spark):
    """Sliding-window chunking is a single narrow stage: tokenize, sequence
    grid, explode, slice — ZERO exchanges; any shuffle here would re-
    partition 100 TB of text for a per-row transformation."""
    from gazetteer_search_spark.operators import packing
    from gazetteer_search_spark.plans import explain_str

    d = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta "), F.col("id").cast("string"))
        .alias("text"),
    )
    chunks = packing.chunk_documents(d, size=3, overlap=1)
    plan = explain_str(chunks, mode="simple")
    assert "Exchange" not in plan, plan
    assert_no_cartesian(chunks)


def test_date_histogram_fill_grid_broadcasts(spark):
    """The zero-fill grid joins the agg back to itself: the grid side (one
    row exploded to O(buckets)) must broadcast — a shuffle join keyed on
    bucket timestamps would re-shuffle the aggregated data for a
    bucket-count-sized join."""
    from datetime import datetime as DT

    from gazetteer_search_spark.operators import aggs

    d = spark.createDataFrame(
        [(DT(2024, 1, 1, h % 5), float(h)) for h in range(50)],
        "ts timestamp, value double",
    )
    filled = aggs.date_histogram(
        d, "ts", "hour", value_col="value", fill_empty=True
    )
    assert uses_broadcast_join(filled)
    assert_no_cartesian(filled)


def test_facet_cardinality_single_agg_no_cartesian(spark, index):
    """The cardinality sub-agg rides the match set's existing decode +
    doc-join: keyed joins only, and the distinct partials hang off ONE
    aggregation (no per-bucket re-scan)."""
    from gazetteer_search_spark.search.engine import (
        SearchEngine, SearchOptions, TermGroup,
    )

    eng = SearchEngine(spark, index)
    g = [TermGroup(group_id=0, terms=("merge",), required=True)]
    df = eng.facet_cardinality(g, 1, SearchOptions(), "lang", "repo")
    assert_no_cartesian(df)


def test_rollup_read_prunes_touched_partitions(spark, tmp_path):
    """Streaming rollup maintenance's old-partials read must PRUNE on the
    bucket_date partition column — the merge pays for touched dates only."""
    import datetime as dt

    from gazetteer_search_spark.operators import rollup

    rows = [
        (dt.datetime(2024, 1, d, h), "a", 1.0)
        for d in (1, 2, 3) for h in (0, 12)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = str(tmp_path / "roll")
    rollup.build_rollup(df, "ts", ["event_type"], ["value"],
                        interval="hour", out_dir=out)
    pruned = spark.read.parquet(out).filter(
        F.col("bucket_date").isin([dt.date(2024, 1, 2)])
    )
    assert_partition_pruned(pruned, "bucket_date")


def test_hard_negatives_broadcasts_queries_no_cartesian(spark):
    from gazetteer_search_spark.operators import negatives

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i} gamma") for i in range(30)],
        "doc_id long, text string",
    )
    out = negatives.mine_hard_negatives(docs, [0, 1], k=3)
    assert uses_broadcast_join(out)
    assert_no_cartesian(out)
    assert len(out.collect()) > 0


def test_hard_negatives_dup_exclusion_is_broadcast_anti(spark):
    """Round-6: the exact-duplicate exclusion (tiny: batch x duplicate
    multiplicity) must anti-join as a BROADCAST hash join — the planner's
    SortMergeJoin LeftAnti exchanged + sorted every scored pair."""
    from gazetteer_search_spark.operators import negatives

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i} gamma") for i in range(30)],
        "doc_id long, text string",
    )
    out = negatives.mine_hard_negatives(docs, [0, 1], k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    anti_lines = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti_lines, "expected a LeftAnti join in the plan"
    assert all("BroadcastHashJoin" in ln for ln in anti_lines), anti_lines
    assert not any("SortMergeJoin" in ln for ln in anti_lines), anti_lines


def test_span_dup_no_self_join(spark):
    """span_dup_stats joins exploded spans to the df table on the span
    HASH — never a doc-x-doc self-join, never cartesian."""
    from gazetteer_search_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, "one two three four five six seven eight nine") for i in range(6)],
        "doc_id long, text string",
    )
    out = dedup.span_dup_stats(docs, n=4)
    assert_no_cartesian(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly one data-keyed equi-join family in the span path (hash h),
    # one doc-keyed re-entry join for zero-span docs
    assert "CartesianProduct" not in plan


def test_search_sorted_is_take_ordered(spark, index):
    """search_sorted's orderBy+limit must compile to TakeOrderedAndProject
    (per-partition heap + k-row driver merge), never a global sort."""
    from gazetteer_search_spark.search.engine import (
        SearchEngine, SearchOptions, TermGroup,
    )

    eng = SearchEngine(spark, index)
    df = eng.search_sorted(
        [TermGroup(0, ("merge",), True)], 1, SearchOptions(k=10), by="path"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_vectorize_docs_broadcasts_df_stats(spark):
    """vectorize_docs joins the <=dim-row df table back to the feature rows
    via broadcast — never a shuffled join keyed on feat (dim is tiny, the
    feature rows are corpus-shaped), and never cartesian."""
    from gazetteer_search_spark.operators import similarity

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i} gamma delta") for i in range(40)],
        "doc_id long, text string",
    )
    out = similarity.vectorize_docs(docs, dim=16)
    assert uses_broadcast_join(out)
    assert_no_cartesian(out)


def test_classifier_training_step_broadcasts_weights(spark):
    """One GD step: the weight table (<= n_features+1 rows) broadcasts onto
    the feature rows for the margin aggregation — the corpus-shaped side is
    never shuffled against driver state; no cartesian anywhere."""
    from gazetteer_search_spark.operators import classifier

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma" if i % 2 else "delta eps zeta") for i in range(30)],
        "doc_id long, text string",
    )
    feats = classifier.featurize(docs, n_features=64)
    wdf = spark.createDataFrame(
        [(f, 0.0) for f in range(-1, 64)], "feat long, wv double"
    )
    margins = (
        feats.join(F.broadcast(wdf), "feat")
        .groupBy("doc_id")
        .agg(F.sum(F.col("val") * F.col("wv")).alias("m"))
    )
    assert uses_broadcast_join(margins)
    assert_no_cartesian(margins)
    # scoring path (the shipped helper) has the same shape
    w = {f: 0.01 for f in range(-1, 64)}
    scored = classifier.score(feats, w)
    assert uses_broadcast_join(scored)
    assert_no_cartesian(scored)
