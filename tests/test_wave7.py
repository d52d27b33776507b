"""Wave-7 operators: pipeline aggregations over bucket rows, cross-corpus
duplicated-span stats, and the ES function_score decay family."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.operators import aggs, dedup
from gazetteer_search_spark.search import bm25


# ---------------------------------------------------------------------------
# pipeline aggregations
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def buckets(spark):
    rows = [(1, 10), (2, 13), (3, 9), (4, 9), (5, 20)]
    return spark.createDataFrame(rows, "bucket int, doc_count long")


def test_pipeline_aggs_values(spark, buckets):
    out = {
        r.bucket: r
        for r in aggs.pipeline_aggs(buckets, window=2, lag=2).collect()
    }
    assert out[1].derivative is None and out[1].cum_sum == 10.0
    assert out[2].derivative == 3.0 and out[2].serial_diff is None
    assert out[3].serial_diff == -1.0  # 9 - 10
    assert out[5].cum_sum == 61.0
    assert out[2].moving_avg == 11.5  # (10+13)/2
    assert out[1].moving_avg == 10.0  # window clipped at the start


def test_bucket_script_selector_sort(spark, buckets):
    b = aggs.bucket_script(buckets, "double_count", "doc_count * 2")
    assert {r.bucket: r.double_count for r in b.collect()}[3] == 18.0
    kept = aggs.bucket_selector(buckets, "doc_count >= 10").collect()
    assert sorted(r.bucket for r in kept) == [1, 2, 5]
    top = aggs.bucket_sort(buckets, "doc_count", size=2).collect()
    assert [r.bucket for r in top] == [5, 2]
    # tie-break: buckets 3 and 4 both 9 -> ascending doc_count, bucket asc
    asc = aggs.bucket_sort(buckets, "doc_count", ascending=True, size=2)
    assert [r.bucket for r in asc.collect()] == [3, 4]


def test_pipeline_aggs_rejects_bad_params(spark, buckets):
    with pytest.raises(ValueError):
        aggs.pipeline_aggs(buckets, window=0)
    with pytest.raises(ValueError):
        aggs.pipeline_aggs(buckets, lag=0)


# ---------------------------------------------------------------------------
# span_dup_stats
# ---------------------------------------------------------------------------

def test_span_dup_stats(spark):
    shared = "a b c d"  # 4-gram shared by docs 1 and 2
    rows = [
        (1, f"{shared} x y z"),
        (2, f"p q {shared}"),
        (3, "entirely different words here now"),
        (4, "shorty"),  # < n words -> zero spans
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in dedup.span_dup_stats(df, n=4, min_df=2).collect()
    }
    # doc1 grams: 'a b c d','b c d x','c d x y','d x y z' -> 1 dup of 4
    assert out[1].n_spans == 4 and out[1].dup_spans == 1
    assert out[1].dup_fraction == 0.25
    # doc2 grams: 'p q a b','q a b c','a b c d' -> 1 dup of 3
    assert out[2].n_spans == 3 and out[2].dup_spans == 1
    assert out[3].dup_spans == 0
    assert out[4].n_spans == 0 and out[4].dup_fraction == 0.0


def test_span_dup_hash_families_agree(spark):
    rows = [(i, f"w{i} common span body here plus w{i} tail") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        map(tuple, dedup.span_dup_stats(df, n=3, hash_fn="xxhash64").collect())
    )
    b = sorted(
        map(tuple, dedup.span_dup_stats(df, n=3, hash_fn="md5_60").collect())
    )
    assert a == b


# ---------------------------------------------------------------------------
# decay functions
# ---------------------------------------------------------------------------

def _eval(spark, col) -> float:
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_gauss_decay_anchors(spark):
    # exactly 1.0 at origin, exactly `decay` at origin +/- scale
    at0 = _eval(spark, bm25.gauss_decay(F.lit(600.0), 600.0, 200.0))
    at_scale = _eval(spark, bm25.gauss_decay(F.lit(800.0), 600.0, 200.0))
    assert at0 == pytest.approx(1.0)
    assert at_scale == pytest.approx(0.5, rel=1e-9)
    sym = _eval(spark, bm25.gauss_decay(F.lit(400.0), 600.0, 200.0))
    assert sym == pytest.approx(at_scale)


def test_exp_linear_decay_anchors(spark):
    assert _eval(
        spark, bm25.exp_decay(F.lit(800.0), 600.0, 200.0)
    ) == pytest.approx(0.5)
    assert _eval(
        spark, bm25.linear_decay(F.lit(800.0), 600.0, 200.0)
    ) == pytest.approx(0.5)
    # linear floors at zero beyond the support (d >= scale/(1-decay))
    assert _eval(
        spark, bm25.linear_decay(F.lit(600.0 + 401.0), 600.0, 200.0)
    ) == 0.0


def test_decay_offset_plateau(spark):
    # inside the offset the multiplier is exactly 1.0
    v = _eval(
        spark, bm25.gauss_decay(F.lit(650.0), 600.0, 200.0, offset=100.0)
    )
    assert v == 1.0


def test_decay_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        bm25.gauss_decay(F.lit(0.0), 0.0, -1.0)
    with pytest.raises(ValueError):
        bm25.exp_decay(F.lit(0.0), 0.0, 1.0, decay=1.5)


# ---------------------------------------------------------------------------
# extended_stats / percentile_ranks
# ---------------------------------------------------------------------------

def test_extended_stats(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (None,)], "v double")
    r = aggs.extended_stats(df, "v").collect()[0]
    assert r.n == 3 and r.mn == 1.0 and r.mx == 3.0
    assert r.total == 6.0 and r.mean == 2.0
    assert r.sum_sq == 14.0
    assert r.variance == pytest.approx(2.0 / 3.0, abs=1e-6)
    assert r.std_dev == pytest.approx(math.sqrt(2.0 / 3.0), abs=1e-6)


def test_percentile_ranks(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 11)], "v double")
    rows = {r.value: r.rank for r in aggs.percentile_ranks(df, "v", (5.0, 10.0, 0.0)).collect()}
    assert rows[5.0] == 50.0 and rows[10.0] == 100.0 and rows[0.0] == 0.0
    with pytest.raises(ValueError):
        aggs.percentile_ranks(df, "v", ())


# ---------------------------------------------------------------------------
# search_sorted keyset paging
# ---------------------------------------------------------------------------

def test_search_sorted_keyset_pages(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from gazetteer_search_spark.index import builder
    from gazetteer_search_spark.search.engine import (
        SearchEngine, SearchOptions, TermGroup,
    )

    corpus = spark.range(0, 60).select(
        F.col("id").alias("doc_id"),
        F.lit("org/r").alias("repo"),
        # only 3 distinct paths -> heavy ties exercise the doc_id tiebreak
        F.format_string("src/p%d/f.py", F.col("id") % 3).alias("path"),
        F.lit("c").alias("commit"),
        F.lit("python").alias("lang"),
        F.lit("alpha beta").alias("content"),
    )
    out = str(tmp_path_factory.mktemp("idx_sorted"))
    idx = builder.build_index(spark, corpus, out, n_buckets=4)
    eng = SearchEngine(spark, idx, serving=False)
    g = [TermGroup(group_id=0, terms=("alpha",), required=True)]

    page1 = eng.search_sorted(g, 1, SearchOptions(k=25), by="path").collect()
    last = page1[-1]
    page2 = eng.search_sorted(
        g, 1, SearchOptions(k=25), by="path",
        after=(last.path, last.doc_id),
    ).collect()
    got = [(r.path, r.doc_id) for r in page1 + page2]
    want = sorted(
        [(f"src/p{i % 3}/f.py", i) for i in range(60)]
    )[:50]
    assert got == want  # gap-and-dup-free across the keyset boundary
    # descending order with cursor
    d1 = eng.search_sorted(
        g, 1, SearchOptions(k=25), by="path", ascending=False
    ).collect()
    dl = d1[-1]
    d2 = eng.search_sorted(
        g, 1, SearchOptions(k=25), by="path", ascending=False,
        after=(dl.path, dl.doc_id),
    ).collect()
    gotd = [(r.path, r.doc_id) for r in d1 + d2]
    wantd = sorted(
        [(f"src/p{i % 3}/f.py", i) for i in range(60)],
        key=lambda t: (_desc(t[0]), t[1]),
    )[:50]
    assert gotd == wantd
    with pytest.raises(ValueError):
        eng.search_sorted(g, 1, SearchOptions(k=5), by="content")


class _desc(str):
    """Inverted string ordering helper for the descending expectation."""

    def __lt__(self, other):  # noqa: D105
        return str.__gt__(self, other)


# ---------------------------------------------------------------------------
# weighted_avg / top_metrics / matrix_stats
# ---------------------------------------------------------------------------

def test_weighted_avg(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (3.0, 3.0), (None, 5.0), (7.0, None)], "v double, w double"
    )
    r = aggs.weighted_avg(df, "v", "w").collect()[0]
    assert r.n == 2
    assert r.weighted_avg == pytest.approx((1.0 + 9.0) / 4.0)


def test_top_metrics_ties_deterministic(spark):
    df = spark.createDataFrame(
        [(10.0, 1, "a"), (10.0, 5, "b"), (3.0, 9, "z")],
        "v double, uid long, et string",
    )
    r = aggs.top_metrics(df, "v", ["uid", "et"]).collect()[0]
    assert r.v_top == 10.0 and r.uid == 5 and r.et == "b"
    r2 = aggs.top_metrics(df, "v", ["uid"], ascending=True).collect()[0]
    assert r2.v_top == 3.0 and r2.uid == 9
    with pytest.raises(ValueError):
        aggs.top_metrics(df, "v", [])


def test_matrix_stats(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0)], "a double, b double"
    )
    r = aggs.matrix_stats(df, "a", "b").collect()[0]
    assert r.n == 3 and r.correlation == pytest.approx(1.0)
    assert r.covariance == pytest.approx(2.0 / 3.0 * 2)  # cov_pop = 4/3


# ---------------------------------------------------------------------------
# rollup / curriculum
# ---------------------------------------------------------------------------

def test_rollup_persisted_roundtrip(spark, tmp_path):
    import datetime as dt

    from gazetteer_search_spark.operators import rollup

    rows = [
        (dt.datetime(2024, 1, 1, h, m), "a" if h < 12 else "b", float(h * 10 + m))
        for h in (0, 5, 13) for m in (0, 30)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = str(tmp_path / "rollup")
    r = rollup.build_rollup(df, "ts", ["event_type"], ["value"],
                            interval="hour", out_dir=out)
    # persisted rollup re-aggregates to daily == direct daily from raw
    got = rollup.rollup_query(r, "day", ["event_type"], ["value"]).collect()
    by_key = {(x.bucket, x.event_type): x for x in got}
    a = by_key[(dt.datetime(2024, 1, 1), "a")]
    assert a.doc_count == 4 and a.value_min == 0.0 and a.value_max == 80.0
    assert a.value_sum == 0.0 + 30.0 + 50.0 + 80.0
    b = by_key[(dt.datetime(2024, 1, 1), "b")]
    assert b.doc_count == 2 and b.value_sum == 130.0 + 160.0
    # a finer query than the rollup's grain must refuse
    import pytest as _pt

    with _pt.raises(ValueError, match="finer"):
        rollup.rollup_query(r, "hour", [], ["value"], rollup_interval="day")


def test_curriculum_order_round_robin(spark):
    from gazetteer_search_spark.operators import packing

    df = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(10)], "doc_id long, s double"
    )
    out = packing.curriculum_order(df, "s", 3).collect()
    by_rank = sorted(out, key=lambda r: r.rank)
    # ascending score: doc 9 (s=91) first
    assert by_rank[0].doc_id == 9 and by_rank[0].shard == 0
    assert by_rank[1].shard == 1 and by_rank[2].shard == 2
    assert by_rank[3].shard == 0 and by_rank[3].shard_pos == 1
    # every shard sees a full difficulty sweep
    shards = {}
    for r in by_rank:
        shards.setdefault(r.shard, []).append(r.score)
    for sc in shards.values():
        assert sc == sorted(sc)
    with pytest.raises(ValueError):
        packing.curriculum_order(df, "s", 0)


# ---------------------------------------------------------------------------
# retrieval metrics
# ---------------------------------------------------------------------------

def test_retrieval_metrics_hand_case(spark):
    import math as _m

    from gazetteer_search_spark.operators import evaluation_ir

    run = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2),
         (3, 30, 1)],
        "query_id long, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 11), (1, 12), (1, 99),   # q1: hits at rank 2 and 3, one missed
         (2, 20),                      # q2: perfect at rank 1
         (3, 99),                      # q3: nothing found
         (4, 40)],                     # q4: not in the run at all
        "query_id long, doc_id long",
    )
    out = {r.query_id: r for r in
           evaluation_ir.retrieval_metrics(run, qrels, k=3).collect()}
    assert out[1].rr == 0.5 and out[1].recall == pytest.approx(2 / 3, abs=1e-6)
    dcg = 1 / _m.log2(3) + 1 / _m.log2(4)
    idcg = 1 / _m.log2(2) + 1 / _m.log2(3) + 1 / _m.log2(4)
    assert out[1].ndcg == pytest.approx(dcg / idcg, abs=1e-6)
    assert out[2].rr == 1.0 and out[2].recall == 1.0 and out[2].ndcg == 1.0
    assert out[3].rr == 0.0 and out[3].recall == 0.0 and out[3].ndcg == 0.0
    assert out[4].rr == 0.0  # query absent from the run entirely
    m = evaluation_ir.macro_metrics(
        evaluation_ir.retrieval_metrics(run, qrels, k=3)
    ).collect()[0]
    assert m.n_queries == 4
    assert m.mrr == pytest.approx((0.5 + 1.0 + 0.0 + 0.0) / 4, abs=1e-6)
    with pytest.raises(ValueError):
        evaluation_ir.retrieval_metrics(run, qrels, k=0)


def test_metrics_rows_matches_spark_form(spark):
    from gazetteer_search_spark.operators import evaluation_ir

    run = [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2), (3, 30, 1)]
    qrels = [(1, 11), (1, 12), (1, 99), (2, 20), (3, 99), (4, 40)]
    a = evaluation_ir.metrics_rows(run, qrels, k=3)
    b = [
        r.asDict()
        for r in evaluation_ir.retrieval_metrics(
            spark.createDataFrame(run, "query_id long, doc_id long, rank int"),
            spark.createDataFrame(qrels, "query_id long, doc_id long"),
            k=3,
        ).collect()
    ]
    assert a == b


def test_index_backed_hard_negatives_match_operator(spark, tmp_path_factory):
    """engine.mine_hard_negatives (persisted-index path) must equal the
    standalone corpus operator — same kernel, same BM25 stats."""
    from pyspark.sql import functions as F

    from gazetteer_search_spark.index import builder
    from gazetteer_search_spark.operators import negatives
    from gazetteer_search_spark.search.engine import SearchEngine

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 7} gamma delta") for i in range(40)],
        "doc_id long, text string",
    )
    corpus = docs.select(
        "doc_id",
        F.lit("org/r").alias("repo"),
        F.format_string("src/%d.py", "doc_id").alias("path"),
        F.lit("c").alias("commit"),
        F.lit("python").alias("lang"),
        F.col("text").alias("content"),
    )
    out = str(tmp_path_factory.mktemp("idx_hn"))
    idx = builder.build_index(
        spark, corpus, out, n_buckets=4, store_content=True
    )
    eng = SearchEngine(spark, idx, serving=True)
    a = [
        tuple(r)
        for r in eng.mine_hard_negatives([0, 1, 2], k=4).collect()
    ]
    b = [
        tuple(r)
        for r in negatives.mine_hard_negatives(docs, [0, 1, 2], k=4).collect()
    ]
    assert a == b and len(a) > 0


def test_search_sorted_serving_identical_to_spark(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from gazetteer_search_spark.index import builder
    from gazetteer_search_spark.search.engine import (
        SearchEngine, SearchOptions, TermGroup,
    )

    corpus = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.lit("org/r").alias("repo"),
        F.format_string("src/p%d/f.py", F.col("id") % 4).alias("path"),
        F.lit("c").alias("commit"),
        F.when(F.col("id") % 2 == 0, "python").otherwise("java").alias("lang"),
        F.lit("alpha beta").alias("content"),
    )
    out = str(tmp_path_factory.mktemp("idx_dvsort"))
    idx = builder.build_index(spark, corpus, out, n_buckets=4)
    g = [TermGroup(group_id=0, terms=("alpha",), required=True)]
    for by, asc in (("path", True), ("path", False), ("lang", True),
                    ("doc_id", False)):
        a = SearchEngine(spark, idx, serving=True).search_sorted(
            g, 1, SearchOptions(k=15), by=by, ascending=asc
        ).collect()
        b = SearchEngine(spark, idx, serving=False).search_sorted(
            g, 1, SearchOptions(k=15), by=by, ascending=asc
        ).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], (by, asc)
    # keyset continuity on the serving path
    e = SearchEngine(spark, idx, serving=True)
    p1 = e.search_sorted(g, 1, SearchOptions(k=20), by="path").collect()
    last = p1[-1]
    p2 = e.search_sorted(
        g, 1, SearchOptions(k=20), by="path",
        after=(last.path, last.doc_id),
    ).collect()
    ids = [r.doc_id for r in p1 + p2]
    assert len(ids) == len(set(ids)) == 40


def test_cross_source_dedup_priority(spark):
    from gazetteer_search_spark.operators import dedup

    rows = [
        (1, "web", "same text"),
        (2, "books", "same text"),     # books outranks web below
        (3, "forums", "same text"),    # unlisted -> loses to both
        (4, "web", "unique text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: r.is_kept for r in
           dedup.cross_source_dedup(
               df, priority={"books": 0, "web": 1}
           ).collect()}
    assert out[2] and not out[1] and not out[3]
    assert out[4]
    # no priority map: alphabetical source then doc_id decides
    out2 = {r.doc_id: r.is_kept for r in
            dedup.cross_source_dedup(df).collect()}
    assert out2[2] and not out2[1] and not out2[3]  # 'books' < 'forums' < 'web'
