"""Block-max WAND operator: rank-identical to the brute-force oracle and the
DataFrame engine path (SURVEY §7.2 stage 6 — the 'hard' rank-identity gate)."""

from __future__ import annotations

import pytest

from gazetteer_search_spark.index import builder
from gazetteer_search_spark.search.engine import (
    SearchEngine,
    SearchOptions,
    TermGroup,
    oracle_topk,
)
from gazetteer_search_spark.search.wand import WandCounters, wand_topk
from gazetteer_search_spark.sources import synthetic_corpus

N_DOCS = 400


@pytest.fixture(scope="module")
def corpus(spark):
    return synthetic_corpus(spark, N_DOCS).cache()


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_wand"))
    return builder.build_index(spark, corpus, out, n_buckets=8, postings_per_group=128)


def _grp(gid, terms, required=True, weight=1.0):
    return TermGroup(group_id=gid, terms=tuple(terms), required=required, weight=weight)


def assert_rank_identical(got_df, want_df):
    got = [(r.doc_id, r.score) for r in got_df.collect()]
    want = [(r.doc_id, r.score) for r in want_df.collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9), gd


CASES = [
    ([_grp(0, ["postings"])], 1),  # single term
    ([_grp(0, ["merge"]), _grp(1, ["postings"])], 2),  # AND intersection
    ([_grp(0, ["merge"]), _grp(1, ["score"]), _grp(2, ["index"])], 3),  # 3-way AND
    ([_grp(0, ["merge"]), _grp(1, ["score"]), _grp(2, ["index"])], 2),  # msm path
    ([_grp(0, ["merge", "mergepostings"]), _grp(1, ["block"])], 2),  # dis_max in AND
    ([_grp(0, ["postings"]), _grp(1, ["def"], required=False, weight=0.5)], 1),
    ([_grp(0, ["merge"]), _grp(1, ["postings"])], 1),  # pure OR (BMW path)
    ([_grp(0, ["def"]), _grp(1, ["score"]), _grp(2, ["postings"])], 2),  # hot OR
    # per-term (cross-field-style) weights inside a dis_max group
    (
        [
            TermGroup(0, ("merge", "postings"), True, term_weights=(2.0, 1.0)),
            _grp(1, ["block"], weight=0.5),
        ],
        1,
    ),
]


@pytest.mark.parametrize("groups,msm", CASES)
def test_wand_matches_oracle(spark, corpus, index, groups, msm):
    got = wand_topk(spark, index, groups, msm, k=20, n_ranges=16)
    want = oracle_topk(corpus, groups, msm, k=20)
    assert_rank_identical(got, want)


def test_wand_matches_engine_with_filters_and_boosts(spark, index, corpus):
    groups = [_grp(0, ["postings"])]
    opts = SearchOptions(k=20, lang="python", lang_boosts={"python": 2.0})
    got = wand_topk(spark, index, groups, 1, k=20, options=opts, n_ranges=16)
    want = oracle_topk(corpus, groups, 1, k=20, options=opts)
    assert_rank_identical(got, want)


def test_wand_empty_intersection(spark, index):
    groups = [_grp(0, ["postings"]), _grp(1, ["zzznotaterm"])]
    assert wand_topk(spark, index, groups, 2, k=20, n_ranges=16).count() == 0


def test_blockmax_theta_pruning_skips_blocks(spark, tmp_path_factory):
    """The BMW criterion (VERDICT r1 #1): on an OR query with a hot term and
    a locally-clustered rare term, the theta threshold must leave the hot
    term's out-of-band blocks undecoded — and stay rank-identical."""
    from pyspark.sql import functions as F

    n = 6000  # hot term posting count > UPFRONT_MAX_POSTINGS -> metadata group
    corpus = (
        spark.range(0, n, 1, 8)
        .select(
            F.col("id").alias("doc_id"),
            F.lit("r").alias("repo"),
            F.format_string("f/%d.py", "id").alias("path"),
            F.lit("c").alias("commit"),
            F.lit("python").alias("lang"),
            F.when(
                F.col("id").between(1000, 1009),
                F.lit("common filler tokens raregem here"),
            )
            .otherwise(F.lit("common filler tokens steady here"))
            .alias("content"),
        )
        .cache()
    )
    out = str(tmp_path_factory.mktemp("idx_bmw"))
    idx = builder.build_index(spark, corpus, out, n_buckets=4, postings_per_group=1 << 20)

    groups = [_grp(0, ["common"]), _grp(1, ["raregem"])]
    counters = WandCounters.create(spark)
    got = wand_topk(spark, idx, groups, 1, k=5, n_ranges=1, counters=counters)
    want = oracle_topk(corpus, groups, 1, k=5)
    assert_rank_identical(got, want)
    # the hot list spans ~47 blocks; only the rare band's intervals survive
    assert counters.skipped.value > 10, (
        counters.decoded.value, counters.skipped.value
    )
    assert counters.decoded.value >= 1


def test_wand_filter_pushdown_rank_identical(spark, index, corpus):
    """Selective doc-filter pushdown: the kernel filters at decode time and
    local truncation re-enables — results stay rank-identical to the oracle
    with the same filter applied downstream."""
    groups = [_grp(0, ["postings"]), _grp(1, ["merge"])]
    opts = SearchOptions(k=10, lang="python")
    got = wand_topk(spark, index, groups, 1, k=10, options=opts, n_ranges=8)
    want = oracle_topk(corpus, groups, 1, k=10, options=opts)
    assert_rank_identical(got, want)
    # empty allowed set -> empty result, no crash
    opts2 = SearchOptions(k=5, repo="nope/none")
    assert wand_topk(spark, index, groups, 1, k=5, options=opts2).count() == 0


def test_wand_cursor_with_filter_page2(spark, index, corpus):
    """Keyset cursor + selective filter (ADVICE r2 medium): pushdown must NOT
    re-enable kernel truncation when a cursor is set — page-2 candidates rank
    k+1..2k locally and a truncating kernel would discard them."""
    groups = [_grp(0, ["postings"]), _grp(1, ["merge"])]
    k = 5
    opts1 = SearchOptions(k=k, lang="python")
    page1 = wand_topk(spark, index, groups, 1, k=k, options=opts1, n_ranges=8).collect()
    assert page1
    last = page1[-1]
    opts2 = SearchOptions(k=k, lang="python", after=(last.score, last.doc_id))
    got = wand_topk(spark, index, groups, 1, k=k, options=opts2, n_ranges=8)
    want = oracle_topk(corpus, groups, 1, k=k, options=opts2)
    assert want.count() > 0, "fixture must actually have a second page"
    assert_rank_identical(got, want)
    # pages must not overlap
    assert not ({r.doc_id for r in page1} & {r.doc_id for r in got.collect()})


def test_wand_filtered_theta_pruning(spark, tmp_path_factory):
    """With pushdown, theta pruning works UNDER a filter: hot-term blocks in
    ranges holding no allowed rare docs are skipped."""
    from pyspark.sql import functions as F

    n = 6000
    corpus = (
        spark.range(0, n, 1, 8)
        .select(
            F.col("id").alias("doc_id"),
            F.lit("r").alias("repo"),
            F.format_string("f/%d.py", "id").alias("path"),
            F.lit("c").alias("commit"),
            F.when(F.col("id") % 2 == 0, "python").otherwise("java").alias("lang"),
            F.when(
                F.col("id").between(1000, 1019),
                F.lit("common filler tokens raregem here"),
            )
            .otherwise(F.lit("common filler tokens steady here"))
            .alias("content"),
        )
        .cache()
    )
    out = str(tmp_path_factory.mktemp("idx_bmwf"))
    idx = builder.build_index(spark, corpus, out, n_buckets=4, postings_per_group=1 << 20)

    groups = [_grp(0, ["common"]), _grp(1, ["raregem"])]
    opts = SearchOptions(k=5, lang="python")
    counters = WandCounters.create(spark)
    got = wand_topk(
        spark, idx, groups, 1, k=5, options=opts, n_ranges=1, counters=counters
    )
    want = oracle_topk(corpus, groups, 1, k=5, options=opts)
    assert_rank_identical(got, want)
    assert counters.skipped.value > 10, (
        counters.decoded.value, counters.skipped.value
    )


def test_kernel_lazy_payload_fetch_identical(spark, index):
    """make_range_kernel(payload_fetch=...): metadata-only block rows + a
    batched fetcher produce byte-identical output to inline payloads — the
    remote-store serving hook (per-round payload IO bounded by decode count,
    e.g. object-store range reads per block)."""
    import pandas as pd

    from gazetteer_search_spark.search.engine import SearchEngine
    from gazetteer_search_spark.search.wand import make_range_kernel

    eng = SearchEngine(spark, index, serving=True)
    ex = eng._local
    groups = [_grp(0, ["postings"]), _grp(1, ["merge"])]
    pdf = ex._grouped_blocks(groups)
    group_meta = {g.group_id: (g.required, g.weight) for g in groups}
    width = int(pdf["max_doc_id"].max()) + 1

    kern_inline = make_range_kernel(group_meta, 1, 10, width, truncate=True)
    want = kern_inline((0,), pdf)

    payload_lut = {
        (t, int(b)): (ib, sb)
        for t, b, ib, sb in zip(
            pdf["term"], pdf["block_id"],
            pdf["doc_ids_delta_varbyte"], pdf["scores_f64"],
        )
    }
    calls = []

    def fetch(pairs):
        calls.append(list(pairs))
        return {p: payload_lut[p] for p in pairs}

    meta_pdf = pdf.drop(columns=["doc_ids_delta_varbyte", "scores_f64"])
    kern_lazy = make_range_kernel(
        group_meta, 1, 10, width, truncate=True, payload_fetch=fetch
    )
    got = kern_lazy((0,), meta_pdf)
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        want.sort_values("doc_id").reset_index(drop=True),
    )
    assert calls and sum(len(c) for c in calls) <= len(pdf)
