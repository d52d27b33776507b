"""Block-level attribute pruning (VERDICT r3 weak #1).

The build sub-partitions every (term, salt) posting run by the declared
attribute dimension (lang), so each block carries exactly one value bit in
``attr_bits`` and a ``lang == X`` filter prunes at block metadata level —
perfect selectivity, zero driver-side doc-id collect, truncation/theta
rank-safe (the kernel's candidate universe IS the filtered universe). The ES
analog is the per-type index the reference's mandatory type filters lean on
(MainAddressQueryBuilder.java:186-230).
"""

from __future__ import annotations

import pytest

from gazetteer_search_spark.index import builder
from gazetteer_search_spark.search.engine import (
    SearchEngine,
    SearchOptions,
    TermGroup,
    oracle_topk,
)
from gazetteer_search_spark.search.fastpath import LocalExecutor
from gazetteer_search_spark.search.wand import WandCounters, wand_topk
from gazetteer_search_spark.sources import synthetic_corpus

N_DOCS = 400


@pytest.fixture(scope="module")
def corpus(spark):
    return synthetic_corpus(spark, N_DOCS).cache()


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_attr"))
    return builder.build_index(spark, corpus, out, n_buckets=8, postings_per_group=128)


@pytest.fixture(scope="module")
def index_noattr(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_noattr"))
    return builder.build_index(
        spark, corpus, out, n_buckets=8, postings_per_group=128, attr_dim=None
    )


def _grp(gid, terms, required=True, weight=1.0):
    return TermGroup(group_id=gid, terms=tuple(terms), required=required, weight=weight)


def _pairs(df):
    return [(r.doc_id, round(r.score, 9)) for r in df.collect()]


def test_dictionary_persisted_and_blocks_single_valued(index):
    assert index.meta["attr_dim"] == "lang"
    assert set(index.meta["attr_values"]) == {"python", "java", "js", "go", "none"}
    assert index.meta["attr_overflow"] is False
    rows = index.postings.select("attr_bits", "attr_ids", "doc_count").collect()
    dict_mask = (1 << len(index.meta["attr_values"])) - 1
    n_mixed = 0
    for r in rows:
        assert r.attr_bits > 0 and (r.attr_bits & ~dict_mask) == 0
        if r.attr_ids is None:
            # pure block: exactly one value bit
            assert (r.attr_bits & (r.attr_bits - 1)) == 0
        else:
            # hybrid tail block: several value bits + per-posting id bytes
            n_mixed += 1
            assert (r.attr_bits & (r.attr_bits - 1)) != 0
            assert len(r.attr_ids) == r.doc_count
            ids = set(r.attr_ids)
            assert all((1 << i) & r.attr_bits for i in ids)
    assert n_mixed > 0  # the long tail actually uses hybrid packing here


def test_unfiltered_results_identical_to_unattributed_index(spark, index, index_noattr):
    """Attr sub-partitioning must not change unfiltered semantics: same
    postings multiset, same ranks, same scores (per-lang blocks overlap in
    docID range — exercises the kernel's overlap handling + per-attr paint)."""
    for groups, msm in [
        ([_grp(0, ["postings"])], 1),
        ([_grp(0, ["merge"]), _grp(1, ["postings"])], 2),
        ([_grp(0, ["def"]), _grp(1, ["score"]), _grp(2, ["postings"])], 2),
    ]:
        got = wand_topk(spark, index, groups, msm, k=20, n_ranges=16)
        want = wand_topk(spark, index_noattr, groups, msm, k=20, n_ranges=16)
        assert _pairs(got) == _pairs(want)


@pytest.mark.parametrize("lang", ["python", "go"])
@pytest.mark.parametrize(
    "groups,msm",
    [
        ([_grp(0, ["postings"])], 1),
        ([_grp(0, ["merge"]), _grp(1, ["postings"])], 2),
        ([_grp(0, ["def"]), _grp(1, ["score"]), _grp(2, ["postings"])], 2),
    ],
)
def test_lang_filter_rank_identical_with_zero_id_collect(
    spark, corpus, index, groups, msm, lang
):
    """filter_pushdown_max=0 FORBIDS the id-set path outright; the attr gate
    alone must produce oracle-identical filtered top-k (and it enables
    truncation, which would be rank-unsafe without exactness)."""
    opts = SearchOptions(k=10, lang=lang)
    counters = WandCounters.create(spark)
    got = wand_topk(
        spark, index, groups, msm, k=10, options=opts, n_ranges=16,
        counters=counters, filter_pushdown_max=0,
    )
    want = oracle_topk(corpus, groups, msm, k=10, options=opts)
    assert _pairs(got) == _pairs(want)
    assert counters.attr_gated.value == 1
    assert counters.pushdown_fallback.value == 0


def test_unseen_lang_is_provably_empty(spark, index):
    """Complete dictionary + unseen value -> every block pruned, empty
    result, no fallback."""
    opts = SearchOptions(k=10, lang="cobol")
    got = wand_topk(
        spark, index, [_grp(0, ["postings"])], 1, options=opts,
        filter_pushdown_max=0,
    )
    assert got.count() == 0
    assert index.attr_filter_mask("lang", "cobol") == (0, -1)


def test_attr_mask_api(index, index_noattr):
    vals = index.meta["attr_values"]
    aid = vals.index("python")
    assert index.attr_filter_mask("lang", "python") == (1 << aid, aid)
    assert index.attr_filter_mask("repo", "org1/repo1") is None
    assert index_noattr.attr_filter_mask("lang", "python") is None


def test_serving_lang_filter_pruned_and_identical(spark, corpus, index, tmp_path_factory):
    """Serving executor: lang filter goes through the block-max pruned path
    (truncate on) and stays rank-identical to the oracle. On an index with
    big (split) runs, other langs' whole blocks are skipped; on the
    fine-salted fixture the tail packs hybrid (per-posting masks instead)."""
    groups = [_grp(0, ["merge"]), _grp(1, ["postings"])]
    opts = SearchOptions(k=10, lang="java")
    ex = LocalExecutor(index)
    hits = ex.search_rung(groups, 2, opts)
    assert ex.counters.attr_gated.value >= 1
    want = oracle_topk(corpus, groups, 2, k=10, options=opts)
    assert [(h.doc_id, round(h.score, 9)) for h in hits] == _pairs(want)
    assert all(h.lang == "java" for h in hits)

    # big corpus -> hot-term runs >= ATTR_SPLIT_MIN -> per-attr SPLIT blocks
    # -> the filter drops other langs' whole blocks at metadata level
    big_corpus = synthetic_corpus(spark, 1500).cache()
    out = str(tmp_path_factory.mktemp("idx_attr_big"))
    big = builder.build_index(
        spark, big_corpus, out, n_buckets=8, postings_per_group=1 << 16
    )
    split_rows = big.postings.filter(
        "term = 'def' and attr_ids is null"
    ).count()
    assert split_rows > 1  # per-attr split actually happened
    ex2 = LocalExecutor(big)
    hot = [_grp(0, ["def"]), _grp(1, ["return"])]
    hits2 = ex2.search_rung(hot, 2, opts)
    assert ex2.counters.skipped.value > 0  # other langs' blocks never decoded
    want2 = oracle_topk(big_corpus, hot, 2, k=10, options=opts)
    assert [(h.doc_id, round(h.score, 9)) for h in hits2] == _pairs(want2)


def test_serving_lazy_lang_filter_identical(spark, corpus, index):
    """Lazy-payload serving under a lang filter: wrong-lang payloads are
    never fetched; results identical to eager."""
    groups = [_grp(0, ["postings"])]
    opts = SearchOptions(k=10, lang="js")
    eager = LocalExecutor(index)
    lazy = LocalExecutor(index, lazy_payloads=True)
    h_eager = eager.search_rung(groups, 1, opts)
    h_lazy = lazy.search_rung(groups, 1, opts)
    assert [(h.doc_id, round(h.score, 9)) for h in h_eager] == [
        (h.doc_id, round(h.score, 9)) for h in h_lazy
    ]
    assert all(h.lang == "js" for h in h_lazy)


def test_engine_plain_path_lang_filter(spark, corpus, index):
    """The DataFrame engine path decodes only the filter lang's blocks and
    matches the oracle."""
    eng = SearchEngine(spark, index)
    opts = SearchOptions(k=10, lang="python", fuzzy=False, prefix=False)
    hits = eng.search_hits("mergePostings scoreDocument ", opts)
    assert hits and all(h.lang == "python" for h in hits)


def test_combined_lang_plus_repo_filter(spark, corpus, index):
    """lang handled at block level + repo through the residual id-set path:
    combined filters stay oracle-identical."""
    groups = [_grp(0, ["postings"])]
    repo = corpus.filter("lang = 'python'").select("repo").first().repo
    opts = SearchOptions(k=10, lang="python", repo=repo)
    got = wand_topk(spark, index, groups, 1, k=10, options=opts, n_ranges=16)
    want = oracle_topk(corpus, groups, 1, k=10, options=opts)
    assert _pairs(got) == _pairs(want)


def test_null_lang_docs_excluded_by_filter_but_searchable(spark, tmp_path_factory):
    """NULL attr values ride the overflow bit WITHOUT setting attr_overflow
    (null never equals a filter value, so pruning their blocks under any
    lang filter is exact); unfiltered queries still see them."""
    out = str(tmp_path_factory.mktemp("idx_attr_null"))
    corpus = synthetic_corpus(spark, 120)
    from pyspark.sql import functions as F

    corpus = corpus.withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(F.col("lang"))
    )
    idx = builder.build_index(spark, corpus, out, n_buckets=4)
    assert idx.meta["attr_overflow"] is False
    groups = [_grp(0, ["postings"])]
    # unfiltered: null-lang docs present
    rows = wand_topk(spark, idx, groups, 1, k=200, n_ranges=8).collect()
    assert any(r.lang is None for r in rows)
    # filtered: none of them, and the attr gate handled it exactly
    opts = SearchOptions(k=200, lang="python")
    frows = wand_topk(
        spark, idx, groups, 1, k=200, options=opts, filter_pushdown_max=0
    ).collect()
    assert frows and all(r.lang == "python" for r in frows)
    want = oracle_topk(corpus, groups, 1, k=200, options=opts)
    assert [(r.doc_id, round(r.score, 9)) for r in frows] == _pairs(want)


def test_overflow_dictionary_keeps_correctness(spark, tmp_path_factory):
    """> 63 distinct values: hot values get bits, the tail shares the
    overflow bit. A filter on a dictionary value keeps overflow blocks too
    (exact=False) and the id-set path supplies exactness; a filter on an
    overflow value can't prune (mask None) and stays correct."""
    out = str(tmp_path_factory.mktemp("idx_attr_ovf"))
    from pyspark.sql import functions as F

    corpus = synthetic_corpus(spark, 300).withColumn(
        "lang", F.concat(F.lit("l"), F.pmod("doc_id", F.lit(70)).cast("string"))
    )
    idx = builder.build_index(spark, corpus, out, n_buckets=4)
    assert idx.meta["attr_overflow"] is True
    assert len(idx.meta["attr_values"]) == 63
    in_dict = idx.meta["attr_values"][0]
    out_dict = next(
        f"l{i}" for i in range(70) if f"l{i}" not in idx.meta["attr_values"]
    )
    groups = [_grp(0, ["postings"])]
    for lang in (in_dict, out_dict):
        opts = SearchOptions(k=20, lang=lang)
        got = wand_topk(spark, idx, groups, 1, k=20, options=opts, n_ranges=8)
        want = oracle_topk(corpus, groups, 1, k=20, options=opts)
        assert _pairs(got) == _pairs(want), lang
    # in-dictionary values are EXACT even under an overflow dictionary: their
    # postings always carry the fixed dictionary id, never the overflow bit
    aid = idx.meta["attr_values"].index(in_dict)
    assert idx.attr_filter_mask("lang", in_dict) == (1 << aid, aid)
    assert idx.attr_filter_mask("lang", out_dict) is None


def test_segment_inherits_attr_dict_new_lang_correct(spark, tmp_path_factory):
    """Segments reuse the base's attribute dictionary (no per-batch
    dictionary job), conservatively marked overflow: a batch introducing a
    lang the base never saw stays filterable (overflow bit -> doc-side
    recheck), and filters on base langs stay correct across generations."""
    import shutil

    from pyspark.sql import functions as F

    from gazetteer_search_spark.index import segments

    root = str(tmp_path_factory.mktemp("idx_attr_seg") / "idx")
    corpus = synthetic_corpus(spark, 150)
    builder.build_index(spark, corpus, root, n_buckets=4)
    batch = (
        corpus.filter(F.col("doc_id") < 30)
        .drop("doc_id")
        .withColumn("commit", F.sha1(F.concat("path", F.lit("v2"))))
        .withColumn("lang", F.lit("zig"))  # unseen in the base
        .withColumn("content", F.concat("content", F.lit(" attrsegmarker")))
    )
    segments.add_segment(spark, batch, root, n_buckets=4)
    seg_meta = builder.read_index_meta(segments.list_segments(root)[0]["path"])
    assert seg_meta["attr_values"] == builder.read_index_meta(root)["attr_values"]
    assert seg_meta["attr_overflow"] is True

    eng = segments.open_multi_search(root)
    opts = SearchOptions(k=100, prefix=False, fuzzy=False, lang="zig")
    hits = eng.search_hits("attrsegmarker", opts)
    assert len(hits) == 30 and all(h.lang == "zig" for h in hits)
    # base-lang filter still correct across generations (superseded docs out)
    opts2 = SearchOptions(k=300, prefix=False, fuzzy=False, lang="python")
    hits2 = eng.search_hits("postings", opts2)
    assert hits2 and all(h.lang == "python" for h in hits2)


def test_big_mixed_run_small_values_pool_into_hybrid_tail():
    """ADVICE r4: a >= ATTR_SPLIT_MIN run spread over MANY small attr values
    must not shatter into per-value micro-blocks — sub-ATTR_SUB_MIN values
    pool into hybrid byte-masked blocks, big values still split."""
    import numpy as np

    from gazetteer_search_spark.index.builder import (
        ATTR_SPLIT_MIN,
        ATTR_SUB_MIN,
        pack_term_run,
    )
    from gazetteer_search_spark.index import codec

    n = 2 * ATTR_SPLIT_MIN
    ids = np.arange(n, dtype=np.int64)
    tfs = np.ones(n, dtype=np.int64)
    scores = np.linspace(0.1, 1.0, n)
    # 40 distinct values, each ~ n/40 postings (well below ATTR_SUB_MIN)
    attrs = (ids % 40).astype(np.int64)
    rows: list = []
    pack_term_run(rows, "t", 0, 0, ids, tfs, scores, attrs)
    # no micro-blocks: every block holds a full BLOCK_SIZE except the tail
    counts = sorted(r[3] for r in rows)
    assert len(rows) <= -(-n // codec.BLOCK_SIZE) + 1
    assert counts[-1] == codec.BLOCK_SIZE
    # all pooled -> every block carries per-posting attr bytes
    assert all(r[12] is not None for r in rows)
    # the packed postings are exactly the input multiset
    total = sum(r[3] for r in rows)
    assert total == n

    # mixed case: one dominant value (>= ATTR_SUB_MIN) + a tiny tail value
    attrs2 = np.where(ids < n - 3, 0, 1).astype(np.int64)
    rows2: list = []
    pack_term_run(rows2, "t", 0, 0, ids, tfs, scores, attrs2)
    pure = [r for r in rows2 if r[12] is None]   # dominant value's own blocks
    hybrid = [r for r in rows2 if r[12] is not None]
    assert pure and len(hybrid) == 1 and hybrid[0][3] == 3
    assert ATTR_SUB_MIN <= codec.BLOCK_SIZE
