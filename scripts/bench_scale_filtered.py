#!/usr/bin/env python
"""Filtered-query latency vs corpus size (VERDICT r4 next #6).

Builds the deterministic synthetic source-code corpus at two scales
(default 100k and 1M docs), indexes it with the lang attribute dimension
AND (repo, path)-clustered doc_ids, then measures the SAME hot-term query
unfiltered / lang-filtered (block attr_bits pruning) / repo-filtered
(clustered docID range pruning) on both the Spark WAND path and the
Spark-free serving executor — with the driver id-set pushdown force-disabled
(filter_pushdown_max=0) so the only pruning available is block metadata.

The claim under test: filtered latency tracks the KEPT mass (the filter's
own share of postings), not the corpus size. lang='python' keeps ~20% of
docs (5 langs), repo='org3/repo5' keeps ~0.6% (161 repos) — so at 10x the
docs, the lang-filtered query should scale with the 20% slice and the
repo-filtered query should stay near-flat.

Usage: python scripts/bench_scale_filtered.py [--docs 100000 1000000]
Prints one JSON line per scale; paste the table into BENCH/BASELINE.md.
"""
import argparse
import json
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from gazetteer_search_spark.index import builder
from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions, TermGroup
from gazetteer_search_spark.search.wand import WandCounters, wand_topk
from gazetteer_search_spark.session import get_spark
from gazetteer_search_spark.sources.corpus import synthetic_corpus

HOT = "def"          # hot keyword (~1/3 of docs contain it)
LANG = "python"      # 1 of 5 langs -> keeps ~20% of docs
REPO = "org3/repo5"  # 1 of 161 (org,repo) combos -> keeps ~0.6% of docs


def g(gid, terms):
    return TermGroup(group_id=gid, terms=tuple(terms), required=True)


def bench(fn, runs=3):
    best = float("inf")
    for _ in range(runs):
        t = time.perf_counter()
        rows = fn()
        best = min(best, time.perf_counter() - t)
        assert rows is not None
    return best


def run_scale(spark, n_docs: int, cpus: int) -> dict:
    out = tempfile.mkdtemp(prefix=f"gss_scalef_{n_docs}_")
    corpus = synthetic_corpus(spark, n_docs)
    t = time.perf_counter()
    idx = builder.build_index(
        spark, corpus, out, tokenizer="pandas",
        n_buckets=16, postings_per_group=1 << 18,
        cluster_by=("repo", "path"),
    )
    build_s = time.perf_counter() - t
    res = {"docs": n_docs, "build_s": round(build_s, 2)}

    groups = [g(0, [HOT])]
    spark_opts = dict(k=20, n_ranges=cpus, filter_pushdown_max=0)

    # ---- Spark WAND tier ----
    res["spark_unfiltered_s"] = bench(
        lambda: wand_topk(spark, idx, groups, 1, **spark_opts).collect())
    lc = WandCounters.create(spark)
    res["spark_lang_s"] = bench(
        lambda: wand_topk(spark, idx, groups, 1,
                          options=SearchOptions(k=20, lang=LANG),
                          counters=lc, **spark_opts).collect())
    assert lc.pushdown_fallback.value == 0
    rc = WandCounters.create(spark)
    res["spark_repo_s"] = bench(
        lambda: wand_topk(spark, idx, groups, 1,
                          options=SearchOptions(k=20, repo=REPO),
                          counters=rc, **spark_opts).collect())
    assert rc.pushdown_fallback.value == 0

    # block-metadata keep ratios for the hot term
    mask, aid = idx.attr_filter_mask("lang", LANG)
    assert aid >= 0
    bq = idx.postings.filter(F.col("term") == HOT)
    res["hot_blocks_total"] = bq.count()
    res["hot_blocks_lang_kept"] = bq.filter(
        F.col("attr_bits").bitwiseAND(F.lit(mask)) != 0).count()
    lo, hi = idx.doc_range_for(REPO)
    res["hot_blocks_repo_kept"] = bq.filter(
        (F.col("max_doc_id") >= lo) & (F.col("min_doc_id") <= hi)).count()

    # ---- Spark-free serving tier (warm) ----
    lex = SearchEngine(spark, idx, serving=True)._local
    for name, opts in (
        ("serve_unfiltered", SearchOptions(k=20)),
        ("serve_lang", SearchOptions(k=20, lang=LANG)),
        ("serve_repo", SearchOptions(k=20, repo=REPO)),
    ):
        lex.search_rung(groups, 1, opts)  # warm
        lex.counters.reset()
        t = time.perf_counter()
        rows = lex.search_rung(groups, 1, opts)
        res[f"{name}_ms"] = round((time.perf_counter() - t) * 1e3, 2)
        assert rows
        res[f"{name}_decoded"] = lex.counters.decoded.value
        res[f"{name}_skipped"] = lex.counters.skipped.value

    shutil.rmtree(out, ignore_errors=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, nargs="+", default=[100_000, 1_000_000])
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    spark = get_spark("gss_bench_scale_filtered", cpus=args.cpus)
    for n in args.docs:
        line = run_scale(spark, n, args.cpus)
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in line.items()}), flush=True)


if __name__ == "__main__":
    main()
