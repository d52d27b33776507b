"""Block-max WAND-style top-k over compressed posting blocks.

The native replacement for the dynamic-pruning retrieval the reference gets
from Lucene's WAND/BlockMaxWAND (delegated via ES; SURVEY §4.2). Distributed
shape:

  1. Partition-prune the postings scan to the query terms' term_buckets and
     push the term IN-list to the parquet scan (metadata only — payloads of
     irrelevant terms are never read).
  2. Assign each block to docID *ranges* (width = doc space / n_ranges); a
     block straddling a boundary goes to both ranges, its postings clipped in
     the kernel — so every doc meets all its terms in exactly one range task.
  3. **Metadata-level gate pruning** (the block-max skip): a range where
     fewer than ``msm`` required groups have any block is discarded before a
     single payload byte is decoded — for AND queries this is the posting-list
     intersection pruning that makes selective queries cheap.
  4. Arrow-batched numpy kernel per surviving range: progressive
     rarest-first intersection for AND (only blocks overlapping the shrinking
     candidate id-range are decoded — block skipping via min/max metadata),
     dis_max within groups, BM25 sum across groups, local k-heap.
  5. Global k-way: union of per-range top-k -> deterministic
     orderBy(round(score,9) desc, doc_id) limit k (tiny).

Rank-identical to the brute-force oracle (verified in tests); determinism from
fixed group-ordered summation and (score, doc_id) tie-breaks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gazetteer_search_spark.index import codec
from gazetteer_search_spark.index.builder import Index, term_bucket_py
from gazetteer_search_spark.search.engine import (
    SearchOptions,
    TermGroup,
    _groups_df,
    finalize_ranked,
)

PER_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("matched_required", T.LongType(), False),
    ]
)


def _decode_clip(rows: pd.DataFrame, lo: int, hi: int, id_lo=None, id_hi=None):
    """Decode a group's blocks, skipping blocks outside [lo,hi) and outside
    the candidate id window [id_lo, id_hi] (block skipping on metadata)."""
    ids_parts, sc_parts = [], []
    for buf, n, mn, mx, sbuf in zip(
        rows["doc_ids_delta_varbyte"], rows["doc_count"], rows["min_doc_id"],
        rows["max_doc_id"], rows["scores_f64"],
    ):
        if mx < lo or mn >= hi:
            continue
        if id_lo is not None and (mx < id_lo or mn > id_hi):
            continue
        ids = codec.delta_varbyte_decode(buf, int(n), int(mn))
        sc = codec.f64_decode(sbuf, int(n))
        m = (ids >= lo) & (ids < hi)
        if id_lo is not None:
            m &= (ids >= id_lo) & (ids <= id_hi)
        if m.any():
            ids_parts.append(ids[m])
            sc_parts.append(np.asarray(sc)[m])
    if not ids_parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    return np.concatenate(ids_parts), np.concatenate(sc_parts)


def _dismax(ids: np.ndarray, scores: np.ndarray):
    """Per-doc max over a group's term variants (P8)."""
    if ids.size == 0:
        return ids, scores
    uids, inv = np.unique(ids, return_inverse=True)
    out = np.full(uids.size, -np.inf)
    np.maximum.at(out, inv, scores)
    return uids, out


def make_range_kernel(
    group_meta: dict[int, tuple[bool, float]],
    msm: int,
    k: int,
    range_width: int,
    truncate: bool,
):
    """Build the applyInPandas kernel (closure over broadcast-size query
    metadata only). ``truncate=False`` when doc-level filters/boosts must be
    applied downstream (local truncation would be rank-unsafe)."""
    required_gids = sorted(g for g, (req, _) in group_meta.items() if req)
    all_gids = sorted(group_meta)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "score": pd.Series(dtype="float64"),
                "matched_required": pd.Series(dtype="int64"),
            }
        )

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        rng = int(key[0])
        lo, hi = rng * range_width, (rng + 1) * range_width
        by_gid = {int(g): sub for g, sub in pdf.groupby("group_id")}

        strict_and = msm == len(required_gids) and required_gids
        acc: dict[int, tuple[np.ndarray, np.ndarray]] = {}

        if strict_and:
            # rarest-first progressive intersection with block skipping
            order = sorted(
                required_gids,
                key=lambda g: int(by_gid[g]["doc_count"].sum()) if g in by_gid else 0,
            )
            if any(g not in by_gid for g in order):
                return _empty()
            cand = None
            for g in order:
                id_lo = int(cand.min()) if cand is not None and cand.size else None
                id_hi = int(cand.max()) if cand is not None and cand.size else None
                if cand is not None and cand.size == 0:
                    return _empty()
                ids, sc = _dismax(*_decode_clip(by_gid[g], lo, hi, id_lo, id_hi))
                acc[g] = (ids, sc)
                cand = ids if cand is None else cand[np.isin(cand, ids)]
            if cand is None or cand.size == 0:
                return _empty()
            # optional groups score only surviving candidates
            score = np.zeros(cand.size)
            for g in all_gids:
                req, w = group_meta[g]
                if g in acc:
                    ids, sc = acc[g]
                elif g in by_gid:
                    ids, sc = _dismax(
                        *_decode_clip(by_gid[g], lo, hi, int(cand.min()), int(cand.max()))
                    )
                else:
                    continue
                if ids.size == 0:
                    continue
                pos = np.searchsorted(ids, cand)
                ok = (pos < ids.size) & (ids[np.minimum(pos, ids.size - 1)] == cand)
                score[ok] += sc[np.minimum(pos, ids.size - 1)][ok] * w
            out_ids, out_sc = cand, score
            matched = np.full(cand.size, len(required_gids), dtype=np.int64)
        else:
            # OR / min_should_match path: decode all groups in range
            parts = []
            for g in all_gids:
                if g not in by_gid:
                    continue
                req, w = group_meta[g]
                ids, sc = _dismax(*_decode_clip(by_gid[g], lo, hi))
                if ids.size:
                    parts.append((ids, sc * w, req))
            if not parts:
                return _empty()
            all_ids = np.concatenate([p[0] for p in parts])
            all_sc = np.concatenate([p[1] for p in parts])
            all_req = np.concatenate(
                [np.full(p[0].size, 1 if p[2] else 0, dtype=np.int64) for p in parts]
            )
            uids, inv = np.unique(all_ids, return_inverse=True)
            score = np.zeros(uids.size)
            np.add.at(score, inv, all_sc)
            matched = np.zeros(uids.size, dtype=np.int64)
            np.add.at(matched, inv, all_req)
            keep = matched >= msm
            out_ids, out_sc, matched = uids[keep], score[keep], matched[keep]

        if out_ids.size == 0:
            return _empty()
        if truncate and out_ids.size > k:
            # local k-heap: keep top-k by (round(score,9) desc, doc_id asc)
            key_sc = np.round(out_sc, 9)
            order = np.lexsort((out_ids, -key_sc))[:k]
            out_ids, out_sc, matched = out_ids[order], out_sc[order], matched[order]
        return pd.DataFrame(
            {"doc_id": out_ids, "score": out_sc, "matched_required": matched}
        )

    return kernel


def wand_topk(
    spark: SparkSession,
    index: Index,
    groups: list[TermGroup],
    msm: int,
    k: int = 20,
    options: SearchOptions | None = None,
    n_ranges: int = 64,
) -> DataFrame:
    options = options or SearchOptions()
    terms = sorted({t for g in groups for t in g.terms})
    if not terms:
        raise ValueError("wand_topk requires at least one term")
    buckets = sorted({term_bucket_py(t, index.n_buckets) for t in terms})

    # max_doc_id is loaded from corpus_stats with the index — no docs scan here
    range_width = max(1, -(-(index.max_doc_id + 1) // n_ranges))

    blocks = index.postings.filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
    )
    gmap = _groups_df(spark, groups)
    blocks = blocks.join(F.broadcast(gmap), "term")

    # a block spans [min_doc_id, max_doc_id]; emit one row per overlapped range
    blocks = blocks.withColumn(
        "range_id",
        F.explode(
            F.sequence(
                (F.col("min_doc_id") / range_width).cast("long"),
                (F.col("max_doc_id") / range_width).cast("long"),
            )
        ),
    )

    n_required = sum(1 for g in groups if g.required)
    eff_msm = min(msm, n_required) if n_required else 0

    # metadata-level gate pruning: ranges that cannot satisfy msm die before
    # any payload decode
    if eff_msm > 0:
        ok = (
            blocks.filter(F.col("required"))
            .groupBy("range_id")
            .agg(F.countDistinct("group_id").alias("ng"))
            .filter(F.col("ng") >= eff_msm)
            .select("range_id")
        )
        blocks = blocks.join(F.broadcast(ok), "range_id")

    group_meta = {g.group_id: (g.required, g.weight) for g in groups}
    has_doc_side = bool(
        options.lang or options.repo or options.path_prefix or options.lang_boosts
    )
    kernel = make_range_kernel(
        group_meta, eff_msm, k, range_width, truncate=not has_doc_side
    )
    per_doc = blocks.groupBy("range_id").applyInPandas(kernel, schema=PER_DOC_SCHEMA)
    return finalize_ranked(per_doc, eff_msm, k, index.docs, options)
