"""Positional phrase / ordered-proximity search over the positions sidecar.

Beyond-reference operator (the reference's ES queries are match/bool/prefix
only — MainAddressQueryBuilder.java builds no match_phrase): exact token
sequences ("public static void", "merge postings") and ordered windows
("merge ... postings within 3 tokens") are core code-search asks, so this
engine adds them, Spark-first:

- The index stores a ``positions`` table (builder.py, opt-in
  ``positions=True``): (term, doc_id, positions array<int>), partitioned by
  term_bucket and sorted by (term, doc_id) — a phrase's lookups prune to the
  same buckets/row groups as the postings path.
- Matching is pure Catalyst: the per-term position arrays pivot onto one row
  per doc (single hash aggregation), and the in-order chain test is a nested
  higher-order-function expression (``filter``/``exists``/
  ``array_contains``) — no UDF, whole-stage codegen end to end.
- Rank safety: the positional test only ever REMOVES docs from the
  candidate universe, and it is applied BEFORE any top-k cut. Scoring is
  the ordinary per-term BM25 sum over the surviving docs (the phrase's
  terms as required groups), so filters/boosts/pagination compose through
  the normal ranking tail.

100-TB shape: cost is driven by the RAREST phrase term — the pivot's input
is the pruned union of the phrase terms' position rows, the chain test is
per-doc local work, and the only shuffle is the one hash aggregation keyed
on doc_id. The sidecar's size is the standard positional-index overhead,
paid only by indexes built with ``positions=True``.
"""

from __future__ import annotations

import re
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gazetteer_search_spark.index.builder import Index, term_bucket_py

# quoted-phrase clause: "merge postings" or "merge postings"~2 (the Lucene
# query-string slop suffix). Unbalanced quotes never match — the raw string
# falls through to the ordinary analyzer, whose kernel strips the quote char.
_PHRASE_RE = re.compile(r'"([^"]*)"(?:~(\d+))?')

# a phrase slot: one index term, or a TUPLE of alternatives (the
# match_phrase_prefix expansion set — ANY of them satisfies the position)
Slot = "str | tuple[str, ...] | list[str]"


def _norm_slots(terms: list) -> list[list[str]]:
    return [[t] if isinstance(t, str) else list(t) for t in terms]


def parse_phrase_query(
    q: str,
) -> tuple[list[tuple[list[str], int, str | None]], str] | None:
    """Extract quoted-phrase clauses from a raw query string.

    Returns ``(phrases, residual)`` where ``phrases`` is a list of
    ``(analyzed_terms, slop, prefix)`` — one per non-empty quoted segment,
    tokenized with the index kernel minus the joined-identifier doubling
    (tail-offset tokens would demand a false adjacency) — and ``residual``
    is the query text outside the quotes, to analyze through the ordinary
    pipeline. ``prefix`` (the ES match_phrase_prefix form, quoted text
    ending ``*``: ``"merge post*"``) is the LAST analyzed sub-token, to be
    expanded against the term dictionary and appended as a final
    any-of-these slot; it is excluded from ``analyzed_terms``. Returns None
    when the string carries no quoted phrase (the caller keeps the
    ordinary ladder).
    """
    from gazetteer_search_spark.analyzer.tokenizer import tokenize_text

    phrases: list[tuple[list[str], int, str | None]] = []

    def _take(m: re.Match) -> str:
        body = m.group(1)
        prefix: str | None = None
        if body.rstrip().endswith("*"):
            toks = tokenize_text(
                body.rstrip().rstrip("*"), joined_identifiers=False
            )
            if toks:
                prefix = toks[-1]
                phrases.append((toks[:-1], int(m.group(2) or 0), prefix))
            return " "
        terms = tokenize_text(body, joined_identifiers=False)
        if terms:
            phrases.append((terms, int(m.group(2) or 0), None))
        return " "

    residual = _PHRASE_RE.sub(_take, q)
    if not phrases:
        return None
    return phrases, residual.strip()


def chain_count_expr(cols: list[Column], slop: int = 0) -> Column:
    """Number of start positions in ``cols[0]`` beginning an in-order chain
    through every following array.

    slop=0: exact phrase — term k must sit at start+k (``array_contains``
    chain). slop>0: ordered proximity — each next term within ``1+slop``
    positions after the previous match (nested ``exists``; lambda variables
    scope outward, so the chain is one codegen'd expression)."""
    if len(cols) == 1:
        return F.size(cols[0])

    if slop == 0:
        def cond(x: Column) -> Column:
            return reduce(
                lambda a, b: a & b,
                [F.array_contains(cols[k], x + k) for k in range(1, len(cols))],
            )
    else:
        def _chain_from(k: int, prev: Column) -> Column:
            nxt = lambda y: (  # noqa: E731 — readable nested HOF chain
                (y > prev)
                & (y <= prev + 1 + slop)
                & (_chain_from(k + 1, y) if k + 1 < len(cols) else F.lit(True))
            )
            return F.exists(cols[k], nxt)

        def cond(x: Column) -> Column:
            return _chain_from(1, x)

    return F.size(F.filter(cols[0], cond))


def positions_for_terms(
    spark: SparkSession, index: Index, terms: list[str]
) -> DataFrame:
    """Bucket- and term-pruned scan of the positions sidecar."""
    uniq = sorted(set(terms))
    buckets = sorted({term_bucket_py(t, index.n_buckets) for t in uniq})
    return spark.read.parquet(index.paths.positions).filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(uniq)
    )


def phrase_candidates(
    spark: SparkSession, index: Index, terms: list, slop: int = 0
) -> DataFrame:
    """Docs whose token stream contains ``terms`` in order (exact-adjacent at
    slop=0, within a ``1+slop`` step window otherwise) -> (doc_id,
    phrase_freq). One shuffle: the groupBy(doc_id) pivot of the pruned
    position rows; the chain test is per-row Catalyst.

    A slot may be a TUPLE of alternative terms (the match_phrase_prefix
    expansion set): its per-doc position array is the sorted union of the
    alternatives' arrays — ANY alternative satisfies that position, the ES
    ``match_phrase_prefix`` last-slot semantics."""
    if not terms:
        raise ValueError("phrase_candidates: empty phrase")
    if not index.meta.get("positions"):
        raise ValueError(
            "this index was built without the positions sidecar — rebuild "
            "with build_index(positions=True) to run phrase queries"
        )
    slots = _norm_slots(terms)
    if any(not sl for sl in slots):
        raise ValueError("phrase_candidates: empty expansion slot")
    uniq = list(dict.fromkeys(tuple(sl) for sl in slots))
    all_terms = sorted({t for sl in uniq for t in sl})
    pos = positions_for_terms(spark, index, all_terms)
    # conditional-aggregation pivot: one column per DISTINCT slot (repeated
    # phrase tokens reuse the same array), one hash agg keyed on doc_id.
    # Single-term slots take the row's array directly; multi-term slots
    # (prefix expansions) sort-merge their alternatives' arrays.
    aggs = []
    for i, sl in enumerate(uniq):
        if len(sl) == 1:
            aggs.append(
                F.first(
                    F.when(F.col("term") == F.lit(sl[0]), F.col("positions")),
                    ignorenulls=True,
                ).alias(f"_p{i}")
            )
        else:
            merged = F.array_sort(
                F.flatten(
                    F.collect_list(
                        F.when(
                            F.col("term").isin(list(sl)), F.col("positions")
                        )
                    )
                )
            )
            aggs.append(
                F.when(F.size(merged) > 0, merged).alias(f"_p{i}")
            )
    wide = pos.groupBy("doc_id").agg(*aggs)
    byslot = {sl: F.col(f"_p{i}") for i, sl in enumerate(uniq)}
    cols = [byslot[tuple(sl)] for sl in slots]
    present = reduce(lambda a, b: a & b, [c.isNotNull() for c in cols])
    return (
        wide.filter(present)
        .withColumn("phrase_freq", chain_count_expr(cols, slop))
        .filter(F.col("phrase_freq") > 0)
        .select("doc_id", "phrase_freq")
    )


# ---------------------------------------------------------------------------
# serving twin (Spark-free): pyarrow pruned reads + numpy chain
# ---------------------------------------------------------------------------

def _ranges_concat(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenation of [starts[i], starts[i]+counts[i]) ranges as one
    vectorized gather-index array (the r5 forms built a Python list of
    np.arange / slice objects per row — the measured hot spot of the
    positional verifies at 50k docs)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    reset = np.repeat(starts, counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    return reset + within


def local_phrase_ids(index: Index, terms: list, slop: int = 0) -> np.ndarray:
    """Sorted int64 doc ids matching the phrase — the serving tier's
    positional verify. slop=0 is fully vectorized: per phrase offset k the
    (doc, pos-k) pairs form a key set, and the phrase's start positions are
    the n-way ``np.intersect1d`` of those sets (docs first narrowed to the
    slots' intersection, so keys stay small). slop>0 walks the (few)
    intersection docs with a searchsorted window chain. A slot may be a
    tuple of alternative terms (match_phrase_prefix expansions) — its rows
    are the union of the alternatives' rows."""
    if not terms:
        raise ValueError("local_phrase_ids: empty phrase")
    if not index.meta.get("positions"):
        raise ValueError(
            "this index was built without the positions sidecar — rebuild "
            "with build_index(positions=True) to run phrase queries"
        )
    import pyarrow.dataset as ds_mod

    slots = _norm_slots(terms)
    if any(not sl for sl in slots):
        raise ValueError("local_phrase_ids: empty expansion slot")
    uniq = list(dict.fromkeys(tuple(sl) for sl in slots))
    all_terms = sorted({t for sl in uniq for t in sl})
    dset = ds_mod.dataset(index.paths.positions, partitioning="hive")
    buckets = sorted({term_bucket_py(t, index.n_buckets) for t in all_terms})
    tbl = dset.to_table(
        columns=["term", "doc_id", "positions"],
        filter=ds_mod.field("term_bucket").isin(buckets)
        & ds_mod.field("term").isin(all_terms),
    )
    terms_a = np.asarray(tbl["term"])
    ids_a = np.asarray(tbl["doc_id"], dtype=np.int64)
    pos_list = tbl["positions"]
    rows_by_slot: dict[tuple, np.ndarray] = {}
    for sl in uniq:
        rows_by_slot[sl] = np.flatnonzero(np.isin(terms_a, list(sl)))
        if rows_by_slot[sl].size == 0:
            return np.empty(0, dtype=np.int64)
    common = reduce(
        np.intersect1d,
        [np.unique(ids_a[rows_by_slot[sl]]) for sl in uniq],
    )
    if common.size == 0:
        return np.empty(0, dtype=np.int64)
    if len(slots) == 1:
        return common

    # per-slot (doc ordinal within `common`, positions) — flattened via the
    # arrow list offsets, no per-row python
    flat = pos_list.combine_chunks()
    offs = flat.offsets.to_numpy(zero_copy_only=False)
    vals = flat.values.to_numpy(zero_copy_only=False).astype(np.int64)

    def slot_pairs(sl: tuple, shift: int) -> np.ndarray:
        rows = rows_by_slot[sl]
        o = np.searchsorted(common, ids_a[rows])
        o = np.minimum(o, common.size - 1)
        keep = common[o] == ids_a[rows]
        rows, o = rows[keep], o[keep]
        counts = (offs[rows + 1] - offs[rows]).astype(np.int64)
        ords = np.repeat(o, counts)
        idx = _ranges_concat(offs[rows].astype(np.int64), counts)
        p = vals[idx] - shift
        ok = p >= 0
        return ords[ok], p[ok]

    if slop == 0:
        big = int(vals.max(initial=0)) + 2
        keysets = []
        for k, sl in enumerate(slots):
            ords, p = slot_pairs(tuple(sl), k)
            keysets.append(np.unique(ords * big + p))
        starts = reduce(np.intersect1d, keysets)
        if starts.size == 0:
            return np.empty(0, dtype=np.int64)
        return common[np.unique(starts // big)]

    # slop > 0: the window chain runs over ALL intersection docs at once on
    # (doc_ordinal * big + pos) keys — `big` exceeds max_pos + 1 + slop, so a
    # frontier position's [p+1, p+slop] window can never cross into another
    # doc's key range and the per-doc python loop of the r5 form collapses
    # into three vectorized passes per slot (sort, searchsorted, gather).
    big = int(vals.max(initial=0)) + 2 + int(slop)
    frontier = None
    for k, sl in enumerate(slots):
        ords, p = slot_pairs(tuple(sl), 0)
        keys = np.unique(ords.astype(np.int64) * big + p)
        if k == 0:
            frontier = keys
            continue
        if frontier.size == 0 or keys.size == 0:
            return np.empty(0, dtype=np.int64)
        lo = np.searchsorted(keys, frontier + 1, side="left")
        hi = np.searchsorted(keys, frontier + 1 + slop, side="right")
        frontier = np.unique(keys[_ranges_concat(lo, hi - lo)])
    if frontier is None or frontier.size == 0:
        return np.empty(0, dtype=np.int64)
    return common[np.unique(frontier // big)]


# ---------------------------------------------------------------------------
# unordered proximity (ES span_near in_order=false / intervals any_of)
# ---------------------------------------------------------------------------

def _min_window_covers(lists: list[np.ndarray], window: int) -> bool:
    """True when one position can be chosen from every list with
    max - min <= ``window`` — the classic smallest-range-over-k-sorted-lists
    sweep: merge all (pos, list_id) ascending, slide a two-pointer window
    keeping per-list coverage counts, and report the first full-coverage
    span within bound."""
    k = len(lists)
    if k == 1:
        return lists[0].size > 0
    if any(a.size == 0 for a in lists):
        return False
    pos = np.concatenate(lists)
    lid = np.concatenate(
        [np.full(a.size, i, dtype=np.int64) for i, a in enumerate(lists)]
    )
    order = np.argsort(pos, kind="stable")
    pos, lid = pos[order], lid[order]
    counts = np.zeros(k, dtype=np.int64)
    covered = 0
    lo = 0
    for hi in range(pos.size):
        c = lid[hi]
        if counts[c] == 0:
            covered += 1
        counts[c] += 1
        while covered == k:
            if pos[hi] - pos[lo] <= window:
                return True
            c0 = lid[lo]
            counts[c0] -= 1
            if counts[c0] == 0:
                covered -= 1
            lo += 1
    return False


def local_unordered_near_ids(
    index: Index, terms: list[str], window: int
) -> np.ndarray:
    """Sorted int64 doc ids where all DISTINCT ``terms`` co-occur within a
    ``window``-position span in ANY order (ES span_near in_order=false) —
    the serving tier's unordered-proximity verify. Same pruned pyarrow read
    as local_phrase_ids; the per-doc test is the k-list min-window sweep
    over the (few) docs already containing every term."""
    if not terms:
        raise ValueError("local_unordered_near_ids: empty term list")
    if not index.meta.get("positions"):
        raise ValueError(
            "this index was built without the positions sidecar — rebuild "
            "with build_index(positions=True) to run proximity queries"
        )
    import pyarrow.dataset as ds_mod

    uniq = list(dict.fromkeys(terms))
    dset = ds_mod.dataset(index.paths.positions, partitioning="hive")
    buckets = sorted({term_bucket_py(t, index.n_buckets) for t in uniq})
    tbl = dset.to_table(
        columns=["term", "doc_id", "positions"],
        filter=ds_mod.field("term_bucket").isin(buckets)
        & ds_mod.field("term").isin(uniq),
    )
    terms_a = np.asarray(tbl["term"])
    ids_a = np.asarray(tbl["doc_id"], dtype=np.int64)
    rows_by_term = {t: np.flatnonzero(terms_a == t) for t in uniq}
    if any(rows_by_term[t].size == 0 for t in uniq):
        return np.empty(0, dtype=np.int64)
    common = reduce(
        np.intersect1d, [np.unique(ids_a[rows_by_term[t]]) for t in uniq]
    )
    if common.size == 0:
        return np.empty(0, dtype=np.int64)
    if len(uniq) == 1:
        return common
    flat = tbl["positions"].combine_chunks()
    offs = flat.offsets.to_numpy(zero_copy_only=False)
    vals = flat.values.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(uniq) == 2:
        # fully vectorized 2-term fast path: the minimal |pa - pb| over
        # two position sets is always attained by an ADJACENT pair in
        # their merged sort — flatten both terms' (doc, pos, side) rows,
        # lexsort by (doc, pos), and scan adjacent pairs with different
        # sides in one vector comparison. No per-doc python.
        docs_parts, pos_parts, side_parts = [], [], []
        for side, t in enumerate(uniq):
            rows = rows_by_term[t]
            keep = np.isin(ids_a[rows], common)
            rows = rows[keep]
            counts = (offs[rows + 1] - offs[rows]).astype(np.int64)
            docs_parts.append(np.repeat(ids_a[rows], counts))
            pos_parts.append(
                vals[_ranges_concat(offs[rows].astype(np.int64), counts)]
            )
            side_parts.append(
                np.full(int(counts.sum()), side, dtype=np.int8)
            )
        d = np.concatenate(docs_parts)
        p = np.concatenate(pos_parts)
        s = np.concatenate(side_parts)
        order = np.lexsort((p, d))
        d, p, s = d[order], p[order], s[order]
        adj = (
            (d[1:] == d[:-1])
            & (s[1:] != s[:-1])
            & (p[1:] - p[:-1] <= window)
        )
        return np.unique(d[:-1][adj])
    # per term: positions grouped by doc ordinal within `common`
    per_term: list[dict[int, np.ndarray]] = []
    for t in uniq:
        rows = rows_by_term[t]
        o = np.searchsorted(common, ids_a[rows])
        o = np.minimum(o, common.size - 1)
        keep = common[o] == ids_a[rows]
        rows, o = rows[keep], o[keep]
        d: dict[int, np.ndarray] = {}
        for r, ordn in zip(rows, o):
            seg = vals[offs[r] : offs[r + 1]]
            d[ordn] = (
                np.sort(np.concatenate([d[ordn], seg]))
                if ordn in d
                else np.sort(seg)
            )
        per_term.append(d)
    out = [
        common[d]
        for d in range(common.size)
        if _min_window_covers(
            [pt.get(d, np.empty(0, dtype=np.int64)) for pt in per_term],
            window,
        )
    ]
    return np.asarray(sorted(out), dtype=np.int64)


def unordered_candidates(
    spark: SparkSession, index: Index, terms: list[str], window: int
) -> DataFrame:
    """Spark twin of local_unordered_near_ids -> (doc_id,). Candidates
    first narrow to docs containing EVERY distinct term (the
    phrase_candidates pivot — one hash agg), then the min-window test
    runs: for two terms a native ``exists x exists y: |x-y| <= window``
    Catalyst predicate; for k > 2 an Arrow-batched pandas UDF running the
    same k-list sweep — over the already-intersected candidate set, which
    is orders of magnitude smaller than any single posting list."""
    if not terms:
        raise ValueError("unordered_candidates: empty term list")
    if not index.meta.get("positions"):
        raise ValueError(
            "this index was built without the positions sidecar — rebuild "
            "with build_index(positions=True) to run proximity queries"
        )
    uniq = list(dict.fromkeys(terms))
    pos = positions_for_terms(spark, index, uniq)
    aggs = [
        F.array_sort(
            F.flatten(
                F.collect_list(
                    F.when(F.col("term") == F.lit(t), F.col("positions"))
                )
            )
        ).alias(f"_p{i}")
        for i, t in enumerate(uniq)
    ]
    wide = pos.groupBy("doc_id").agg(*aggs)
    cols = [F.col(f"_p{i}") for i in range(len(uniq))]
    present = reduce(lambda a, b: a & b, [F.size(c) > 0 for c in cols])
    wide = wide.filter(present)
    if len(uniq) == 1:
        return wide.select("doc_id")
    if len(uniq) == 2:
        hit = F.exists(
            cols[0],
            lambda a: F.exists(
                cols[1],
                lambda b: F.abs(a - b) <= F.lit(window),
            ),
        )
        return wide.filter(hit).select("doc_id")

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _covers(packed: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _min_window_covers(
                    [np.asarray(a, dtype=np.int64) for a in lists], window
                )
                for lists in packed
            ]
        )

    return wide.filter(_covers(F.array(*cols))).select("doc_id")


# ---------------------------------------------------------------------------
# span_first (ES span_first / Lucene SpanFirstQuery)
# ---------------------------------------------------------------------------

def span_first_candidates(
    spark: SparkSession, index: Index, term: str, end: int
) -> DataFrame:
    """Docs whose token stream contains ``term`` at a position < ``end``
    (ES span_first: the match must lie within the first ``end`` positions
    — titles/headers/leading-identifier matching). One pruned positions
    read + a native array predicate -> (doc_id,)."""
    if end < 1:
        raise ValueError(f"span_first: end must be >= 1, got {end}")
    if not index.meta.get("positions"):
        raise ValueError(
            "this index was built without the positions sidecar — rebuild "
            "with build_index(positions=True) to run span queries"
        )
    pos = positions_for_terms(spark, index, [term])
    hit = F.exists("positions", lambda p: p < F.lit(end))
    return pos.filter(hit).select("doc_id")


def local_span_first_ids(index: Index, term: str, end: int) -> np.ndarray:
    """Serving twin: sorted int64 doc ids with ``term`` before position
    ``end`` — positions arrays are per-doc ascending, so element 0 decides."""
    if end < 1:
        raise ValueError(f"local_span_first_ids: end must be >= 1, got {end}")
    if not index.meta.get("positions"):
        raise ValueError(
            "this index was built without the positions sidecar — rebuild "
            "with build_index(positions=True) to run span queries"
        )
    import pyarrow.dataset as ds_mod

    dset = ds_mod.dataset(index.paths.positions, partitioning="hive")
    b = term_bucket_py(term, index.n_buckets)
    tbl = dset.to_table(
        columns=["doc_id", "positions"],
        filter=(ds_mod.field("term_bucket") == b)
        & (ds_mod.field("term") == term),
    )
    if tbl.num_rows == 0:
        return np.empty(0, dtype=np.int64)
    flat = tbl["positions"].combine_chunks()
    offs = flat.offsets.to_numpy(zero_copy_only=False)
    vals = flat.values.to_numpy(zero_copy_only=False)
    if vals.size == 0:
        return np.empty(0, dtype=np.int64)
    ids = np.asarray(tbl["doc_id"], dtype=np.int64)
    nonempty = offs[1:] > offs[:-1]
    first = np.where(
        nonempty, vals[np.minimum(offs[:-1], vals.size - 1)], end
    )
    return np.unique(ids[nonempty & (first < end)])
