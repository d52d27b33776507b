"""Index-backed BM25 top-k query engine.

The native replacement for the reference's query assembly + ES execution
(/root/reference/src/main/java/me/osm/gazetteer/search/api/search/
MainAddressQueryBuilder.java:115-168 builds bool/match/prefix/dis_max trees;
ESCoalesce.java:30-68 runs the relaxation ladder; Lucene scores). Semantics
mapping (SURVEY §2.2):

- match (P2)                 postings join + per-doc BM25 sum
- bool must / should (P1)    required-group count gate + score sum
- minimum_should_match (P1)  ``matched_required >= msm``
- dis_max (P8)               per-(doc, group) max over the group's term
                             variants (synonyms, fuzzy & prefix expansions)
- prefix (P3)                term-dictionary range scan -> expansion group
- fuzzy<=1 (P15)             levenshtein join against the term dictionary
- constant_score/function_score (P9/P10)  native column arithmetic
- coalesce ladder (U1)       driver loop, early exit on first non-empty rung
- top-k (T1)                 orderBy(score desc, doc_id asc).limit(k); ranks
                             deterministic via 1e-9 score rounding before sort

Two interchangeable scorers feed the same gating/ranking tail:
``SearchEngine`` decodes compressed posting blocks (partition-pruned by
term_bucket + parquet min/max on term); ``oracle_topk`` recomputes scores from
the raw corpus with no index (the independent-oracle formulation, analog of
the reference's PostgreSQL twin src/test/resources/search/basic.sql). Tests
assert rank-identity between the two.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gazetteer_search_spark.analyzer.query_ir import Query, analyze_query
from gazetteer_search_spark.index.builder import Index, decode_postings, term_bucket_py
from gazetteer_search_spark.search import bm25

MAX_PREFIX_EXPANSIONS = 128
MAX_FUZZY_EXPANSIONS = 32
MAX_REGEX_EXPANSIONS = 128  # Lucene top_terms_N rewrite cap (wildcard/regexp)
# matched_mask is a 63-bit clause bitmask (bit 63 is the int64 sign bit: the
# Spark shiftleft would silently wrap and numpy's 1<<63 overflows) — group ids
# above this are invalid, and query analysis caps its clause count to fit
MAX_GROUP_ID = 62


@dataclass
class SearchOptions:
    """Analog of reference SearchOptions (api/search/SearchOptions.java:7-14):
    prefix / fuzzy / coalesce default on; k=20 (ESDefaultSearch.java:147)."""

    k: int = 20
    prefix: bool = True
    fuzzy: bool = True
    # ES ``fuzziness`` parameter: max edits per term for the fuzzy rung.
    # 1 (default, the reference's shape) = Damerau/OSA <= 1 via the native
    # decomposition (P15); 2 = unrestricted Damerau-Levenshtein <= 2 (the
    # Lucene max — distances computed dictionary-side, see expand_fuzzy);
    # 0 disables expansion even on the fuzzy rung; "auto" = the ES AUTO
    # ladder (term length < 3 -> 0, 3..5 -> 1, > 5 -> 2).
    fuzziness: int | str = 1
    coalesce: bool = True
    lang: str | None = None  # doc-type filter analog (SURVEY §1.4)
    repo: str | None = None  # refs/bbox filter analog (P12/P13)
    path_prefix: str | None = None
    # class-EXCLUSION filter — the ``no_poi`` analog (the reference's no_poi
    # request flag excludes the POI doc type outright,
    # SearchAPIAdapter.java:81-85): drop docs whose class (lang) is in this
    # set; NULL-class docs are kept (exclusion only removes known members)
    exclude_langs: tuple[str, ...] = ()
    # term-level must_not (ES bool.must_not over a match clause — the shape
    # the reference builds in BooleanPart.java:36-37,72-77 and wires for its
    # street_has_loc exclusion, MainAddressQueryBuilder.java:304-306): drop
    # docs containing ANY of these analyzed index terms. Contributes no
    # score and never relaxes through the ladder. Populated from the
    # Lucene-style ``-token`` query syntax (query_ir.extract_negations) or
    # set directly.
    exclude_terms: tuple[str, ...] = ()
    # negative boost (ES ``boosting`` query analog — must_not's softer
    # sibling): docs containing ANY of these analyzed index terms stay in
    # the result set but have their FINAL score multiplied by
    # ``demote_factor`` (0 < f < 1) BEFORE the k-cut, so demotion is
    # rank-safe under truncation. The demoting terms contribute no score
    # of their own and never relax through the ladder.
    demote_terms: tuple[str, ...] = ()
    demote_factor: float = 0.5
    # dis_max tie_breaker (ES dis_max / multi_match tie_breaker): a group's
    # score is max + tie_breaker * (sum of the other variants' contributions)
    # — 0.0 (default) is pure dis_max P8, 1.0 is bool-OR sum. Applied on the
    # Spark path and the serving decode-all path; a non-zero value gates off
    # the block-max pruned kernel (its per-group upper bounds certify the
    # MAX, so they would UNDERESTIMATE a tie-broken score — pruning on them
    # is rank-unsafe; same gating precedent as must_not/demote).
    tie_breaker: float = 0.0
    lang_boosts: dict[str, float] = field(default_factory=dict)  # base_score analog
    trim: bool = False  # P16 post-retrieval trim (ESDefaultSearch.java:281-313)
    # keyset pagination (T3/S4): resume strictly after this (score, doc_id)
    # cursor in the deterministic rank order — the search_after analog; under
    # a total order it is offset-free and stable at any depth
    after: tuple[float, int] | None = None
    # distinct-by-name (DistinctNameFilter.java:8-11): keep only each name
    # key's ordinal-0 doc (the persisted build-time by_name_agg_index analog,
    # docs.name_ordinal) — collapse duplicate-name hits inside the search
    distinct: bool = False
    # field collapsing (ES `collapse` param): keep each key value's BEST-
    # SCORING doc (rank key (round(score,9) desc, doc_id)) — the score-based
    # sibling of `distinct` (which keeps the build-time ordinal-0 doc
    # regardless of query). Applied BEFORE the keyset cursor, so the
    # collapsed ranking is a stable total order that search_after pages
    # through without repeats. Allowed keys: repo / path / lang. Gates off
    # the block-max pruned kernel (a collapsed page of k needs k distinct
    # keys — deeper than the kernel's k+ties truncation certifies).
    collapse: str | None = None
    # proximity re-sort (the lat/lon geo-distance sort analog,
    # ESCoalesce.java:49-51 setDistanceSort / SearchAPIAdapter lat+lon
    # params): secondary sort AFTER score by the number of leading '/'
    # path components shared with this path (capped at NEAR_SORT_DEPTH),
    # then doc_id — "closer in the tree" wins ties, exactly as closer on
    # the map wins ties in the reference. Incompatible with the keyset
    # cursor (the cursor is a (score, doc_id) key; the reference's
    # distance-sorted pages use offset paging too).
    near_path: str | None = None
    # ES ``terminate_after``: stop collecting after this many matching docs,
    # counted in docID (collection) order AFTER query-level must_not but
    # BEFORE doc-side metadata filters — the per-shard collection-order
    # semantics of ES's parameter (which documents the same rank
    # distortion). Deterministic; serving tier; forces the decode-all path
    # (early termination is inherently rank-unsafe, so the block-max pruned
    # kernel gates off exactly like must_not). The executor raises
    # ``last_terminated_early`` when the cut fired.
    terminate_after: int | None = None
    # ES ``timeout``: best-effort wall-clock budget (milliseconds) for the
    # serving tier. On expiry the executor stops decoding further
    # terms/intervals and ranks whatever accumulated — partial results with
    # ``timed_out`` raised, exactly ES's per-shard best-effort contract
    # (checked at block/interval granularity, so a single block decode may
    # overshoot the budget slightly). The budget applies to each coalesce-
    # ladder rung (each rung is its own search phase, like an ES shard
    # phase); the flag reported is the ANSWERING rung's.
    timeout_ms: float | None = None


@dataclass
class TermGroup:
    """One query token -> the set of index terms that can satisfy it
    (text + synonym/replacer variants + fuzzy/prefix expansions), scored
    dis_max within the group."""

    group_id: int
    terms: tuple[str, ...]
    required: bool
    weight: float = 1.0
    is_prefix: bool = False
    # Per-term boosts (same length as ``terms``) for cross-field groups
    # (P11 "name^5" analog, reference MainAddressQueryBuilder.java:459-464):
    # the effective weight of terms[i] is weight * term_weights[i]. None means
    # every term carries ``weight``.
    term_weights: tuple[float, ...] | None = None
    # clause name for matched_queries[]-style reporting (the reference names
    # its clauses "street"/"locality"/... and reads them per hit,
    # ResultsWrapper.java:10-151); defaults to "g<group_id>"
    name: str | None = None

    def __post_init__(self) -> None:
        if not (0 <= self.group_id <= MAX_GROUP_ID):
            raise ValueError(
                f"TermGroup.group_id must be in [0, {MAX_GROUP_ID}] — the "
                f"matched_mask clause bitmask has 63 usable bits; got "
                f"{self.group_id}. Cap the query's clause count (search_hits "
                f"does this automatically)."
            )

    def clause_name(self) -> str:
        return self.name or f"g{self.group_id}"

    def per_term_weights(self) -> dict[str, float]:
        """term -> effective weight, deduped keeping the max boost (a term
        reachable through two fields scores through the better one)."""
        tw = self.term_weights or (1.0,) * len(self.terms)
        out: dict[str, float] = {}
        for t, w in zip(self.terms, tw):
            eff = self.weight * w
            if t not in out or eff > out[t]:
                out[t] = eff
        return out


def resolve_fuzziness(fuzziness: int | str, term: str) -> int:
    """Effective max edits for one term. Ints clamp-validate to {0, 1, 2}
    (2 is the Lucene automaton ceiling ES inherits); "auto" is the ES AUTO
    ladder: terms shorter than 3 chars get 0 edits, 3-5 chars get 1,
    longer get 2."""
    if fuzziness == "auto":
        n = len(term)
        return 0 if n < 3 else (1 if n <= 5 else 2)
    if fuzziness in (0, 1, 2):
        return int(fuzziness)
    raise ValueError(
        f"fuzziness must be 0, 1, 2 or 'auto'; got {fuzziness!r}"
    )


def transpositions(term: str) -> set[str]:
    """All distinct strings one ADJACENT TRANSPOSITION away from ``term``
    (excluding term itself). OSA distance <= 1 == Levenshtein <= 1 OR
    membership here — the decomposition all three fuzzy implementations
    (Spark dictionary join, serving fastpath, DuckDB oracle via its native
    damerau_levenshtein) agree on."""
    return {
        term[:i] + term[i + 1] + term[i] + term[i + 2 :]
        for i in range(len(term) - 1)
        if term[i] != term[i + 1]
    }


GROUPS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("group_id", T.IntegerType(), False),
        T.StructField("required", T.BooleanType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ]
)


def _groups_df(spark: SparkSession, groups: list[TermGroup]) -> DataFrame:
    rows = [
        (t, g.group_id, g.required, w)
        for g in groups
        for t, w in g.per_term_weights().items()
    ]
    return spark.createDataFrame(rows, GROUPS_SCHEMA)


def topk_from_scored(
    scored: DataFrame,
    groups_df: DataFrame,
    n_required: int,
    msm: int,
    k: int,
    docs: DataFrame | None = None,
    options: SearchOptions | None = None,
    groups: list[TermGroup] | None = None,
    demote: tuple[DataFrame, float] | None = None,
) -> DataFrame:
    """Shared ranking tail: (term, doc_id, score) x groups -> gated, boosted,
    deterministic top-k. All native Catalyst expressions.

    ``demote``: (doc_ids DataFrame, factor) — ES ``boosting`` negative
    clause: member docs' summed score multiplies by the factor BEFORE the
    rank/limit (demotion after the cut would be rank-unsafe).

    Fast paths (fewer shuffles per query — this is the serving hot path):
    - term->group mapping as a projection (CASE chain) instead of a broadcast
      join, whenever no term belongs to two groups;
    - dis_max collapse: if every group has a single term, per-(doc,group) max
      is the identity, so one hash aggregation computes the whole per-doc
      score + required-match count (2 shuffles -> 1).
    """
    tb = float(getattr(options, "tie_breaker", 0.0) or 0.0) if options else 0.0
    mapped = None
    if groups is not None:
        term2groups: dict[str, list[tuple[TermGroup, float]]] = {}
        for g in groups:
            for t, w in g.per_term_weights().items():
                term2groups.setdefault(t, []).append((g, w))
        disjoint = all(len(gs) == 1 for gs in term2groups.values())
        if disjoint:
            gid_e, req_e, w_e = None, None, None
            for t, ((g, w),) in term2groups.items():
                c = F.col("term") == t
                gid_e = F.lit(g.group_id) if gid_e is None else F.when(c, g.group_id).otherwise(gid_e)
                req_e = F.lit(g.required) if req_e is None else F.when(c, g.required).otherwise(req_e)
                w_e = F.lit(float(w)) if w_e is None else F.when(c, float(w)).otherwise(w_e)
            mapped = scored.select(
                "doc_id", "score",
                gid_e.alias("group_id"), req_e.alias("required"), w_e.alias("weight"),
            )
            if all(len(set(g.terms)) == 1 for g in groups):
                # singleton groups: dis_max is identity -> single aggregation
                per_doc = mapped.groupBy("doc_id").agg(
                    F.sum(F.col("score") * F.col("weight")).alias("score"),
                    F.sum(F.when(F.col("required"), 1).otherwise(0)).alias(
                        "matched_required"
                    ),
                    F.sum(_group_bit()).alias("matched_mask"),
                )
                per_doc = _apply_demote(per_doc, demote)
                return finalize_ranked(per_doc, min(msm, n_required), k, docs, options)

    if mapped is None:
        mapped = scored.join(F.broadcast(groups_df), "term").select(
            "doc_id", "score", "group_id", "required", "weight"
        )
    # dis_max P8 with per-term weights: max over the group's (possibly
    # field-boosted) term contributions. Equivalent to max(score)*weight when
    # the weight is constant across the group's terms. With a non-zero
    # tie_breaker (ES dis_max/multi_match tie_breaker), the losing variants
    # contribute a fraction: gscore = max + tb * (sum - max) — tb=0 is pure
    # dis_max, tb=1 is bool-OR sum.
    if tb > 0.0:
        per_group = mapped.groupBy("doc_id", "group_id", "required").agg(
            (
                F.max(F.col("score") * F.col("weight"))
                + F.lit(tb)
                * (
                    F.sum(F.col("score") * F.col("weight"))
                    - F.max(F.col("score") * F.col("weight"))
                )
            ).alias("gscore")
        )
    else:
        per_group = mapped.groupBy("doc_id", "group_id", "required").agg(
            F.max(F.col("score") * F.col("weight")).alias("gscore")
        )
    per_doc = per_group.groupBy("doc_id").agg(
        F.sum("gscore").alias("score"),
        F.sum(F.when(F.col("required"), 1).otherwise(0)).alias("matched_required"),
        F.sum(_group_bit()).alias("matched_mask"),
    )
    per_doc = _apply_demote(per_doc, demote)
    return finalize_ranked(per_doc, min(msm, n_required), k, docs, options)


def _apply_demote(
    per_doc: DataFrame, demote: tuple[DataFrame, float] | None
) -> DataFrame:
    """Multiply member docs' summed score by the negative-boost factor —
    one doc_id-keyed left join (the demote set is a bucket-pruned ids-only
    postings read, same cost class as must_not's anti-join side)."""
    if demote is None:
        return per_doc
    ids_df, factor = demote
    return (
        per_doc.join(
            # distinct: a doc holding several demote terms must demote ONCE
            # (the join would otherwise duplicate its per_doc row)
            ids_df.select("doc_id").distinct().withColumn("_dem", F.lit(True)),
            "doc_id",
            "left",
        )
        .withColumn(
            "score",
            F.when(F.col("_dem"), F.col("score") * F.lit(float(factor)))
            .otherwise(F.col("score")),
        )
        .drop("_dem")
    )


def matched_clause_names(mask: int, groups: list[TermGroup]) -> list[str]:
    """Decode a per-hit matched_mask into clause names — the
    ``matched_queries[]`` array the reference's ResultsWrapper exposes."""
    return [g.clause_name() for g in groups if (mask >> g.group_id) & 1]


def _group_bit() -> F.Column:
    """2^group_id as a per-(doc,group) row contribution: summed per doc it is
    the matched-clause bitmask — the per-hit ``matched_queries[]`` analog
    (reference ResultsWrapper.java:10-151) that clause-level trim cuts on.
    Input rows are unique per (doc_id, group_id) in both call sites."""
    return F.expr("shiftleft(CAST(1 AS BIGINT), group_id)")


def _distinct_names(d: DataFrame) -> DataFrame:
    """``name_ordinal == 0`` — the DistinctNameFilter analog. The column is
    persisted at build (index/builder.py); indexes built before it existed
    can't serve distinct queries."""
    if "name_ordinal" not in d.columns:
        raise ValueError(
            "SearchOptions.distinct requires a docs table with the "
            "name_ordinal column — rebuild the index (builder >= 0.4)"
        )
    return d.filter(F.col("name_ordinal") == 0)


NEAR_SORT_DEPTH = 8


def path_proximity_col(path_col: F.Column, near: str) -> F.Column:
    """Number of leading '/'-separated components ``path_col`` shares with
    ``near``, compared over a fixed NEAR_SORT_DEPTH window (missing
    components compare equal to missing — an identical path scores the full
    depth) — pure Catalyst arithmetic, the haversine-distance column of the
    transliteration (SURVEY T2). The same cumulative-AND formula is
    mirrored in the DuckDB oracle (null-safe here == ''-padded split_part
    there for slash-free components)."""
    parts = F.split(path_col, "/")
    comps = near.split("/")
    prox = F.lit(0)
    ok = F.lit(True)
    for i in range(1, NEAR_SORT_DEPTH + 1):
        comp = comps[i - 1] if i <= len(comps) else None
        # try_element_at: NULL past the end (element_at throws under ANSI)
        ok = ok & F.try_element_at(parts, F.lit(i)).eqNullSafe(
            F.lit(comp).cast("string")
        )
        prox = prox + F.when(ok, F.lit(1)).otherwise(F.lit(0))
    return prox


def finalize_ranked(
    per_doc: DataFrame,
    msm: int,
    k: int,
    docs: DataFrame | None = None,
    options: SearchOptions | None = None,
) -> DataFrame:
    """Gate + doc filters + static boost + deterministic rank/limit over a
    (doc_id, score, matched_required) frame. Shared by the DataFrame scorer
    and the block-max WAND operator."""
    options = options or SearchOptions()
    if options.near_path is not None and options.after is not None:
        raise ValueError("near_path sort and the keyset cursor are exclusive")
    gated = per_doc.filter(F.col("matched_required") >= F.lit(msm))
    ta = getattr(options, "terminate_after", None) if options else None
    if ta:
        # ES terminate_after: keep the FIRST N matching docs in docID
        # (collection) order — after the msm gate and query-level must_not
        # (applied upstream), before doc-side metadata filters; identical
        # semantics to the serving tier's cut. Spark shape: TakeOrdered of
        # N ids + broadcast semi-join — never a full sort of the match set.
        cut = gated.select("doc_id").orderBy("doc_id").limit(int(ta))
        gated = gated.join(F.broadcast(cut), "doc_id", "left_semi")

    def _rank(df: DataFrame) -> DataFrame:
        df = df.withColumn("_s", F.round(F.col("score"), 9))
        if options.after is not None:
            a_s, a_d = options.after
            a_key = F.round(F.lit(float(a_s)), 9)
            df = df.filter(
                (F.col("_s") < a_key)
                | ((F.col("_s") == a_key) & (F.col("doc_id") > int(a_d)))
            )
        keys = [F.col("_s").desc()]
        drop = ["_s"]
        if options.near_path is not None and "_prox" in df.columns:
            keys.append(F.col("_prox").desc())
            drop.append("_prox")
        keys.append(F.col("doc_id").asc())
        return df.orderBy(*keys).limit(k).drop(*drop)

    doc_side = (
        options.lang or options.repo or options.path_prefix or options.lang_boosts
        or options.distinct or options.near_path or options.exclude_langs
        or getattr(options, "collapse", None)
    )
    if docs is None:
        return _rank(gated)

    if not doc_side:
        # rank FIRST, join docs metadata on the k winners only — at cluster
        # scale this turns a docs-table join of every match into a k-row
        # broadcast lookup (TakeOrderedAndProject then tiny join)
        topk = _rank(gated)
        return _rank(topk.join(docs.select("doc_id", "repo", "path", "lang"), "doc_id"))

    d = docs
    if options.lang:
        d = d.filter(F.col("lang") == options.lang)
    if options.exclude_langs:
        # exclusion keeps NULL-class docs (removes known members only)
        d = d.filter(
            (~F.col("lang").isin(list(options.exclude_langs)))
            | F.col("lang").isNull()
        )
    if options.repo:
        d = d.filter(F.col("repo") == options.repo)
    if options.path_prefix:
        d = d.filter(F.col("path").startswith(options.path_prefix))
    if options.distinct:
        d = _distinct_names(d)
    gated = gated.join(d.select("doc_id", "repo", "path", "lang"), "doc_id")
    if options.lang_boosts:
        boost = F.lit(1.0)
        for lg, w in options.lang_boosts.items():
            boost = F.when(F.col("lang") == lg, F.lit(float(w))).otherwise(boost)
        gated = gated.withColumn("score", F.col("score") * boost)
    coll = getattr(options, "collapse", None)
    if coll:
        if coll not in ("repo", "path", "lang"):
            raise ValueError(
                f"collapse: unknown key {coll!r} (allowed: repo, path, lang)"
            )
        from pyspark.sql import Window as _W

        # keep each key's best doc by the rank key; one window shuffle keyed
        # on the collapse column (null keys collapse together, like ES
        # missing-doc-values buckets)
        w = _W.partitionBy(F.col(coll)).orderBy(
            F.round(F.col("score"), 9).desc(), F.col("doc_id").asc()
        )
        gated = (
            gated.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    if options.near_path is not None:
        gated = gated.withColumn(
            "_prox", path_proximity_col(F.col("path"), options.near_path)
        )
    return _rank(gated)


FACET_SCHEMA = T.StructType(
    [
        T.StructField("facet", T.StringType(), False),
        T.StructField("value", T.StringType(), False),
        T.StructField("doc_count", T.LongType(), False),
    ]
)

TOP_HITS_SCHEMA = T.StructType(
    [
        T.StructField("value", T.StringType(), False),
        T.StructField("bucket_rank", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

CARDINALITY_SCHEMA = T.StructType(
    [
        T.StructField("value", T.StringType(), False),
        T.StructField("doc_count", T.LongType(), False),
        T.StructField("n_distinct", T.LongType(), False),
    ]
)

EXPLAIN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("group_id", T.IntegerType(), False),
        T.StructField("contrib", T.DoubleType(), False),
        T.StructField("weighted", T.DoubleType(), False),
    ]
)

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("matched_required", T.LongType(), False),
        T.StructField("matched_mask", T.LongType(), False),
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


class SearchEngine:
    def __init__(
        self,
        spark: SparkSession,
        index: Index,
        cache: bool = False,
        serving: bool = False,
        serving_max_docs: int = 5_000_000,
        lazy_payloads: bool = False,
        analyzer_rules=None,
    ):
        """``cache=True`` persists postings/docs/term_stats in executor memory
        (spill-to-disk) — the serving-mode analog of ES/Lucene keeping the
        index hot. At 100 TB you'd scope this to hot term_buckets; the option
        is per-engine so batch pipelines skip it.

        ``serving=True`` additionally enables the driver-side point-lookup
        executor (search/fastpath.py) when the docs table fits a serving node
        (<= serving_max_docs): queries answer in milliseconds from pruned
        parquet row groups with zero Spark jobs, rank-identical to the Spark
        path. Larger indexes keep the distributed path (at scale, serving
        shards by bucket and runs one LocalExecutor per shard)."""
        self.spark = spark
        self.index = index
        # analyzer symmetry gate (VERDICT r3 Missing #1): the engine analyzes
        # queries with the rule set THE INDEX WAS BUILT WITH, loaded from the
        # index itself; an explicitly passed rule set must hash-match the
        # index's recorded analyzer_hash or the query node is silently using
        # drifted synonyms/stops — raise instead.
        from gazetteer_search_spark.analyzer import config as _acfg

        persisted = _acfg.load_index_rules(index.paths.root)
        if analyzer_rules is not None:
            rules_set = _acfg.resolve_rules(analyzer_rules)
            want = index.meta.get("analyzer_hash")
            if want is not None and rules_set.content_hash() != want:
                raise ValueError(
                    "analyzer rules mismatch: the index records "
                    f"analyzer_hash={want[:12]}..., the engine was given a "
                    f"rule set hashing {rules_set.content_hash()[:12]}... — "
                    "query analysis would be asymmetric with the build"
                )
            self.rules = rules_set
        else:
            # pre-0.6 index (no persisted rules file) = built with the
            # defaults — exactly what DEFAULT_RULES is
            self.rules = persisted if persisted is not None else _acfg.DEFAULT_RULES
        self._local = None
        # spark=None is the Spark-FREE serving form (index from
        # load_index_local): no JVM on the node, every query must route
        # through the local executor, so the docs-fit gate is waived — at
        # that size the operator should have sharded (buckets=) anyway.
        if serving and (spark is None or index.n_docs <= serving_max_docs):
            try:
                from gazetteer_search_spark.search.fastpath import LocalExecutor

                self._local = LocalExecutor(index, lazy_payloads=lazy_payloads)
            except Exception:
                self._local = None  # non-local FS without pyarrow support etc.
        if cache:
            index.postings = index.postings.persist()
            index.docs = index.docs.persist()
            index.term_stats = index.term_stats.persist()
        # small at test scale; at cluster scale the term dictionary stays a
        # distributed table and these expansions are pruned range scans.
        # Field-qualified terms ("name:foo") are excluded: prefix/fuzzy
        # expansion operates on the content-token dictionary, never across
        # the field namespace. term_stats is None for a Spark-free serving
        # engine (load_index_local) — every query then routes via _local.
        self._term_stats = (
            index.term_stats.filter(~F.col("term").contains(":"))
            if index.term_stats is not None
            else None
        )

    # ---- expansions ---------------------------------------------------------
    def expand_prefix(self, prefix: str) -> list[str]:
        """Term-dictionary range scan (P3): sorted dict makes startswith a
        range predicate; cap expansions by df like Lucene's rewrite cap.
        A bare prefix expands in the content namespace only (never into
        ``field:term`` dictionary entries — serving-tier parity); a prefix
        containing ``:`` explicitly targets that field's namespace."""
        if self._local is not None:
            return self._local.expand_prefix(prefix)
        # bare prefix: the pre-filtered content-namespace dictionary;
        # 'field:' prefix: the full dictionary (field terms are excluded
        # from _term_stats at load)
        base = (
            self._term_stats if ":" not in prefix else self.index.term_stats
        )
        d = base.filter(F.col("term").startswith(prefix))
        rows = (
            d.orderBy(F.col("df").desc(), F.col("term"))
            .limit(MAX_PREFIX_EXPANSIONS)
            .select("term")
            .collect()
        )
        return [r.term for r in rows]

    def suggest(self, prefix: str, k: int = 10) -> list[tuple[str, int]]:
        """Autocomplete (ES completion-suggester analog, beyond reference):
        content-namespace dictionary terms starting with ``prefix``, ranked
        (df desc, term asc) with their doc frequencies. Serving path answers
        from the cached in-memory dictionary; the Spark path is a
        TakeOrdered over the pruned term_stats scan. Multi-generation
        engines sum per-generation df (Lucene df-with-deletes semantics —
        exact after compaction)."""
        if not prefix:
            raise ValueError("suggest: empty prefix")
        if self._local is not None:
            return self._local.suggest(prefix, k)
        rows = (
            self._term_stats.filter(F.col("term").startswith(prefix))
            .orderBy(F.col("df").desc(), F.col("term"))
            .limit(k)
            .select("term", "df")
            .collect()
        )
        return [(r.term, int(r.df)) for r in rows]

    def expand_fuzzy(self, term: str, max_edits: int = 1) -> list[str]:
        """Damerau edit-distance expansion against the term dictionary (P15;
        ES ``fuzziness`` — MainAddressQueryBuilder.java:291-293 sets 1).

        ``max_edits=1`` (default): OSA<=1 decomposes exactly as
        Levenshtein<=1 OR membership in the term's adjacent-transposition
        set — the transposition half is a GENERATED IN-list equality
        predicate (n-1 strings from the query term), not a per-row distance
        UDF, so the whole expansion stays one pruned dictionary scan with
        native predicates (a transposition counts ONE edit — plain
        Levenshtein would cost "teh"->"the" two and miss the most common
        typo class).

        ``max_edits=2`` (the Lucene automaton ceiling): unrestricted
        Damerau-Levenshtein <= 2 — the decomposition trick doesn't extend
        (the transposition neighborhood of radius 2 is O(n^2) strings
        composed with every 1-edit, no longer an IN-list), so the distance
        runs as an Arrow-batched pandas UDF over the length-banded
        dictionary slice: dictionary-shaped work computed WHERE THE
        DICTIONARY LIVES (exactly as Lucene intersects its automaton with
        the term dict per segment), only the df-ranked top survivors reach
        the driver. Unrestricted DL (not OSA) is the variant DuckDB's
        ``damerau_levenshtein`` implements, which keeps the oracle an exact
        independent recompute."""
        if max_edits <= 0:
            return []
        if self._local is not None:
            return self._local.expand_fuzzy(term, max_edits)
        n = len(term)
        if max_edits == 1:
            trans = transpositions(term)
            cond = F.levenshtein(F.col("term"), F.lit(term)) <= 1
            if trans:
                cond = cond | F.col("term").isin(sorted(trans))
            d = self._term_stats.filter(
                F.length("term").between(n - 1, n + 1)
            ).filter(cond)
        else:
            from gazetteer_search_spark.search.fastpath import (
                damerau_levenshtein,
            )

            @F.pandas_udf("boolean")
            def _within(col: pd.Series) -> pd.Series:
                return col.map(
                    lambda t: damerau_levenshtein(t, term, cap=2) <= 2
                )

            d = (
                self._term_stats.filter(
                    F.length("term").between(n - 2, n + 2)
                )
                .filter(~F.col("term").contains(":"))
                .filter(_within(F.col("term")))
            )
        rows = (
            d.orderBy(F.col("df").desc(), F.col("term"))
            .limit(MAX_FUZZY_EXPANSIONS)
            .select("term")
            .collect()
        )
        return [r.term for r in rows]

    def expand_regexp(self, regex_body: str) -> list[str]:
        """Regexp term expansion (ES ``regexp`` query analog, beyond
        reference): full, case-insensitive match of the pattern against the
        content-token dictionary, df-ranked and capped like Lucene's
        ``top_terms_N`` rewrite. One anchored pattern string
        (patterns.anchored_ci) drives the Spark ``rlike``, the serving
        executor's Python ``re`` and the DuckDB RE2 oracle identically; the
        pattern's leading literal run additionally prunes the dictionary
        scan to a range predicate (Lucene's commonPrefix extraction)."""
        from gazetteer_search_spark.search import patterns as _pat

        anchored = _pat.anchored_ci(regex_body)  # validates up front
        if self._local is not None:
            return self._local.expand_regexp(anchored, _pat.literal_prefix(regex_body))
        d = self._term_stats
        pre = _pat.literal_prefix(regex_body)
        if pre:
            d = d.filter(F.col("term").startswith(pre))
        rows = (
            d.filter(F.col("term").rlike(anchored))
            .orderBy(F.col("df").desc(), F.col("term"))
            .limit(MAX_REGEX_EXPANSIONS)
            .select("term")
            .collect()
        )
        return [r.term for r in rows]

    def expand_wildcard(self, glob: str) -> list[str]:
        """Wildcard (glob) term expansion (ES ``wildcard`` query analog):
        ``*``/``?`` translate to regex and share expand_regexp's machinery,
        cap and portability contract."""
        from gazetteer_search_spark.search import patterns as _pat

        return self.expand_regexp(_pat.wildcard_to_regex(glob))

    # ---- rung assembly (the ladder) ----------------------------------------
    def _build_groups(
        self, query: Query, options: SearchOptions, fuzzy: bool, with_prefix: bool
    ) -> tuple[list[TermGroup], int]:
        groups: list[TermGroup] = []
        gid = 0
        # cap clause count to the 63-bit matched_mask (leave one id for the
        # prefix group) — a degenerate 100-token query searches on its first
        # 61 tokens instead of corrupting the mask or crashing the kernels
        for tok in query.tokens[: MAX_GROUP_ID - 1]:
            terms = list(tok.all_forms())
            if fuzzy and not tok.optional and not tok.numbers_only:
                terms += self.expand_fuzzy(
                    tok.text, resolve_fuzziness(options.fuzziness, tok.text)
                )
            groups.append(
                TermGroup(
                    group_id=gid,
                    terms=tuple(dict.fromkeys(terms)),
                    required=not tok.optional,
                    # optional terms only boost, at reduced weight (the
                    # reference boosts optional shoulds at 0.5-ish weights)
                    weight=1.0 if not tok.optional else 0.5,
                    name=tok.text,
                )
            )
            gid += 1
        if with_prefix and query.prefix:
            exp = self.expand_prefix(query.prefix)
            if exp:
                groups.append(
                    TermGroup(
                        group_id=gid,
                        terms=tuple(exp),
                        required=True,
                        is_prefix=True,
                        name="prefix",
                    )
                )
        return groups, sum(1 for g in groups if g.required)

    # ---- scoring ------------------------------------------------------------
    def _excluded_ids(self, exclude_terms: tuple[str, ...]) -> DataFrame:
        """doc_ids matching ANY must_not term — the anti-join side. A
        bucket-pruned postings read, ids only: at scale this costs the same
        as scoring one extra OR group (a must_not on a stop-term-grade hot
        token is inherently a full-list read in any engine — ES pays the
        identical iteration inside Lucene's ReqExclScorer)."""
        return self._scored_for_terms(
            sorted(set(exclude_terms)), None
        ).select("doc_id")

    def _scored_for_terms(
        self, terms: list[str], options: SearchOptions | None = None
    ) -> DataFrame:
        buckets = sorted({term_bucket_py(t, self.index.n_buckets) for t in terms})
        pruned = self.index.postings.filter(
            F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
        )
        if (
            options is not None
            and options.lang
            and "attr_bits" in self.index.postings.columns
        ):
            # block-level attribute pruning: only the filter lang's blocks
            # (plus overflow) are decoded — wrong-lang docs would be dropped
            # by the downstream docs-join filter anyway, so skipping their
            # decode entirely is a pure win (VERDICT r3 weak #1)
            am = self.index.attr_filter_mask("lang", options.lang)
            if am is not None:
                mask, _aid = am
                # bit test only: mixed tail blocks' few wrong-lang postings
                # are removed by the downstream docs-join lang filter
                pruned = pruned.filter(
                    F.col("attr_bits").bitwiseAND(F.lit(mask)) != 0
                )
        if options is not None and (options.repo or options.path_prefix):
            # clustered layout: a repo/path filter is a docID interval —
            # skip out-of-range blocks before decode (pure win; the
            # downstream docs-join filter stays authoritative either way)
            rr = self.index.doc_range_for(options.repo, options.path_prefix)
            if rr is not None:
                pruned = pruned.filter(
                    (F.col("max_doc_id") >= rr[0])
                    & (F.col("min_doc_id") <= rr[1])
                )
        return decode_postings(pruned, ids_codec=self.index.ids_codec)

    def match_set(
        self,
        groups: list[TermGroup],
        msm: int,
        options: SearchOptions | None = None,
    ) -> DataFrame:
        """(doc_id, repo, path, lang) of EVERY matching doc — search_rung's
        gating (>= msm distinct REQUIRED clauses, then doc-side filters)
        without the top-k cut: the aggregation universe behind facets.
        One map-side-combined groupBy(doc_id) over the bucket-pruned
        postings decode, then one doc-keyed join; no collect, no limit —
        the distributed-agg shape (at cluster scale this is exactly the
        per-shard agg ES runs for aggregations)."""
        options = options or SearchOptions()
        d = self.index.docs
        if options.lang:
            d = d.filter(F.col("lang") == options.lang)
        if options.exclude_langs:
            d = d.filter(
                (~F.col("lang").isin(list(options.exclude_langs)))
                | F.col("lang").isNull()
            )
        if options.repo:
            d = d.filter(F.col("repo") == options.repo)
        if options.path_prefix:
            d = d.filter(F.col("path").startswith(options.path_prefix))
        if options.distinct:
            d = _distinct_names(d)
        d = d.select("doc_id", "repo", "path", "lang")
        terms = sorted({t for g in groups for t in g.terms})
        if not terms:
            m = d
        else:
            scored = self._scored_for_terms(terms, options)
            gdf = _groups_df(self.spark, groups)
            per_doc = (
                scored.join(F.broadcast(gdf), "term")
                .groupBy("doc_id")
                .agg(
                    F.countDistinct(
                        F.when(F.col("required"), F.col("group_id"))
                    ).alias("matched_required")
                )
            )
            m = per_doc.filter(
                F.col("matched_required") >= F.lit(msm)
            ).join(d, "doc_id").select("doc_id", "repo", "path", "lang")
        if options.exclude_terms:
            m = m.join(
                self._excluded_ids(options.exclude_terms), "doc_id", "left_anti"
            )
        return m

    def facets(
        self,
        groups: list[TermGroup],
        msm: int,
        options: SearchOptions | None = None,
        keys: tuple[str, ...] = ("lang",),
        size: int = 10,
        min_doc_count: int = 1,
    ) -> DataFrame:
        """ES aggregations-on-query analog: terms-agg buckets over the FULL
        match set (not the page), per facet key. Output (facet, value,
        doc_count); buckets per facet ordered (doc_count desc, value asc),
        nulls excluded, exactly the tag_stats/terms-agg contract scoped to
        the query. Spark shape: ONE pass — the match set's key columns
        explode into (facet, value) pairs, one hash aggregation, one
        windowed cut; serving engines answer from the numpy twin
        (fastpath.facet_rows)."""
        from pyspark.sql import Window as _W

        options = options or SearchOptions()
        if self._local is not None and self.spark is not None:
            rows = self._local.facet_rows(
                groups, msm, options, keys, size, min_doc_count
            )
            return self.spark.createDataFrame(rows, FACET_SCHEMA)
        m = self.match_set(groups, msm, options)
        pairs: list[F.Column] = []
        for k in keys:
            if k not in m.columns:
                raise ValueError(
                    f"unknown facet key {k!r}; available: "
                    f"{[c for c in m.columns if c != 'doc_id']}"
                )
            pairs += [F.lit(k), F.col(k).cast("string")]
        w = _W.partitionBy("facet").orderBy(
            F.col("doc_count").desc(), F.col("value").asc()
        )
        return (
            m.select(F.explode(F.create_map(*pairs)).alias("facet", "value"))
            .filter(F.col("value").isNotNull())
            .groupBy("facet", "value")
            .agg(F.count("*").alias("doc_count"))
            .filter(F.col("doc_count") >= F.lit(min_doc_count))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= F.lit(size))
            .drop("_rn")
        )

    def composite_buckets(
        self,
        groups: list[TermGroup],
        msm: int,
        options: SearchOptions | None = None,
        keys: tuple[str, ...] = ("lang",),
        size: int = 10,
        after: tuple[str, str] | None = None,
    ) -> DataFrame:
        """ES composite-agg analog: buckets over the full match set ordered
        by KEY (facet asc, value asc) — NOT by count — with deterministic
        ``after``-key paging over the ENTIRE bucket space. This is how ES
        pages aggregations past the terms-agg size ceiling: a (facet, value)
        cursor resumes strictly after the last bucket of the previous page,
        so any number of buckets streams out in fixed-size pages with no
        coordinator-side giant sort buffer. Output (facet, value, doc_count).

        Scale shape: one hash aggregation over the exploded key map (same
        single pass as ``facets``), then a key-range filter the aggregation's
        own partitioning serves — no window, no global re-sort beyond the
        k-bounded page TakeOrdered."""
        options = options or SearchOptions()
        if self._local is not None and self.spark is not None:
            rows = self._local.composite_rows(
                groups, msm, options, keys, size, after
            )
            return self.spark.createDataFrame(rows, FACET_SCHEMA)
        m = self.match_set(groups, msm, options)
        pairs: list[F.Column] = []
        for k in keys:
            if k not in m.columns:
                raise ValueError(
                    f"unknown facet key {k!r}; available: "
                    f"{[c for c in m.columns if c != 'doc_id']}"
                )
            pairs += [F.lit(k), F.col(k).cast("string")]
        b = (
            m.select(F.explode(F.create_map(*pairs)).alias("facet", "value"))
            .filter(F.col("value").isNotNull())
            .groupBy("facet", "value")
            .agg(F.count("*").alias("doc_count"))
        )
        if after is not None:
            af, av = after
            b = b.filter(
                (F.col("facet") > F.lit(af))
                | ((F.col("facet") == F.lit(af)) & (F.col("value") > F.lit(av)))
            )
        return b.orderBy("facet", "value").limit(size)

    def top_hits(
        self,
        groups: list[TermGroup],
        msm: int,
        options: SearchOptions | None = None,
        key: str = "lang",
        n: int = 3,
    ) -> DataFrame:
        """ES top_hits-inside-terms-agg analog: for EVERY bucket of ``key``
        in the full match set, the bucket's top-``n`` docs by the rank key
        (round(score,9) desc, doc_id) — "show me the best hits per language/
        repo", the drill-down ES attaches inside aggregation buckets.
        Output (value, bucket_rank, doc_id, score), ordered (value asc,
        bucket_rank asc). Null keys are excluded (no bucket).

        Scale shape: scored_matches (the uncut top-k pipeline — one
        bucket-pruned decode + one doc-keyed join) + ONE window partitioned
        by the bucket key; per-bucket state is the running top-n, never the
        full bucket. Serving nodes answer via the decode-all partials twin
        (fastpath.top_hits_rows) — corpus-shaped by nature, like every
        aggregation."""
        from pyspark.sql import Window as _W

        options = options or SearchOptions()
        if self._local is not None and self.spark is not None:
            rows = self._local.top_hits_rows(groups, msm, options, key, n)
            return self.spark.createDataFrame(rows, TOP_HITS_SCHEMA)
        if key not in ("repo", "path", "lang"):
            raise ValueError(
                f"top_hits: unknown key {key!r} (allowed: repo, path, lang)"
            )
        s = self.scored_matches(groups, msm, options)
        w = _W.partitionBy(key).orderBy(
            F.round(F.col("score"), 9).desc(), F.col("doc_id").asc()
        )
        return (
            s.filter(F.col(key).isNotNull())
            .withColumn("bucket_rank", F.row_number().over(w))
            .filter(F.col("bucket_rank") <= F.lit(n))
            .select(
                F.col(key).cast("string").alias("value"),
                F.col("bucket_rank").cast("long").alias("bucket_rank"),
                "doc_id",
                "score",
            )
            .orderBy("value", "bucket_rank")
        )

    def facet_cardinality(
        self,
        groups: list[TermGroup],
        msm: int,
        options: SearchOptions | None = None,
        key: str = "lang",
        metric: str = "repo",
        exact: bool = True,
    ) -> DataFrame:
        """ES terms-agg with a cardinality sub-agg: for every ``key`` bucket
        of the FULL match set, the bucket's doc count AND the number of
        distinct ``metric`` values inside it — "how many repos does each
        language's match set span", the bucket-diversity drill-down ES
        nests as ``aggs: {cardinality: {field}}``. Output (value,
        doc_count, n_distinct), value-ascending; null bucket keys excluded,
        null metric values don't count (both the ES contract).

        Scale shape: one hash aggregation over the match set. ``exact=True``
        is count(DISTINCT metric) — partials keyed by (bucket, metric);
        ``exact=False`` is the HLL++ sketch (approx_count_distinct) —
        constant per-bucket memory, mergeable partials, the 100-TB default
        exactly as in ES. Serving nodes answer from the numpy twin
        (fastpath.cardinality_rows), multi-generation via disjoint count
        sums + distinct-pair unions (segments.cardinality_rows)."""
        options = options or SearchOptions()
        if self._local is not None and self.spark is not None:
            rows = self._local.cardinality_rows(
                groups, msm, options, key, metric
            )
            return self.spark.createDataFrame(rows, CARDINALITY_SCHEMA)
        m = self.match_set(groups, msm, options)
        for c in (key, metric):
            if c not in m.columns:
                raise ValueError(
                    f"unknown column {c!r}; available: "
                    f"{[x for x in m.columns if x != 'doc_id']}"
                )
        agg = (
            F.count_distinct(F.col(metric))
            if exact
            else F.approx_count_distinct(metric)
        )
        return (
            m.filter(F.col(key).isNotNull())
            .groupBy(F.col(key).cast("string").alias("value"))
            .agg(
                F.count("*").alias("doc_count"),
                agg.cast("long").alias("n_distinct"),
            )
            .orderBy("value")
        )

    def facet_cardinality_rows(
        self,
        groups: list[TermGroup],
        msm: int,
        options: SearchOptions | None = None,
        key: str = "lang",
        metric: str = "repo",
    ) -> list[tuple]:
        """Rows-level per-bucket cardinality (the serving/HTTP surface)."""
        options = options or SearchOptions()
        if self._local is not None:
            return self._local.cardinality_rows(
                groups, msm, options, key, metric
            )
        return [
            (r.value, int(r.doc_count), int(r.n_distinct))
            for r in self.facet_cardinality(
                groups, msm, options, key, metric
            ).collect()
        ]

    def significant_terms(
        self,
        groups: list[TermGroup],
        msm: int,
        options: SearchOptions | None = None,
        size: int = 10,
        min_doc_count: int = 2,
        eager: bool = True,
    ) -> DataFrame:
        """ES significant_terms agg analog (beyond reference): content terms
        OVER-represented in the query's match set relative to the corpus.
        fg_count = match-set docs containing the term (one full postings
        decode semi-joined to the match set — corpus-shaped by nature, the
        same per-shard pass ES runs; map-side combine + the semi-join keep
        it one shuffle), bg_count = the dictionary's df (already persisted
        — no second corpus pass). Score is ES's JLH heuristic:
        (fg% - bg%) * (fg% / bg%), terms below min_doc_count or not
        actually over-represented dropped. Name-field postings
        (``field:term``) are excluded — significance is about content.
        Output (term, fg_count, bg_count, score), top ``size`` by
        (score desc, term)."""
        options = options or SearchOptions()
        # persist: fg_total's count and the fg semi-join share ONE match-set
        # computation instead of re-running the corpus-shaped gate twice
        m = self.match_set(groups, msm, options).select("doc_id").persist()
        fg_total = m.count()
        if fg_total == 0:
            m.unpersist()
            return self.spark.createDataFrame(
                [], "term string, fg_count long, bg_count long, score double"
            )
        decoded = decode_postings(
            self.index.postings.filter(~F.col("term").contains(":")),
            ids_codec=self.index.ids_codec,
        )
        fg = (
            decoded.join(m, "doc_id", "left_semi")
            .groupBy("term")
            .agg(F.count("*").alias("fg_count"))
        )
        bg = self.index.term_stats.filter(
            ~F.col("term").contains(":")
        ).select("term", F.col("df").alias("bg_count"))
        ft = float(fg_total)
        n = float(self.index.n_docs)
        fgp = F.col("fg_count") / F.lit(ft)
        bgp = F.col("bg_count") / F.lit(n)
        score = (fgp - bgp) * (fgp / bgp)
        plan = (
            fg.join(bg, "term")
            .filter(F.col("fg_count") >= F.lit(int(min_doc_count)))
            .filter(fgp > bgp)
            .select(
                "term", "fg_count", "bg_count",
                F.round(score, 6).alias("score"),
                F.round(score, 9).alias("_key"),
            )
            .orderBy(F.col("_key").desc(), F.col("term").asc())
            .limit(size)
            .drop("_key")
        )
        # the result is <= size rows — materialize it now (eager=True, the
        # default) so the persisted match set can be released; a lazily
        # returned plan pins the cached match set for the caller's lifetime
        # (a leak on a long-running server). eager=False hands back the raw
        # plan for plan-shape audits — the caller owns unpersisting ``m``
        # (match_set is deterministic, so a later unpersist is safe).
        if not eager:
            return plan
        rows = plan.collect()
        m.unpersist()
        return self.spark.createDataFrame(
            rows, "term string, fg_count long, bg_count long, score double"
        )

    def significant_text_rows(
        self,
        groups: list[TermGroup],
        msm: int,
        options: SearchOptions | None = None,
        sample_size: int = 50,
        size: int = 10,
        min_doc_count: int = 2,
    ) -> list[tuple]:
        """ES ``sampler`` + ``significant_text`` analog — the SERVING-shaped
        twin of :meth:`significant_terms`. That method decodes the full
        postings (a corpus-shaped pass, right for the Spark analytics tier);
        this one re-analyzes the STORED content of only the best
        ``sample_size`` hits — exactly the composition the ES docs
        prescribe (significant_text re-tokenizes _source per doc, so it is
        wrapped in a sampler agg to bound that work). fg df comes from the
        bounded sample, bg df from the persisted dictionary (no second
        corpus pass), and the score is the same JLH heuristic, so terms
        over-represented in a query's BEST matches surface in milliseconds
        on a Spark-free serving node. Requires a store_content index (the
        same contract as snippets and /mlt by doc_id — ``_doc_content``
        raises with the rebuild hint otherwise). Hits whose generation
        carries no stored content count toward the sample total but
        contribute no terms. Output rows: (term, fg_count, bg_count, score)
        ordered (score desc, term asc), top ``size``.

        Bounded by construction: ``sample_size`` point content reads, one
        dictionary df lookup per distinct sample term (<= sample docs x
        tokens/doc; the serving tier answers from the cached dict, the
        Spark tier from one bucket-pruned filter over term_stats)."""
        from dataclasses import replace as _replace

        from gazetteer_search_spark.analyzer.tokenizer import tokenize_text

        options = options or SearchOptions()
        hits = self.search_rung_rows(
            groups, msm, _replace(options, k=int(sample_size))
        )
        if not hits:
            return []
        content = self._doc_content([int(r.doc_id) for r in hits])
        ft = float(len(hits))
        fg: dict[str, int] = {}
        for r in hits:
            for t in set(tokenize_text(content.get(int(r.doc_id), ""))):
                fg[t] = fg.get(t, 0) + 1
        dfm = self._df_for_terms(sorted(fg))
        n = float(self.index.n_docs)
        scored: list[tuple[str, int, int, float]] = []
        for t, c in fg.items():
            if c < int(min_doc_count):
                continue
            bg = dfm.get(t, 0)
            if bg <= 0:
                continue
            fgp = c / ft
            bgp = bg / n
            if fgp <= bgp:
                continue
            scored.append((t, c, bg, (fgp - bgp) * (fgp / bgp)))
        scored.sort(key=lambda x: (-round(x[3], 9), x[0]))
        return [(t, c, bg, round(s, 6)) for t, c, bg, s in scored[:size]]

    def significant_meta_rows(
        self,
        groups: list[TermGroup],
        msm: int,
        options: SearchOptions | None = None,
        key: str = "lang",
        size: int = 10,
        min_doc_count: int = 2,
    ) -> list[tuple]:
        """ES ``significant_terms`` over a KEYWORD field (lang/repo/... —
        the docs-store metadata columns, vs :meth:`significant_terms`'
        content tokens): which values of ``key`` are OVER-represented in
        the query's match set relative to the corpus. Pure composition of
        machinery both tiers already have — fg = the match set's facet
        counts (one facet pass), fg_total = the exact match count, bg = the
        corpus-wide value counts (``tag_stats``' single-column pruned scan;
        base-generation contract, same as GET /stats) — scored with the
        same JLH heuristic and (score desc, value asc) cut as the term
        forms. Output rows: (value, fg_count, bg_count, score)."""
        options = options or SearchOptions()
        fg = {
            str(v): int(c)
            for _f, v, c in self.facet_rows(
                groups, msm, options, keys=(key,), size=1_000_000,
                min_doc_count=1,
            )
        }
        if not fg:
            return []
        ft = float(self.count_matches(groups, msm, options))
        bg = {
            str(b["value"]): int(b["doc_count"])
            for b in self.tag_stats(key, min_doc_count=1, size=1_000_000)
        }
        n = float(self.index.n_docs)
        scored: list[tuple[str, int, int, float]] = []
        for v, c in fg.items():
            if c < int(min_doc_count):
                continue
            b = bg.get(v, 0)
            if b <= 0:
                continue
            fgp = c / ft
            bgp = b / n
            if fgp <= bgp:
                continue
            scored.append((v, c, b, (fgp - bgp) * (fgp / bgp)))
        scored.sort(key=lambda x: (-round(x[3], 9), x[0]))
        return [(v, c, b, round(s, 6)) for v, c, b, s in scored[:size]]

    def count_matches(
        self,
        groups: list[TermGroup],
        msm: int,
        options: SearchOptions | None = None,
    ) -> int:
        """Exact match count (ES _count / track_total_hits=true analog;
        search pages report Lucene-style 'gte' totals — this is the exact
        form): the match-set size with zero ranking work. Serving: one
        numpy pass; Spark: match_set().count() — a count over the gated
        aggregate, no sort, no hydration beyond the filter columns."""
        options = options or SearchOptions()
        if self._local is not None:
            return self._local.match_count(groups, msm, options)
        return self.match_set(groups, msm, options).count()

    def scored_matches(
        self,
        groups: list[TermGroup],
        msm: int,
        options: SearchOptions | None = None,
    ) -> DataFrame:
        """EVERY match with its full BM25 score — the scroll/PIT export
        analog (ES scroll: the whole result set, not a page). Always the
        Spark formulation (an export is a batch job, not a serving call):
        the same per-group dis_max / per-doc sum the top-k path computes,
        gated + doc-filtered + boosted by finalize_ranked's rules, WITHOUT
        the rank/limit — callers sort by doc_id (keyset order) or write
        as-is. One extra column ``matched_mask`` for clause auditing."""
        options = options or SearchOptions()
        if self.spark is None:
            raise RuntimeError(
                "scored_matches is a batch export — it needs a SparkSession "
                "(serving nodes page with search_after instead)"
            )
        terms = sorted({t for g in groups for t in g.terms})
        if not terms:
            m = self.match_set(groups, msm, options)
            return m.select(
                "doc_id", F.lit(0.0).alias("score"),
                F.lit(0).cast("long").alias("matched_mask"),
                "repo", "path", "lang",
            )
        scored = self._scored_for_terms(terms, options)
        if options.exclude_terms:
            scored = scored.join(
                self._excluded_ids(options.exclude_terms), "doc_id", "left_anti"
            )
        gdf = _groups_df(self.spark, groups)
        _tb = float(getattr(options, "tie_breaker", 0.0) or 0.0)
        _w = F.col("score") * F.col("weight")
        per_group = (
            scored.join(F.broadcast(gdf), "term")
            .groupBy("doc_id", "group_id", "required")
            .agg(
                (
                    (F.max(_w) + F.lit(_tb) * (F.sum(_w) - F.max(_w)))
                    if _tb > 0.0
                    else F.max(_w)
                ).alias("gscore")
            )
        )
        per_doc = per_group.groupBy("doc_id").agg(
            F.sum("gscore").alias("score"),
            F.sum(F.when(F.col("required"), 1).otherwise(0)).alias(
                "matched_required"
            ),
            F.sum(_group_bit()).alias("matched_mask"),
        )
        gated = per_doc.filter(F.col("matched_required") >= F.lit(msm))
        d = self.index.docs
        if options.lang:
            d = d.filter(F.col("lang") == options.lang)
        if options.exclude_langs:
            d = d.filter(
                (~F.col("lang").isin(list(options.exclude_langs)))
                | F.col("lang").isNull()
            )
        if options.repo:
            d = d.filter(F.col("repo") == options.repo)
        if options.path_prefix:
            d = d.filter(F.col("path").startswith(options.path_prefix))
        if options.distinct:
            d = _distinct_names(d)
        out = gated.join(d.select("doc_id", "repo", "path", "lang"), "doc_id")
        if options.lang_boosts:
            boost = F.lit(1.0)
            for lg, w in options.lang_boosts.items():
                boost = F.when(F.col("lang") == lg, F.lit(float(w))).otherwise(boost)
            out = out.withColumn("score", F.col("score") * boost)
        if options.demote_terms:
            out = _apply_demote(
                out,
                (self._excluded_ids(options.demote_terms), options.demote_factor),
            )
        return out.select(
            "doc_id", "score", "matched_mask", "repo", "path", "lang"
        )

    def export_matches(
        self,
        groups: list[TermGroup],
        msm: int,
        out_path: str,
        options: SearchOptions | None = None,
        partition_by: str | None = None,
    ) -> int:
        """Write the full scored match set to parquet (the scroll-export
        sink). Rows land sorted by doc_id WITHIN each output partition
        (sortWithinPartitions — no global sort shuffle; doc_id order within
        files is what downstream merge-joins and resumable readers need).
        Returns the exported row count (from the written files, not a second
        query run)."""
        df = self.scored_matches(groups, msm, options)
        w = df.sortWithinPartitions("doc_id").write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(out_path)
        return self.spark.read.parquet(out_path).count()

    def facet_rows(
        self,
        groups: list[TermGroup],
        msm: int,
        options: SearchOptions | None = None,
        keys: tuple[str, ...] = ("lang",),
        size: int = 10,
        min_doc_count: int = 1,
    ) -> list[tuple]:
        """Rows-level facets (the serving/HTTP surface)."""
        options = options or SearchOptions()
        if self._local is not None:
            return self._local.facet_rows(
                groups, msm, options, keys, size, min_doc_count
            )
        return [
            (r.facet, r.value, int(r.doc_count))
            for r in self.facets(
                groups, msm, options, keys, size, min_doc_count
            ).collect()
        ]

    def composite_rows(
        self,
        groups: list[TermGroup],
        msm: int,
        options: SearchOptions | None = None,
        keys: tuple[str, ...] = ("lang",),
        size: int = 10,
        after: tuple[str, str] | None = None,
    ) -> list[tuple]:
        """Rows-level composite buckets (the serving/HTTP surface)."""
        options = options or SearchOptions()
        if self._local is not None:
            return self._local.composite_rows(
                groups, msm, options, keys, size, after
            )
        return [
            (r.facet, r.value, int(r.doc_count))
            for r in self.composite_buckets(
                groups, msm, options, keys, size, after
            ).collect()
        ]

    def top_hits_rows(
        self,
        groups: list[TermGroup],
        msm: int,
        options: SearchOptions | None = None,
        key: str = "lang",
        n: int = 3,
    ) -> list[tuple]:
        """Rows-level per-bucket top hits (the serving/HTTP surface)."""
        options = options or SearchOptions()
        if self._local is not None:
            return self._local.top_hits_rows(groups, msm, options, key, n)
        return [
            (r.value, int(r.bucket_rank), int(r.doc_id), float(r.score))
            for r in self.top_hits(groups, msm, options, key, n).collect()
        ]

    def _df_for_terms(self, terms: list[str]) -> dict[str, int]:
        """Document frequencies for a bounded, query-derived term list.
        Serving: the cached dictionary; Spark: a bucket-colocated filter over
        term_stats collecting <= |terms| rows (query-side, k-bounded)."""
        if self._local is not None:
            return self._local.df_for_terms(terms)
        rows = (
            self._term_stats.filter(F.col("term").isin(list(terms)))
            .select("term", "df")
            .collect()
        )
        return {r.term: int(r.df) for r in rows}

    def mlt_groups(
        self,
        text: str,
        max_terms: int = 25,
        min_doc_freq: int = 1,
        max_doc_freq: int | None = None,
    ) -> list[TermGroup]:
        """ES ``more_like_this`` term selection (beyond reference — the
        reference delegates MLT to ES): re-analyze the input text with the
        INDEX-side kernel (like ES re-analyzing ``_source`` with the field
        analyzer), rank its distinct terms by tf x BM25-idf against the
        index's own statistics, and keep the top ``max_terms``
        (max_query_terms analog; min_doc_freq/max_doc_freq gate rare/stop
        terms like their ES namesakes). Each selected term becomes its own
        clause — ``search_mlt`` gates on a minimum_should_match fraction."""
        import math as _math

        from gazetteer_search_spark.analyzer.tokenizer import tokenize_text

        tf: dict[str, int] = {}
        for t in tokenize_text(text):
            tf[t] = tf.get(t, 0) + 1
        dfm = self._df_for_terms(sorted(tf))
        n = self.index.n_docs
        ranked = []
        for t, f in tf.items():
            df = dfm.get(t, 0)
            if df < min_doc_freq or df <= 0:
                continue
            if max_doc_freq is not None and df > max_doc_freq:
                continue
            idf = _math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            ranked.append((f * idf, t))
        ranked.sort(key=lambda x: (-x[0], x[1]))
        cap = min(max_terms, MAX_GROUP_ID + 1)
        return [
            TermGroup(group_id=i, terms=(t,), required=True, name=t)
            for i, (_, t) in enumerate(ranked[:cap])
        ]

    def search_mlt(
        self,
        text: str,
        options: SearchOptions | None = None,
        max_terms: int = 25,
        msm_frac: float = 0.3,
        min_doc_freq: int = 1,
        max_doc_freq: int | None = None,
    ) -> DataFrame:
        """More-like-this search: top tf-idf terms of ``text`` as one clause
        each, minimum_should_match = ``msm_frac`` of the selected clause
        count (ES's \"30%\" default). The seed document itself is NOT
        excluded (ES keeps free-text \"like\" input too) — callers filter
        the seed id when they have one."""
        groups = self.mlt_groups(text, max_terms, min_doc_freq, max_doc_freq)
        if not groups:
            # no selectable term -> no results (ES MLT semantics; NOT a
            # match_all: an unanalyzable input must not return the corpus)
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        msm = max(1, int(msm_frac * len(groups)))
        return self.search_rung(groups, msm, options or SearchOptions())

    def analyze(self, text: str, prefix: bool = False) -> dict:
        """ES ``_analyze`` API analog: expose BOTH sides of the analysis
        chain for a given text, against THIS index's persisted rule set —
        the debugging surface for "why does/doesn't this query match".

        - ``index_tokens``: the document-side token stream (the exact terms
          the index stores for this text — tokenizer kernel only; variant
          expansion is query-side by design, SURVEY A13).
        - ``query_tokens``: the query-side IR (typed tokens with
          synonym/replacer variants, optional marking, removal pre-pass) —
          the same serialization the search envelope's parsed_query uses.

        Pure driver-side string work: no Spark job, no index IO beyond the
        already-loaded rules."""
        from gazetteer_search_spark.analyzer.query_ir import analyze_query
        from gazetteer_search_spark.analyzer.tokenizer import tokenize_text

        q = analyze_query(text, prefix=prefix, rule_set=self.rules)
        return {
            "text": text,
            "index_tokens": tokenize_text(text),
            "query_tokens": [
                {
                    "text": t.text,
                    "optional": t.optional,
                    "numbers": t.has_numbers,
                    "variants": list(t.variants),
                }
                for t in q.tokens
            ],
            "prefix": q.prefix,
            "removed": list(q.removed),
            "analyzer_hash": self.rules.content_hash(),
        }

    def validate_query(
        self, q: str | Query, options: SearchOptions | None = None
    ) -> dict:
        """ES ``GET _validate/query?explain=true`` analog: parse + plan the
        strict rung WITHOUT executing it. The reference fires its ES queries
        blind and leans on the coalesce ladder to recover from zero-hit
        plans (api/search/ESCoalesce.java); this surfaces the plan a query
        WOULD run — per-clause analyzed terms, requiredness/weight, document
        frequency, phrase/pattern/prefix expansions, msm, and an estimated
        postings cost (sum of clause dfs = upper bound on rows the strict
        rung touches) — so callers can see unsatisfiable or pathologically
        expensive queries before paying for them. Never raises: an
        unparseable query returns ``valid: False`` with the error, matching
        ES's 200-with-valid:false envelope. Driver-side only: dictionary
        lookups are k-bounded (serving: cached dict; Spark: a <=|terms|-row
        bucket-pruned term_stats filter)."""
        options = options or SearchOptions()
        try:
            return {"valid": True, **self._validate_plan(q, options)}
        except Exception as e:  # noqa: BLE001 — the ES envelope contract
            return {"valid": False, "error": f"{type(e).__name__}: {e}"}

    def _validate_plan(self, q: str | Query, options: SearchOptions) -> dict:
        """The plan body behind validate_query — mirrors _search_ladder's
        pre-processing (negations, quoted phrases, /regex/ + *glob*
        patterns, analysis, rung-1 group construction) step for step, so
        what it reports is exactly what search() would run first."""
        raw = q if isinstance(q, str) else "<Query IR>"
        excl = tuple(options.exclude_terms)
        if isinstance(q, str) and "-" in q and '"' not in q:
            from gazetteer_search_spark.analyzer.query_ir import (
                extract_negations,
            )

            residual, negs = extract_negations(q)
            if negs:
                excl = tuple(dict.fromkeys((*excl, *negs)))
                q = residual
        phrases: list[dict] = []
        phrase_terms: list[str] = []
        if isinstance(q, str) and '"' in q:
            from gazetteer_search_spark.search import phrase as _ph

            parsed = _ph.parse_phrase_query(q)
            if parsed is not None:
                for toks, slop, pfx in parsed[0]:
                    phrases.append(
                        {
                            "terms": list(toks),
                            "slop": int(slop),
                            **({"prefix": pfx} if pfx else {}),
                        }
                    )
                    phrase_terms.extend(toks)
                q = parsed[1]
        patterns: list[dict] = []
        if isinstance(q, str) and '"' not in q:
            from gazetteer_search_spark.search import patterns as _pat

            residual, clauses = _pat.extract_patterns(q)
            if clauses:
                q = residual
                for c in clauses:
                    exp = self.expand_regexp(c.regex)
                    patterns.append(
                        {
                            "pattern": c.raw,
                            "expanded_terms": len(exp),
                            "sample": list(exp[:5]),
                        }
                    )
        query = (
            analyze_query(q, prefix=options.prefix, rule_set=self.rules)
            if isinstance(q, str)
            else q
        )
        groups, msm = self._build_groups(
            query, options, fuzzy=False, with_prefix=True
        )
        all_terms = sorted(
            {t for g in groups for t in g.terms} | set(phrase_terms)
        )
        dfs = self._df_for_terms(all_terms) if all_terms else {}
        clauses_out = []
        for g in groups:
            clauses_out.append(
                {
                    "name": g.name or f"g{g.group_id}",
                    "required": bool(g.required),
                    "weight": float(g.weight),
                    "n_terms": len(g.terms),
                    "df": int(sum(dfs.get(t, 0) for t in g.terms)),
                    "sample": list(g.terms[:5]),
                }
            )
        for p in phrases:
            # a phrase can never match more docs than its rarest term
            p["df"] = int(
                min((dfs.get(t, 0) for t in p["terms"]), default=0)
            )
        cost = sum(c["df"] for c in clauses_out) + sum(
            dfs.get(t, 0) for t in phrase_terms
        )
        unsat = (
            any(c["required"] and c["df"] == 0 for c in clauses_out)
            or any(p["expanded_terms"] == 0 for p in patterns)
            or any(p["df"] == 0 for p in phrases)
        )
        return {
            "query": raw,
            "clauses": clauses_out,
            "msm": int(msm),
            "removed": list(getattr(query, "removed", ()) or ()),
            "must_not": list(excl),
            "phrases": phrases,
            "patterns": patterns,
            "estimated_postings": int(cost),
            "unsatisfiable": bool(unsat),
            # the ladder search() would relax through, statically described
            "rungs": [
                "strict: AND of required clauses + trailing-prefix group",
                "fuzzy: per-term OSA<=fuzziness dictionary expansion",
                "relaxed: minimum_should_match over the OR of clauses",
            ],
        }

    def spell_suggest(self, q: str, k: int = 3, max_df: int = 0) -> dict:
        """ES term-suggester / phrase-suggester "did you mean" analog
        (beyond reference): for each analyzed query token whose dictionary
        df is <= ``max_df`` (default 0 — out-of-vocabulary only), propose
        the top-``k`` OSA<=1 dictionary replacements ranked (df desc, term)
        — the exact expansion the fuzzy rung uses (P15), surfaced as
        suggestions instead of silently folded into matching. Returns
        ``{"tokens": [{token, df, suggestions: [{term, df}, ...]}, ...],
        "did_you_mean": str | None}`` — ``did_you_mean`` substitutes each
        correctable token's best suggestion into the analyzed token
        sequence (None when every token is in-vocabulary). Serving cost:
        dictionary-only (cached term stats), zero postings decode."""
        from gazetteer_search_spark.analyzer.tokenizer import tokenize_text

        toks = tokenize_text(q, joined_identifiers=False)
        if not toks:
            return {"tokens": [], "did_you_mean": None}
        dfs = self._df_for_terms(sorted(set(toks)))
        out_tokens: list[dict] = []
        repl: dict[str, str] = {}
        for t in dict.fromkeys(toks):
            df0 = int(dfs.get(t, 0))
            sugg: list[dict] = []
            if df0 <= max_df:
                cands = [c for c in self.expand_fuzzy(t) if c != t][:k]
                if cands:
                    cdfs = self._df_for_terms(sorted(cands))
                    sugg = [
                        {"term": c, "df": int(cdfs.get(c, 0))} for c in cands
                    ]
                    repl[t] = cands[0]
            out_tokens.append({"token": t, "df": df0, "suggestions": sugg})
        dym = " ".join(repl.get(t, t) for t in toks) if repl else None
        return {"tokens": out_tokens, "did_you_mean": dym}

    def phrase_suggest(
        self,
        q: str,
        k: int = 5,
        per_token: int = 3,
        collate: bool = False,
    ) -> list[tuple[str, float]]:
        """ES phrase-suggester analog ("did you mean" for the WHOLE query):
        rank whole-phrase rewrites, not per-token corrections.

        Per analyzed token: in-vocabulary tokens contribute only themselves;
        out-of-vocabulary tokens contribute their top-``per_token`` OSA<=1
        dictionary corrections (df desc, term asc — the exact spell_suggest
        /fuzzy-rung expansion), falling back to the raw token (df 0) when no
        correction exists. Whole-phrase candidates are the cartesian product
        of the per-token candidate lists (bounded: per_token^OOV_tokens),
        scored by a smoothed unigram language model over the term
        dictionary — sum of ln((df + 0.5) / (n_docs + 1)) — the ES
        phrase-suggester's stupid-backoff degenerate (its default
        ``laplace``-smoothed unigram when no shingle field exists).
        ``collate=True`` keeps only phrases whose every term is
        in-vocabulary (the ES collate-prune without the per-candidate
        query round-trip). Returns [(phrase, score)] ranked (score desc,
        phrase asc), top-``k``, EXCLUDING the identity rewrite. Serving
        cost: dictionary-only — zero postings decode."""
        import itertools
        import math as _math

        from gazetteer_search_spark.analyzer.tokenizer import tokenize_text

        toks = tokenize_text(q, joined_identifiers=False)
        if not toks:
            return []
        dfs = self._df_for_terms(sorted(set(toks)))
        cands_by_tok: dict[str, list[tuple[str, int]]] = {}
        for t in dict.fromkeys(toks):
            df0 = int(dfs.get(t, 0))
            if df0 > 0:
                cands_by_tok[t] = [(t, df0)]
                continue
            corr = [c for c in self.expand_fuzzy(t) if c != t][:per_token]
            if corr:
                cdfs = self._df_for_terms(sorted(corr))
                cands_by_tok[t] = [
                    (c, int(cdfs.get(c, 0))) for c in corr
                ]
            else:
                cands_by_tok[t] = [(t, 0)]
        n = float(self.index.n_docs)
        out: dict[str, float] = {}
        for combo in itertools.product(*[cands_by_tok[t] for t in toks]):
            phrase = " ".join(c for c, _ in combo)
            if phrase == " ".join(toks):
                continue
            if collate and any(df == 0 for _, df in combo):
                continue
            score = sum(
                _math.log((df + 0.5) / (n + 1.0)) for _, df in combo
            )
            prev = out.get(phrase)
            if prev is None or score > prev:
                out[phrase] = score
        ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(p, round(s, 6)) for p, s in ranked[:k]]

    def term_vectors(self, doc_id: int) -> list[tuple[str, int, int]]:
        """ES ``_termvectors`` analog (beyond reference — the reference
        delegates per-doc term stats to ES): (term, tf, df) for ONE stored
        document, sorted by term. The doc re-analyzes with the INDEX kernel
        from the stored-content sidecar (one partition-pruned point read,
        same as snippets), tf counts locally, df resolves from the term
        dictionary (serving: cached dict; Spark: pruned term_stats scan) —
        k-bounded everywhere, never a postings decode."""
        from gazetteer_search_spark.analyzer.tokenizer import tokenize_text

        content = self._doc_content([int(doc_id)])
        if int(doc_id) not in content:
            raise KeyError(
                f"term_vectors: doc {doc_id} has no stored content — "
                "build the index with store_content=True"
            )
        tf: dict[str, int] = {}
        for t in tokenize_text(content[int(doc_id)]):
            tf[t] = tf.get(t, 0) + 1
        dfm = self._df_for_terms(sorted(tf))
        return [(t, tf[t], int(dfm.get(t, 0))) for t in sorted(tf)]

    def explain_rung(
        self, groups: list[TermGroup], msm: int, options: SearchOptions | None = None
    ) -> DataFrame:
        """ES Explain-API analog (GET /_explain / ``explain=true``; beyond
        reference — the reference delegates scoring transparency to ES):
        per-term BM25 contributions for the rung's top-k page. One row per
        (winner doc, matched query term, clause): ``contrib`` is the raw
        per-term BM25, ``weighted`` multiplies in the clause's per-term
        weight; the hit's score is exactly sum over groups of
        max(weighted) (+doc-side boosts). Spark shape: top-k winners
        broadcast-joined back onto the bucket-pruned postings decode of the
        query's terms — never a second full search; serving shape: a block
        point-lookup (fastpath.explain_hits)."""
        options = options or SearchOptions()
        if self._local is not None and self.spark is not None:
            rows = self._local.explain_rung(groups, msm, options)
            return self.spark.createDataFrame(rows, EXPLAIN_SCHEMA)
        winners = self.search_rung(groups, msm, options).select("doc_id")
        terms = sorted({t for g in groups for t in g.terms})
        scored = self._scored_for_terms(terms, options)
        gdf = _groups_df(self.spark, groups)
        return (
            scored.join(F.broadcast(winners), "doc_id")
            .join(F.broadcast(gdf), "term")
            .select(
                "doc_id",
                "term",
                "group_id",
                F.round("score", 4).alias("contrib"),
                F.round(F.col("score") * F.col("weight"), 4).alias("weighted"),
            )
        )

    def explain_hits(
        self,
        ids: list[int],
        groups: list[TermGroup],
        options: SearchOptions | None = None,
    ) -> dict[int, list[dict]]:
        """Per-hit explanation dicts for specific winner docs (the response-
        envelope form behind ``explain=true``). k-bounded: serving engines
        answer from a block point-lookup; Spark-backed engines collect the
        k x |terms| join (same bound as the _doc_detail point read)."""
        if self._local is not None:
            rows = self._local.explain_hits(ids, groups)
        else:
            winners = self.spark.createDataFrame(
                [(int(i),) for i in ids], "doc_id long"
            )
            terms = sorted({t for g in groups for t in g.terms})
            gdf = _groups_df(self.spark, groups)
            rows = [
                (r.doc_id, r.term, r.group_id, r.contrib, r.weighted)
                for r in (
                    self._scored_for_terms(terms, options)
                    .join(F.broadcast(winners), "doc_id")
                    .join(F.broadcast(gdf), "term")
                    .select(
                        "doc_id",
                        "term",
                        "group_id",
                        F.round("score", 4).alias("contrib"),
                        F.round(F.col("score") * F.col("weight"), 4).alias(
                            "weighted"
                        ),
                    )
                    .collect()
                )
            ]
            rows.sort()
        out: dict[int, list[dict]] = {}
        for d, t, gid, c, wtd in rows:
            out.setdefault(int(d), []).append(
                {
                    "term": t,
                    "group": int(gid),
                    "contrib": float(c),
                    "weighted": float(wtd),
                }
            )
        return out

    # ---- rescore (ES rescore API analog; beyond reference) -------------------
    def rescore_rows(
        self,
        groups: list[TermGroup],
        msm: int,
        secondary: list[TermGroup],
        window_size: int = 100,
        query_weight: float = 1.0,
        rescore_weight: float = 1.0,
        options: SearchOptions | None = None,
    ) -> list:
        """Serving-side rescore: primary rung's top-``window_size`` page, then
        combined = query_weight x primary + rescore_weight x secondary for the
        window docs (secondary = sum over rescore clauses of max weighted
        BM25; docs the rescore query misses contribute 0 — ES score_mode
        ``total``). Re-ranked (round(combined,9) desc, doc_id), cut to k.
        The secondary pass is a block POINT-lookup (group_max_scores), so a
        rescore costs O(window) decode work, never a second full search."""
        from dataclasses import replace as _dc_replace

        options = options or SearchOptions()
        if options.k > window_size:
            raise ValueError(
                f"rescore: k={options.k} exceeds window_size={window_size} — "
                "hits beyond the window would keep unrescored order"
            )
        wopts = _dc_replace(options, k=window_size)
        rows = self._local.search_rung(groups, msm, wopts)
        sec = self._local.group_max_scores([r.doc_id for r in rows], secondary)
        rescored = [
            r._replace(
                score=query_weight * r.score
                + rescore_weight * sec.get(r.doc_id, 0.0)
            )
            for r in rows
        ]
        rescored.sort(key=lambda r: (-round(r.score, 9), r.doc_id))
        return rescored[: options.k]

    def rescore(
        self,
        groups: list[TermGroup],
        msm: int,
        secondary: list[TermGroup],
        window_size: int = 100,
        query_weight: float = 1.0,
        rescore_weight: float = 1.0,
        options: SearchOptions | None = None,
    ) -> DataFrame:
        """ES rescore-API analog: re-rank the top-``window_size`` window of
        the primary rung with a secondary query's contribution folded in —
        the standard shape is a cheap broad primary (bag of words) sharpened
        by an expensive secondary (phrase / proximity clauses) that only
        ever touches ``window_size`` docs. Spark shape: the window's doc_ids
        broadcast back onto the bucket-pruned postings scan of the secondary
        terms (the explain_rung join), one groupBy — no second corpus-wide
        search at any scale."""
        from dataclasses import replace as _dc_replace

        options = options or SearchOptions()
        if self._local is not None and self.spark is not None:
            rows = self.rescore_rows(
                groups, msm, secondary, window_size,
                query_weight, rescore_weight, options,
            )
            return self.spark.createDataFrame(rows, RESULT_SCHEMA)
        if options.k > window_size:
            raise ValueError(
                f"rescore: k={options.k} exceeds window_size={window_size} — "
                "hits beyond the window would keep unrescored order"
            )
        win = self.search_rung(groups, msm, _dc_replace(options, k=window_size))
        sec_terms = sorted({t for g in secondary for t in g.terms})
        sgdf = _groups_df(self.spark, secondary)
        sec = (
            self._scored_for_terms(sec_terms, options)
            .join(F.broadcast(win.select("doc_id")), "doc_id")
            .join(F.broadcast(sgdf), "term")
            .groupBy("doc_id", "group_id")
            .agg(F.max(F.col("score") * F.col("weight")).alias("gscore"))
            .groupBy("doc_id")
            .agg(F.sum("gscore").alias("sec"))
        )
        return (
            win.withColumnRenamed("score", "primary")
            .join(sec, "doc_id", "left")
            .withColumn(
                "score",
                F.lit(query_weight) * F.col("primary")
                + F.lit(rescore_weight) * F.coalesce(F.col("sec"), F.lit(0.0)),
            )
            .select(
                "doc_id", "score", "matched_required", "matched_mask",
                "repo", "path", "lang",
            )
            .orderBy(F.round("score", 9).desc(), F.col("doc_id").asc())
            .limit(options.k)
        )

    def search_rung(
        self, groups: list[TermGroup], msm: int, options: SearchOptions
    ) -> DataFrame:
        if self._local is not None:
            if self.spark is None:
                # raise BEFORE running the search — the full local search
                # would be wasted work with the error arriving late (ADVICE
                # r3)
                raise RuntimeError(
                    "DataFrame results need a SparkSession — on a Spark-free "
                    "serving engine use search_rung_rows/search_hits (the "
                    "rows-level serving surface)"
                )
            rows = self._local.search_rung(groups, msm, options)
            return self.spark.createDataFrame(rows, RESULT_SCHEMA)
        terms = sorted({t for g in groups for t in g.terms})
        if not terms:
            # match_all + filters (P14, empty-query path
            # ESDefaultSearch.java:111-114)
            d = self.index.docs
            if options.lang:
                d = d.filter(F.col("lang") == options.lang)
            if options.exclude_langs:
                d = d.filter(
                    (~F.col("lang").isin(list(options.exclude_langs)))
                    | F.col("lang").isNull()
                )
            if options.repo:
                d = d.filter(F.col("repo") == options.repo)
            if options.path_prefix:
                d = d.filter(F.col("path").startswith(options.path_prefix))
            if options.distinct:
                d = _distinct_names(d)
            if options.exclude_terms:
                d = d.join(
                    self._excluded_ids(options.exclude_terms), "doc_id", "left_anti"
                )
            if getattr(options, "collapse", None):
                coll = options.collapse
                if coll not in ("repo", "path", "lang"):
                    raise ValueError(
                        f"collapse: unknown key {coll!r} "
                        "(allowed: repo, path, lang)"
                    )
                from pyspark.sql import Window as _W

                # scores are constant — the per-key best is the lowest
                # doc_id; collapse BEFORE the cursor (stable total order)
                w = _W.partitionBy(F.col(coll)).orderBy(F.col("doc_id").asc())
                d = (
                    d.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn")
                )
            if options.after is not None:
                # match_all ranks by doc_id (scores are constant), so the
                # keyset cursor degenerates to doc_id > last
                d = d.filter(F.col("doc_id") > int(options.after[1]))
            return (
                d.select(
                    "doc_id",
                    F.lit(0.0).alias("score"),
                    F.lit(0).alias("matched_required"),
                    F.lit(0).cast("long").alias("matched_mask"),
                    "repo",
                    "path",
                    "lang",
                )
                .orderBy("doc_id")
                .limit(options.k)
            )
        scored = self._scored_for_terms(terms, options)
        if options.exclude_terms:
            # must_not: anti-join BEFORE grouping/top-k, so excluded docs
            # never occupy result slots (exclusion is not rank-safe after
            # the cut). One extra bucket-pruned postings read + one
            # anti-join shuffle keyed like the aggregation itself.
            scored = scored.join(
                self._excluded_ids(options.exclude_terms), "doc_id", "left_anti"
            )
        groups_df = _groups_df(self.spark, groups)
        n_required = sum(1 for g in groups if g.required)
        demote = None
        if options.demote_terms:
            # negative boost (ES boosting query): member ids read the same
            # way as must_not's exclusion side, applied multiplicatively
            # inside the ranking tail (before the k-cut)
            demote = (
                self._excluded_ids(options.demote_terms),
                options.demote_factor,
            )
        return topk_from_scored(
            scored, groups_df, n_required, msm, options.k, self.index.docs, options,
            groups=groups, demote=demote,
        )

    # ---- positional phrase / ordered proximity (beyond reference) -----------
    def search_phrase(
        self,
        q: str | list[str],
        options: SearchOptions | None = None,
        slop: int = 0,
    ) -> DataFrame:
        """Exact phrase (slop=0) or ordered-window proximity match with BM25
        ranking (search/phrase.py — needs an index built with
        ``positions=True``).

        The phrase text tokenizes with the INDEX kernel but WITHOUT the
        appended joined-identifier doubling (those tokens sit at tail
        offsets in the doc stream — a query-side copy would demand a false
        adjacency). The positional test shrinks the candidate universe
        BEFORE ranking, so doc-side filters, boosts, and the cursor compose
        exactly as in search_rung."""
        from gazetteer_search_spark.analyzer.tokenizer import tokenize_text
        from gazetteer_search_spark.search import phrase as _ph

        options = options or SearchOptions()
        terms = (
            tokenize_text(q, joined_identifiers=False)
            if isinstance(q, str)
            else list(q)
        )
        if not terms:
            raise ValueError("search_phrase: phrase analyzed to zero tokens")
        uniq = list(dict.fromkeys(terms))
        groups = [
            TermGroup(group_id=i, terms=(t,), required=True)
            for i, t in enumerate(uniq)
        ]
        if self._local is not None:
            if self.spark is None:
                raise RuntimeError(
                    "DataFrame results need a SparkSession — on a Spark-free "
                    "serving engine use search_phrase_rows"
                )
            rows = self.search_phrase_rows(terms, options, slop)
            return self.spark.createDataFrame(rows, RESULT_SCHEMA)
        cand = _ph.phrase_candidates(self.spark, self.index, terms, slop)
        scored = self._scored_for_terms(uniq, options).join(
            cand.select("doc_id"), "doc_id", "semi"
        )
        return topk_from_scored(
            scored,
            _groups_df(self.spark, groups),
            len(groups),
            len(groups),
            options.k,
            self.index.docs,
            options,
            groups=groups,
        )

    def search_phrase_rows(
        self,
        terms: list[str],
        options: SearchOptions | None = None,
        slop: int = 0,
    ) -> list:
        """Serving-tier phrase: positional verify via pyarrow pruned reads
        (local_phrase_ids), then the decode-all rung restricted to the
        verified id set (LocalExecutor.search_allowed) — rank-identical to
        the Spark path."""
        from gazetteer_search_spark.search import phrase as _ph

        options = options or SearchOptions()
        if self._local is None:
            raise RuntimeError("search_phrase_rows needs a serving engine")
        uniq = list(dict.fromkeys(terms))
        groups = [
            TermGroup(group_id=i, terms=(t,), required=True)
            for i, t in enumerate(uniq)
        ]
        # multi-generation engines verify EVERY generation's positions
        # sidecar (doc ids are globally unique) — base-only verification
        # would silently drop segment-resident phrase hits; same shape as
        # _phrase_rung's verify loop
        import numpy as np

        idxs = [s.index for s in getattr(self._local, "subs", [])] or [
            self.index
        ]
        allowed = np.unique(
            np.concatenate(
                [_ph.local_phrase_ids(ix, terms, slop) for ix in idxs]
            )
        )
        return self._local.search_allowed(groups, len(groups), options, allowed)

    _SORT_FIELDS = ("repo", "path", "lang", "doc_id")

    def search_sorted(
        self,
        groups: list[TermGroup],
        msm: int,
        options: SearchOptions | None = None,
        by: str = "path",
        ascending: bool = True,
        after: tuple | None = None,
    ) -> DataFrame:
        """ES sort-by-field + search_after (``sort: [{field: asc}]``): the
        match set ordered by a DOC FIELD instead of score, with keyset
        pagination on ``(field, doc_id)``.

        Spark shape: match_set (the same gated, doc-filtered universe the
        facet/aggregation paths use) -> keyset predicate -> orderBy +
        limit(k), which Spark executes as a TakeOrdered — a per-partition
        heap + driver merge of k rows, never a full sort of the match set
        (the exact doc-values sort ES runs per shard). The ``after``
        cursor is (last field value, last doc_id); doc_id ascending is the
        unconditional tiebreak, so pages are gap-and-dup-free under any
        field-value ties."""
        options = options or SearchOptions()
        if by not in self._SORT_FIELDS:
            raise ValueError(
                f"search_sorted: by must be one of {self._SORT_FIELDS}, "
                f"got {by!r}"
            )
        if self._local is not None:
            # serving path: doc-values sort over the cached docs arrays —
            # zero Spark jobs; identical rows to the match_set formulation
            rows = self._local.search_sorted_rows(
                groups, msm, options, by=by, ascending=ascending,
                after=after,
            )
            if self.spark is None:
                return rows
            return self.spark.createDataFrame(
                rows, "doc_id long, repo string, path string, lang string"
            )
        m = self.match_set(groups, msm, options)
        col = F.col(by)
        if after is not None:
            av, aid = after
            if ascending:
                pred = (col > F.lit(av)) | (
                    (col == F.lit(av)) & (F.col("doc_id") > F.lit(int(aid)))
                )
            else:
                pred = (col < F.lit(av)) | (
                    (col == F.lit(av)) & (F.col("doc_id") > F.lit(int(aid)))
                )
            m = m.filter(pred)
        order = [col.asc() if ascending else col.desc(), F.col("doc_id").asc()]
        return m.orderBy(*order).limit(options.k)

    def search_span_first(
        self,
        term: str,
        end: int,
        options: SearchOptions | None = None,
    ) -> DataFrame:
        """ES span_first analog: ``term`` must occur within the first
        ``end`` token positions (leading-identifier / title matching),
        BM25-ranked. Positional verify BEFORE ranking, both tiers."""
        import numpy as np

        from gazetteer_search_spark.search import phrase as _ph

        options = options or SearchOptions()
        groups = [TermGroup(group_id=0, terms=(term,), required=True)]
        if self._local is not None:
            idxs = [
                s.index for s in getattr(self._local, "subs", [])
            ] or [self.index]
            allowed = np.unique(
                np.concatenate(
                    [
                        _ph.local_span_first_ids(ix, term, end)
                        for ix in idxs
                    ]
                )
            )
            rows = self._local.search_allowed(groups, 1, options, allowed)
            if self.spark is None:
                return rows
            return self.spark.createDataFrame(rows, RESULT_SCHEMA)
        cand = _ph.span_first_candidates(self.spark, self.index, term, end)
        scored = self._scored_for_terms([term], options).join(
            cand, "doc_id", "semi"
        )
        return topk_from_scored(
            scored,
            _groups_df(self.spark, groups),
            1,
            1,
            options.k,
            self.index.docs,
            options,
            groups=groups,
        )

    def mine_hard_negatives(
        self,
        query_ids: list[int],
        k: int = 5,
        max_term_df: int | None = None,
    ) -> DataFrame:
        """Index-backed hard-negative mining (the operators/negatives.py
        pipeline op, answered from the PERSISTED index instead of
        re-scoring the corpus): query docs' terms come from the stored
        content (point reads), their scored postings from the index's own
        bucket-pruned (term, doc_id, score) decode — repeated mining runs
        never re-tokenize or re-aggregate the corpus. Rank-identical to
        the standalone operator on the same corpus (same kernel, same
        BM25 stats — pinned by test). Output: (query_id, doc_id, score,
        rank)."""
        from pyspark.sql.window import Window

        from gazetteer_search_spark.analyzer.tokenizer import tokenize_text

        if self.spark is None:
            raise RuntimeError(
                "mine_hard_negatives is a batch job — it needs a "
                "SparkSession"
            )
        content = self._doc_content([int(i) for i in query_ids])
        missing = [i for i in query_ids if int(i) not in content]
        if missing:
            raise KeyError(
                f"mine_hard_negatives: docs without stored content "
                f"{missing} — build the index with store_content=True"
            )
        import hashlib as _hl

        qterm_rows = []
        qsha = {}
        for qid in query_ids:
            text = content[int(qid)]
            qsha[int(qid)] = _hl.sha256(text.encode()).hexdigest()
            for t in dict.fromkeys(tokenize_text(text)):
                qterm_rows.append((int(qid), t))
        qterms = self.spark.createDataFrame(
            qterm_rows, "query_id long, term string"
        )
        if max_term_df is not None:
            dfs = self._df_for_terms(
                sorted({t for _, t in qterm_rows})
            )
            hot = [t for t, d in dfs.items() if d > max_term_df]
            if hot:
                qterms = qterms.filter(~F.col("term").isin(hot))
        terms = sorted(
            {r[1] for r in qterm_rows}
        )
        scored = self._scored_for_terms(terms, SearchOptions())
        pairs = (
            F.broadcast(qterms)
            .join(scored, "term")
            .filter(F.col("doc_id") != F.col("query_id"))
            .groupBy("query_id", "doc_id")
            .agg(F.sum("score").alias("score"))
        )
        # exact-duplicate exclusion via the persisted content_sha256
        sha_lit = [
            (qid, s) for qid, s in qsha.items()
        ]
        qsha_df = self.spark.createDataFrame(
            sha_lit, "query_id long, qsha string"
        )
        dup = (
            self.index.docs.select("doc_id", "content_sha256")
            .join(
                F.broadcast(qsha_df),
                F.col("content_sha256") == F.col("qsha"),
            )
            .filter(F.col("doc_id") != F.col("query_id"))
            .select("query_id", "doc_id")
        )
        pairs = pairs.join(dup, ["query_id", "doc_id"], "left_anti")
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

    def search_near_unordered(
        self,
        q: str | list[str],
        window: int,
        options: SearchOptions | None = None,
    ) -> DataFrame:
        """Unordered proximity (ES span_near ``in_order=false``): all query
        terms co-occur within a ``window``-position span in ANY order, BM25
        ranked. Needs the positions sidecar, like search_phrase. The
        positional verify shrinks candidates BEFORE ranking, so filters /
        boosts / cursor compose exactly as in search_rung."""
        from gazetteer_search_spark.analyzer.tokenizer import tokenize_text
        from gazetteer_search_spark.search import phrase as _ph

        options = options or SearchOptions()
        terms = (
            tokenize_text(q, joined_identifiers=False)
            if isinstance(q, str)
            else list(q)
        )
        if not terms:
            raise ValueError(
                "search_near_unordered: query analyzed to zero tokens"
            )
        uniq = list(dict.fromkeys(terms))
        groups = [
            TermGroup(group_id=i, terms=(t,), required=True)
            for i, t in enumerate(uniq)
        ]
        if self._local is not None:
            if self.spark is None:
                raise RuntimeError(
                    "DataFrame results need a SparkSession — on a Spark-free "
                    "serving engine use search_near_unordered_rows"
                )
            rows = self.search_near_unordered_rows(terms, window, options)
            return self.spark.createDataFrame(rows, RESULT_SCHEMA)
        cand = _ph.unordered_candidates(
            self.spark, self.index, uniq, window
        )
        scored = self._scored_for_terms(uniq, options).join(
            cand, "doc_id", "semi"
        )
        return topk_from_scored(
            scored,
            _groups_df(self.spark, groups),
            len(groups),
            len(groups),
            options.k,
            self.index.docs,
            options,
            groups=groups,
        )

    def search_near_unordered_rows(
        self,
        terms: list[str],
        window: int,
        options: SearchOptions | None = None,
    ) -> list:
        """Serving-tier unordered proximity: min-window verify via pyarrow
        pruned reads across every generation (doc ids are globally unique,
        so the union of per-generation verified sets is exact), then the
        rank restricted to the verified ids — rank-identical to Spark."""
        import numpy as np

        from gazetteer_search_spark.search import phrase as _ph

        options = options or SearchOptions()
        if self._local is None:
            raise RuntimeError(
                "search_near_unordered_rows needs a serving engine"
            )
        uniq = list(dict.fromkeys(terms))
        groups = [
            TermGroup(group_id=i, terms=(t,), required=True)
            for i, t in enumerate(uniq)
        ]
        idxs = [
            s.index for s in getattr(self._local, "subs", [])
        ] or [self.index]
        allowed = np.unique(
            np.concatenate(
                [
                    _ph.local_unordered_near_ids(ix, uniq, window)
                    for ix in idxs
                ]
            )
        )
        return self._local.search_allowed(
            groups, len(groups), options, allowed
        )

    def _phrase_rung(
        self,
        original: str,
        phrases: list[tuple[list[str], int]],
        residual: str,
        options: SearchOptions,
    ) -> tuple[list, dict]:
        """Quoted-phrase query execution — the ladder's phrase form.

        A query containing ``"..."`` clauses (optionally ``~N`` sloppy, the
        Lucene query-string syntax) runs ONE strict rung: quoting is an
        exactness request, so there is no relaxation ladder, no prefix gate
        and no fuzzy expansion. Every quoted term becomes a required exact
        group; multi-token phrases additionally verify positionally
        (search/phrase.py) BEFORE ranking; text outside the quotes analyzes
        through the ordinary pipeline (variants/synonyms yes, fuzzy/prefix
        no) and joins the same rung. Filters, boosts, trim and pagination
        compose through the normal ranking tail.

        Multi-generation serving: each generation's positions sidecar is
        verified independently (doc ids are globally unique across
        generations) and the allowed union feeds MultiExecutor's exact
        interleave merge — a generation built without positions raises, and
        compaction restores the sidecar (segments.compact merges live
        position rows)."""
        import numpy as np
        from dataclasses import replace as _dc_replace

        from gazetteer_search_spark.analyzer.query_ir import QToken
        from gazetteer_search_spark.search import phrase as _ph

        phrase_terms = list(
            dict.fromkeys(t for terms, _, _pfx in phrases for t in terms)
        )
        groups = [
            TermGroup(group_id=i, terms=(t,), required=True, name=t)
            for i, t in enumerate(phrase_terms)
        ]
        qtokens = [QToken(text=t) for t in phrase_terms]
        # match_phrase_prefix slots ("merge post*"): the trailing token
        # expands against the term dictionary (df-ranked, Lucene
        # max_expansions-capped rewrite — expand_prefix) into ONE required
        # any-of-these group; zero expansions = unsatisfiable, the ES
        # behavior (an impossible last word must not degrade to the fixed
        # prefix terms alone)
        expansions_by_prefix: dict[str, list[str]] = {}
        unsatisfiable = False
        for _terms, _slop, pfx in phrases:
            if pfx is None or pfx in expansions_by_prefix:
                continue
            exp = [t for t in self.expand_prefix(pfx) if ":" not in t][:50]
            expansions_by_prefix[pfx] = exp
            if not exp:
                unsatisfiable = True
            else:
                groups.append(
                    TermGroup(
                        group_id=len(groups),
                        terms=tuple(exp),
                        required=True,
                        name=pfx + "*",
                    )
                )
                qtokens.append(QToken(text=pfx))
        removed: list[str] = []
        if residual:
            rq = analyze_query(residual, prefix=False, rule_set=self.rules)
            seen = set(phrase_terms)
            gid = len(groups)
            rgroups, _ = self._build_groups(
                rq, options, fuzzy=False, with_prefix=False
            )
            for g in rgroups:
                if g.name in seen:  # token already a phrase group
                    continue
                groups.append(_dc_replace(g, group_id=gid))
                gid += 1
            qtokens += [t for t in rq.tokens if t.text not in seen]
            removed = list(rq.removed)
        query = Query(original=original, tokens=qtokens, removed=removed)
        msm = sum(1 for g in groups if g.required)
        meta = {
            "query": query,
            "groups": groups,
            # msm must ride the meta: downstream consumers (facet_rows in
            # search_response) gate the match set with it — without it a
            # phrase query's facets would count the any-of-terms universe
            "msm": msm,
            "rung": 1,
            "trimmed": False,
            "phrases": [
                {
                    "terms": list(t),
                    "slop": s,
                    **({"prefix": pfx} if pfx is not None else {}),
                }
                for t, s, pfx in phrases
            ],
        }
        # single-slot "quoted" terms are exactness-only (presence == phrase);
        # only multi-slot phrases need the positional verify. A prefix
        # phrase appends its expansion set as a final any-of-these slot.
        verify = []
        for t, s_, pfx in phrases:
            slots: list = list(t)
            if pfx is not None:
                slots.append(tuple(expansions_by_prefix[pfx]))
            if len(slots) > 1:
                verify.append((slots, s_))

        if unsatisfiable:
            rows: list = []
            if options.trim:
                rows, meta["trimmed"] = self._trim_page(rows)
            return rows, meta
        if self._local is not None:
            if not verify:
                rows = self.search_rung_rows(groups, msm, options)
            else:
                idxs = [
                    s.index for s in getattr(self._local, "subs", [])
                ] or [self.index]
                allowed = None
                for slots, slop in verify:
                    try:
                        ids = np.unique(
                            np.concatenate(
                                [
                                    _ph.local_phrase_ids(ix, slots, slop)
                                    for ix in idxs
                                ]
                            )
                        )
                    except ValueError as e:
                        if len(idxs) > 1:
                            raise ValueError(
                                "phrase query over a multi-generation index "
                                "needs every generation built with the "
                                "positions sidecar — compact to restore it "
                                f"({e})"
                            ) from e
                        raise
                    allowed = (
                        ids
                        if allowed is None
                        else np.intersect1d(allowed, ids)
                    )
                    if allowed.size == 0:
                        break
                rows = (
                    []
                    if allowed.size == 0
                    else self._local.search_allowed(
                        groups, msm, options, allowed
                    )
                )
        else:
            cand = None
            for slots, slop in verify:
                c = _ph.phrase_candidates(
                    self.spark, self.index, slots, slop
                ).select("doc_id")
                cand = c if cand is None else cand.join(c, "doc_id", "semi")
            all_terms = sorted({t for g in groups for t in g.terms})
            scored = self._scored_for_terms(all_terms, options)
            if cand is not None:
                scored = scored.join(cand, "doc_id", "semi")
            rows = topk_from_scored(
                scored,
                _groups_df(self.spark, groups),
                msm,
                msm,
                options.k,
                self.index.docs,
                options,
                groups=groups,
            ).collect()
        if options.trim:
            rows, meta["trimmed"] = self._trim_page(rows)
        return rows, meta

    # ---- two-phase dimension lookup (J1) -------------------------------------
    def two_phase_plan(
        self, q: str | Query, dim: DataFrame, options: SearchOptions | None = None
    ) -> tuple[Query, SearchOptions]:
        """Phase 1 of the reference's class-dimension search
        (ESDefaultSearch.java:90-100,227-279; MainAddressQueryBuilder.java:
        209-228): match query tokens against a broadcast-size class dimension
        (exact term, or token-as-prefix of a dimension term for tokens of
        length >= 4, the poi-class-prefix.json behavior). Matched classes
        become a filter (single class) or boosts (several); matched tokens are
        demoted to optional so they stop gating the main match. Returns the
        rewritten (query, options) so tests can assert the demotion."""
        from dataclasses import replace as _replace

        options = options or SearchOptions()
        query = analyze_query(q, prefix=options.prefix, rule_set=self.rules) if isinstance(q, str) else q
        if not query.tokens:
            return query, options
        toks = self.spark.createDataFrame(
            [(t.text,) for t in query.tokens], "token string"
        )
        hits = (
            toks.join(
                F.broadcast(dim),
                (F.col("term") == F.col("token"))
                | (
                    F.col("term").startswith(F.col("token"))
                    & (F.length("token") >= 4)
                ),
            )
            .select("token", "class")
            .collect()
        )
        matched_tokens = {r.token for r in hits}
        classes = sorted({getattr(r, "class") for r in hits})
        new_tokens = [
            _replace(t, optional=True) if t.text in matched_tokens else t
            for t in query.tokens
        ]
        prefix = query.prefix if query.prefix not in matched_tokens else None
        query2 = Query(original=query.original, tokens=new_tokens, prefix=prefix)
        if len(classes) == 1:
            options2 = _replace(options, lang=classes[0])
        elif classes:
            options2 = _replace(
                options,
                lang_boosts={**options.lang_boosts, **{c: 1.5 for c in classes}},
            )
        else:
            options2 = options
        return query2, options2

    def search_two_phase(
        self, q: str | Query, dim: DataFrame, options: SearchOptions | None = None
    ) -> DataFrame:
        query2, options2 = self.two_phase_plan(q, dim, options)
        return self.search(query2, options2)

    def two_phase_plan_rows(
        self,
        q: str | Query,
        rows: list[tuple[str, str]],
        options: SearchOptions | None = None,
    ) -> tuple[Query, SearchOptions]:
        """Spark-FREE twin of :meth:`two_phase_plan` over an in-memory
        dimension row list — the serving-tier form (the class dimension is
        broadcast-size by definition; the reference loads it at process
        start, imp/poi_clases/*, and probes it per request). Same matching
        rule (exact term, or token-as-prefix for tokens >= 4 chars), same
        fold: one matched class -> filter, several -> boosts, matched
        tokens demoted to optional. Used by the HTTP route's classify=true
        (SearchAPIAdapter wiring ESDefaultSearch.java:90-100)."""
        from dataclasses import replace as _replace

        options = options or SearchOptions()
        query = (
            analyze_query(q, prefix=options.prefix, rule_set=self.rules)
            if isinstance(q, str)
            else q
        )
        if not query.tokens:
            return query, options
        matched_tokens: set[str] = set()
        classes: set[str] = set()
        for tok in query.tokens:
            for term, cls in rows:
                if term == tok.text or (
                    term.startswith(tok.text) and len(tok.text) >= 4
                ):
                    matched_tokens.add(tok.text)
                    classes.add(cls)
        new_tokens = [
            _replace(t, optional=True) if t.text in matched_tokens else t
            for t in query.tokens
        ]
        prefix = query.prefix if query.prefix not in matched_tokens else None
        query2 = Query(original=query.original, tokens=new_tokens, prefix=prefix)
        cl = sorted(classes)
        if len(cl) == 1:
            options2 = _replace(options, lang=cl[0])
        elif cl:
            options2 = _replace(
                options,
                lang_boosts={**options.lang_boosts, **{c: 1.5 for c in cl}},
            )
        else:
            options2 = options
        return query2, options2

    def search_hits(self, q: str | Query, options: SearchOptions | None = None) -> list:
        """The coalesce ladder (U1, ESCoalesce.java:30-68) returning finalized
        hit rows: strict AND -> AND-without-prefix-gate + fuzzy -> OR with
        minimum_should_match=2; first non-empty rung wins (its k<=20 rows are
        the answer). This is the SERVING surface: with the local executor
        active the whole ladder runs driver-side in milliseconds with zero
        Spark jobs; otherwise each rung is one Spark job, executed once."""
        rows, _meta = self._search_ladder(q, options)
        return rows

    def _counter_snapshot(self) -> dict[str, int]:
        """Cumulative serving-tier block counters summed across shards /
        generations (zeros on a Spark-only engine) — the profile API's
        before/after basis."""
        execs = []
        if self._local is not None:
            execs = list(getattr(self._local, "subs", [])) or [self._local]
        out = {"decoded": 0, "skipped": 0, "attr_gated": 0, "range_gated": 0}
        for e in execs:
            c = getattr(e, "counters", None)
            if c is None:
                continue
            out["decoded"] += c.decoded.value
            out["skipped"] += c.skipped.value
            out["attr_gated"] += c.attr_gated.value
            out["range_gated"] += c.range_gated.value
        return out

    def last_search_flags(self) -> dict:
        """ES-style budget flags for the LAST serving-tier search:
        ``timed_out`` (timeout_ms expired — partial results) and
        ``terminated_early`` (terminate_after cut the collection). Summed
        across shards/generations like _counter_snapshot; always False on a
        Spark-only engine (the budgets are serving-tier semantics)."""
        execs = []
        if self._local is not None:
            execs = list(getattr(self._local, "subs", [])) or [self._local]
        return {
            "timed_out": any(
                bool(getattr(getattr(e, "counters", None), "timed_out", False))
                for e in execs
            ),
            "terminated_early": any(
                bool(getattr(e, "last_terminated_early", False)) for e in execs
            ),
        }

    def search_response(
        self,
        q: str | Query,
        options: SearchOptions | None = None,
        mark: str | None = None,
        verbose: bool = False,
        snippet_lines: int = 0,
        explain: bool = False,
        facet_keys: tuple[str, ...] = (),
        facet_size: int = 10,
        track_total: bool = False,
        rescore_q: str | None = None,
        rescore_window: int = 100,
        rescore_weight: float = 1.0,
        profile: bool = False,
    ) -> dict:
        """Full response envelope — the ResultsWrapper parity surface
        (api/ResultsWrapper.java:10-151 exposes parsed query, total hits,
        trim flag, timings and per-hit matched_queries[]):

        - ``parsed_query``: the typed-token IR (QToken flags + variants +
          prefix + removed pre-pass set)
        - ``total_hits`` + ``total_relation``: "eq" when the page is not
          full (every candidate shown), "gte" when k filled it or trim cut
          it — the pruned paths never count dead candidates, exactly like
          Lucene's track_total_hits default
        - ``trimmed``: whether the P16 post-retrieval trim cut the page
        - ``matched_queries``: per-hit clause names decoded from the mask
        - ``answer_time_ms``: whole-ladder wall time
        - ``mark``: opaque client token echoed back verbatim (the reference's
          "mark" request header, ResultsWrapper.java:24,114-115)
        - ``verbose``: attach full doc detail (commit, content_sha256) to
          each hit — the verbose_address analog (SearchAPIAdapter
          VERBOSE_ADDRESS); one point lookup for the <= k winners
        - ``snippet_lines`` (> 0): attach per-hit ``snippets`` — best
          matching lines with <em>-marked terms (search/snippets.py; the
          ES-highlight analog) — one stored-content point lookup for the
          <= k winners; requires a store_content index
        - ``explain``: attach per-hit ``explanation`` — the per-term BM25
          contributions behind the score (explain_hits; ES Explain-API
          analog) — one postings block point-lookup for the <= k winners
        - ``facet_keys``: attach ``facets`` — terms-agg buckets over the
          FULL match set of the winning rung (facet_rows; the ES
          aggregations-on-query analog), per requested docs column
        - ``track_total``: replace the Lucene-style 'gte' page total with
          the EXACT match count of the winning rung (count_matches; the
          track_total_hits=true analog). Phrase rungs keep the page total
          (their positional verify isn't a plain term match set).
        """
        import time as _time

        options = options or SearchOptions()
        # profile=true (ES profile-API analog): snapshot the serving tier's
        # block counters around the whole ladder and report the deltas —
        # how many posting blocks the answer decoded vs skipped, and
        # whether attribute/range block pruning gated the filters
        prof0: dict[str, int] = {}
        if profile:
            prof0 = self._counter_snapshot()
        t0 = _time.perf_counter()
        rows, meta = self._search_ladder(q, options)
        rescored = False
        if (
            rescore_q
            and rows
            and meta.get("msm") is not None
            and meta.get("groups")
        ):
            # rescore_q=TEXT (ES rescore-API analog): re-rank the winning
            # rung's top-window with the secondary query folded in at
            # rescore_weight. The secondary analyzes through the ordinary
            # pipeline (variants yes, prefix/fuzzy no — rescore queries are
            # exact by convention). Phrase rungs skip rescore (their
            # positional gate is already the sharpener).
            rq = (
                analyze_query(rescore_q, prefix=False, rule_set=self.rules)
                if isinstance(rescore_q, str)
                else rescore_q
            )
            sec_groups, _sec_n = self._build_groups(
                rq, options, fuzzy=False, with_prefix=False
            )
            if sec_groups:
                win = min(max(rescore_window, options.k), 10_000)
                if self._local is not None:
                    rows = self.rescore_rows(
                        meta["groups"], meta["msm"], sec_groups, win,
                        1.0, rescore_weight, options,
                    )
                else:
                    rows = self.rescore(
                        meta["groups"], meta["msm"], sec_groups, win,
                        1.0, rescore_weight, options,
                    ).collect()
                rescored = True
        ms = round(1000 * (_time.perf_counter() - t0), 2)
        query: Query = meta["query"]
        groups: list[TermGroup] = meta["groups"]
        full_page = len(rows) >= options.k
        detail: dict[int, dict] = {}
        if verbose and rows:
            detail = self._doc_detail([r.doc_id for r in rows])
        snips: dict[int, list[dict]] = {}
        if snippet_lines and rows:
            # highlight terms = every positive content-field term the ladder
            # actually searched (post analysis/expansion; name-field keys and
            # must_not exclusions never reach groups' positive terms)
            hl_terms = {
                t for g in groups for t in g.terms if ":" not in t
            }
            snips = self.snippets_for(
                [r.doc_id for r in rows], hl_terms, n_lines=snippet_lines
            )
        expl: dict[int, list[dict]] = {}
        if explain and rows and groups:
            expl = self.explain_hits(
                [r.doc_id for r in rows], groups, options
            )
        facets: dict[str, list[dict]] = {}
        if facet_keys:
            fr = self.facet_rows(
                groups, meta.get("msm", 0), options,
                keys=tuple(facet_keys), size=facet_size,
            )
            for fk, v, c in fr:
                facets.setdefault(fk, []).append(
                    {"value": v, "doc_count": int(c)}
                )
            # empty facets still list the requested keys
            for fk in facet_keys:
                facets.setdefault(fk, [])
        exact_total: int | None = None
        if track_total and "msm" in meta:
            exact_total = self.count_matches(groups, meta["msm"], options)
        prof_delta: dict[str, int] = {}
        if profile:
            p1 = self._counter_snapshot()
            prof_delta = {k: p1[k] - prof0.get(k, 0) for k in p1}
        out = {
            "query": query.original,
            "parsed_query": {
                "tokens": [
                    {
                        "text": t.text,
                        "optional": t.optional,
                        "numbers": t.has_numbers,
                        "variants": list(t.variants),
                    }
                    for t in query.tokens
                ],
                "prefix": query.prefix,
                "removed": list(query.removed),
                # quoted-phrase clauses, when the query carried any
                # ("merge postings" / "merge postings"~2 syntax)
                **(
                    {"phrases": meta["phrases"]}
                    if meta.get("phrases")
                    else {}
                ),
                # /regex/ and glob pattern clauses, when the query carried any
                **(
                    {"patterns": meta["patterns"]}
                    if meta.get("patterns")
                    else {}
                ),
            },
            "rung": meta["rung"],
            "total_hits": exact_total if exact_total is not None else len(rows),
            "total_relation": (
                "eq"
                if exact_total is not None
                else ("gte" if (full_page or meta["trimmed"]) else "eq")
            ),
            "trimmed": meta["trimmed"],
            "answer_time_ms": ms,
            "hits": [
                {
                    "doc_id": r.doc_id,
                    "score": round(float(r.score), 4),
                    "repo": r.repo,
                    "path": r.path,
                    "lang": r.lang,
                    "matched_queries": matched_clause_names(r.matched_mask, groups),
                    **detail.get(r.doc_id, {}),
                    **(
                        {"snippets": snips[r.doc_id]}
                        if r.doc_id in snips
                        else {}
                    ),
                    **(
                        {"explanation": expl[r.doc_id]}
                        if r.doc_id in expl
                        else {}
                    ),
                }
                for r in rows
            ],
            **({"facets": facets} if facet_keys else {}),
            **({"profile": prof_delta} if profile else {}),
            **(
                {
                    "rescore": {
                        "query": rescore_q,
                        "window": min(max(rescore_window, options.k), 10_000),
                        "weight": rescore_weight,
                    }
                }
                if rescored
                else {}
            ),
        }
        if mark is not None:
            out["mark"] = mark
        if (
            self._local is not None
            and options is not None
            and (
                getattr(options, "timeout_ms", None)
                or getattr(options, "terminate_after", None)
            )
        ):
            # ES response flags — only present when the budget params were
            # requested AND a serving executor ran (the flags are serving-
            # tier state; the Spark tier applies the terminate_after cut in
            # finalize_ranked but its lazy plan can't report whether the
            # cut fired without an extra count job, so emitting a
            # hardcoded False there would be wrong exactly when it fired)
            out.update(self.last_search_flags())
        return out

    def tag_stats(
        self, key: str, min_doc_count: int = 1, size: int = 10
    ) -> list[dict]:
        """Histogram over an arbitrary docs metadata column — the generic
        tag-statistics agg (reference api/stats/TagStatisticsAPI.java:44-100:
        terms agg over any ``more_tags.*`` key with minDocCount/size).
        Buckets ordered (doc_count desc, value asc), nulls excluded, exactly
        the ES terms-agg contract. Runs as one single-column pruned parquet
        scan via pyarrow — works identically on Spark-backed and Spark-free
        serving engines (a 100-TB deployment would run the same agg as a
        Spark groupBy; ``operators.textstats.tag_statistics`` is that form)."""
        import pyarrow.compute as pc
        import pyarrow.dataset as ds_mod

        dset = ds_mod.dataset(self.index.paths.docs, partitioning="hive")
        if key not in dset.schema.names:
            raise ValueError(
                f"unknown docs column {key!r}; available: "
                f"{sorted(dset.schema.names)}"
            )
        vc = pc.value_counts(dset.to_table(columns=[key])[key])
        buckets = [
            {"value": v, "doc_count": int(c)}
            for v, c in zip(
                vc.field("values").to_pylist(), vc.field("counts").to_pylist()
            )
            if v is not None and int(c) >= min_doc_count
        ]
        buckets.sort(key=lambda b: (-b["doc_count"], str(b["value"])))
        return buckets[:size]

    def numeric_tag_stats(
        self, key: str, percentiles: tuple[float, ...] = (0.5, 0.95)
    ) -> dict:
        """ES stats + percentiles aggs over a NUMERIC docs column at the
        serving tier (the numeric sibling of :meth:`tag_stats` — same
        single-column pruned pyarrow scan, works identically on
        Spark-backed and Spark-free engines; the Spark groupBy form is
        ``operators.aggs.numeric_stats``). Percentiles use linear
        interpolation, matching the Spark twin's exact ``percentile``.
        NULLs drop (ES missing-value behavior)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.dataset as ds_mod

        dset = ds_mod.dataset(self.index.paths.docs, partitioning="hive")
        if key not in dset.schema.names:
            raise ValueError(
                f"unknown docs column {key!r}; available: "
                f"{sorted(dset.schema.names)}"
            )
        col = dset.to_table(columns=[key])[key]
        if not (
            pa.types.is_integer(col.type) or pa.types.is_floating(col.type)
        ):
            raise ValueError(
                f"column {key!r} is {col.type}, not numeric — use the "
                "terms form (no numeric=true) for string columns"
            )
        col = col.drop_null()
        n = len(col)
        if n == 0:
            return {"count": 0}
        out = {
            "count": n,
            "min": pc.min(col).as_py(),
            "max": pc.max(col).as_py(),
            "sum": pc.sum(col).as_py(),
            "mean": round(float(pc.mean(col).as_py()), 6),
        }
        qs = pc.quantile(col, q=list(percentiles)).to_pylist()
        for p, v in zip(percentiles, qs):
            out[f"p{p * 100:g}".replace(".", "_")] = round(float(v), 6)
        return out

    def _doc_point_filter(self, ds_mod, dset, ids: list[int]):
        """Point-read predicate for the docs table: doc_id row filter AND
        doc_part hive pruning, so k-id hydration reads a few row groups
        instead of consulting every partition's statistics. The partition
        formula has ONE owner — segments.doc_point_filter."""
        from gazetteer_search_spark.index.segments import doc_point_filter

        return doc_point_filter(
            ds_mod, dset, ids, getattr(self.index, "n_doc_parts", None)
        )

    def _open_docs_pruned(self, ds_mod, ids: list[int]):
        """Docs dataset limited to the requested ids' doc_part directories
        (segments.open_docs_pruned): hydration's file DISCOVERY scales with
        the <= k residues touched, not the full partition tree. None =
        provably no requested id present."""
        from gazetteer_search_spark.index.segments import open_docs_pruned

        return open_docs_pruned(
            ds_mod, self.index.paths.docs, ids,
            getattr(self.index, "n_doc_parts", None),
        )

    def _doc_content(self, ids: list[int]) -> dict[int, str]:
        """Stored content for specific winners (stored-fields / _source
        analog): partition-pruned point read of the docs table's content
        column, k rows. Requires an index built with ``store_content=True``;
        like ``_doc_detail``, a multi-generation engine reads the BASE
        generation's docs — segment-resident hits hydrate after their
        segment was built from a store_content base (the docs schema
        inherits) and omit content otherwise."""
        import pyarrow.dataset as ds_mod

        dset = self._open_docs_pruned(ds_mod, ids)
        if dset is None:
            # no residue dir exists for any requested id — but the
            # store_content contract must STILL surface (meta carries it),
            # or behavior would differ between ids in existing vs missing
            # partitions and the operator never learns to rebuild
            if not (self.index.meta or {}).get("stored_content"):
                raise ValueError(
                    "index has no stored content — rebuild with "
                    "store_content=True (build-index --store-content) to "
                    "serve snippets"
                )
            return {}
        if "content" not in dset.schema.names:
            raise ValueError(
                "index has no stored content — rebuild with "
                "store_content=True (build-index --store-content) to "
                "serve snippets"
            )
        tbl = dset.to_table(
            filter=self._doc_point_filter(ds_mod, dset, ids),
            columns=["doc_id", "content"],
        )
        return {
            int(d): c
            for d, c in zip(
                tbl["doc_id"].to_pylist(), tbl["content"].to_pylist()
            )
        }

    def get_docs(
        self,
        ids: list[int],
        include_content: bool = True,
        columns: list[str] | None = None,
    ) -> dict[int, dict]:
        """ES ``GET _doc`` / ``_mget`` analog: stored-fields point fetch of
        live documents across every generation (segments.fetch_docs — k
        partition-pruned pyarrow reads, Spark never involved, so Spark-free
        serving nodes answer identically). Absent keys are missing or
        tombstoned — the route's ``found: false``. ``columns`` = the ES
        _source_includes projection (scan-level, doc_id always kept)."""
        from gazetteer_search_spark.index.segments import fetch_docs

        return fetch_docs(
            self.index.paths.root, ids, include_content, columns=columns
        )

    def snippets_for(
        self,
        ids: list[int],
        terms: set[str],
        n_lines: int = 1,
        max_len: int = 400,
    ) -> dict[int, list[dict]]:
        """Best matching lines (with <em> term marking) per winner doc —
        the serving twin of search/snippets.snippet_df (semantics pinned
        there; equivalence pinned by tests/test_snippets.py)."""
        from gazetteer_search_spark.search.snippets import best_lines

        content = self._doc_content(ids)
        return {
            i: best_lines(content[i], terms, n_lines=n_lines, max_len=max_len)
            for i in ids
            if i in content
        }

    def _doc_detail(self, ids: list[int]) -> dict[int, dict]:
        """Full-detail columns for specific winners (verbose_address analog):
        partition-pruned point read of the docs table, k rows. On a
        multi-generation engine this reads the BASE generation's docs —
        segment-resident hits simply omit the extra keys (compaction
        restores full coverage)."""
        import pyarrow.dataset as ds_mod

        dset = self._open_docs_pruned(ds_mod, ids)
        if dset is None:
            return {}
        cols = [
            c for c in ("doc_id", "commit", "content_sha256", "ref_count")
            if c in dset.schema.names
        ]
        tbl = dset.to_table(
            filter=self._doc_point_filter(ds_mod, dset, ids), columns=cols
        ).to_pylist()
        return {int(r["doc_id"]): {k: v for k, v in r.items() if k != "doc_id"} for r in tbl}

    @staticmethod
    def _trim_page(rows: list) -> tuple[list, bool]:
        """P16 trim: walking the ranked page, cut at the first hit of coarser
        granularity than the top hit — "coarser" = its matched-clause set
        does not cover the top hit's clauses (the reference cuts
        locality-only matches on street queries using per-clause _name
        flags, ESDefaultSearch.java:281-313; matched_mask is the per-hit
        matched_queries[] analog)."""
        if not rows:
            return rows, False
        best = rows[0].matched_mask
        cut = next(
            (i for i, r in enumerate(rows) if (r.matched_mask & best) != best),
            len(rows),
        )
        return rows[:cut], cut < len(rows)

    def _search_ladder(
        self, q: str | Query, options: SearchOptions | None = None
    ) -> tuple[list, dict]:
        options = options or SearchOptions()
        if isinstance(q, str) and "-" in q and '"' not in q:
            # Lucene-style -token must_not syntax (skipped when the query
            # carries quoted phrases — a '-' inside quotes is literal text;
            # programmatic exclusion via options.exclude_terms still
            # composes with phrase queries)
            from dataclasses import replace as _dc_replace

            from gazetteer_search_spark.analyzer.query_ir import extract_negations

            residual, negs = extract_negations(q)
            if negs:
                options = _dc_replace(
                    options,
                    exclude_terms=tuple(
                        dict.fromkeys((*options.exclude_terms, *negs))
                    ),
                )
                q = residual
        if isinstance(q, str) and '"' in q:
            from gazetteer_search_spark.search import phrase as _ph

            parsed = _ph.parse_phrase_query(q)
            if parsed is not None:
                return self._phrase_rung(q, parsed[0], parsed[1], options)
        # /regex/ and *glob* tokens lift out before analysis (ES
        # regexp/wildcard query analog — search/patterns.py); the residue is
        # an ordinary analyzed query, and each pattern becomes one required
        # dictionary-expansion group appended to every rung
        pattern_clauses: list = []
        if isinstance(q, str) and '"' not in q:
            from gazetteer_search_spark.search import patterns as _pat

            residual, pattern_clauses = _pat.extract_patterns(q)
            if pattern_clauses:
                q = residual
        query = analyze_query(q, prefix=options.prefix, rule_set=self.rules) if isinstance(q, str) else q

        pat_exp: dict[str, tuple[str, ...]] | None = None

        def _with_patterns(
            groups: list[TermGroup], msm: int
        ) -> tuple[list[TermGroup], int, bool]:
            """Append one required expansion group per pattern clause.
            Expansion runs once (memoized across rungs — patterns never
            relax through the ladder). A pattern matching NO dictionary
            term makes every rung unsatisfiable (ES wildcard-on-no-terms
            semantics: required clause over an empty term set)."""
            nonlocal pat_exp
            if not pattern_clauses:
                return groups, msm, False
            if pat_exp is None:
                pat_exp = {
                    c.raw: tuple(self.expand_regexp(c.regex))
                    for c in pattern_clauses
                }
            if any(not v for v in pat_exp.values()):
                return groups, msm, True
            out = list(groups)
            gid = max((g.group_id for g in groups), default=-1) + 1
            for c in pattern_clauses:
                if gid > MAX_GROUP_ID:
                    break  # matched_mask bit budget — same cap as tokens
                out.append(
                    TermGroup(
                        group_id=gid,
                        terms=pat_exp[c.raw],
                        required=True,
                        name=c.raw,
                    )
                )
                gid += 1
            return out, msm + (len(out) - len(groups)), False

        # rungs are built LAZILY: rung 1 usually wins, and rungs 2/3 pay the
        # fuzzy term-dictionary expansion — no reason to expand before the
        # stricter rung has actually come back empty
        def _rung1() -> tuple[list[TermGroup], int]:
            return self._build_groups(query, options, fuzzy=False, with_prefix=True)

        def _rung2() -> tuple[list[TermGroup], int]:
            return self._build_groups(
                query, options, fuzzy=options.fuzzy, with_prefix=False
            )

        def _rung3() -> tuple[list[TermGroup], int]:
            # OR rung: minimum_should_match=2 like the reference's min-2-terms
            # gate (MainAddressQueryBuilder.java:274-309), but a <=2-term query
            # must actually relax below the AND rung -> msm=1
            g3, n3 = self._build_groups(
                query, options, fuzzy=options.fuzzy, with_prefix=False
            )
            return g3, (1 if n3 <= 2 else 2)

        # patterns never relax: the OR rung's msm=2 would let a /regex/ or
        # glob clause become optional, so the ladder stops at the fuzzy AND
        # rung when pattern clauses are present
        relax = [_rung2, _rung3] if not pattern_clauses else [_rung2]
        builders = [_rung1] + (relax if options.coalesce else [])

        last: list = []
        meta = {
            "query": query,
            "groups": [],
            "rung": 0,
            "trimmed": False,
            **(
                {"patterns": [c.raw for c in pattern_clauses]}
                if pattern_clauses
                else {}
            ),
        }
        seen_rungs: set[tuple] = set()
        for rung_no, build in enumerate(builders, 1):
            groups, msm, impossible = _with_patterns(*build())
            if impossible:
                # a pattern with zero dictionary matches: unsatisfiable at
                # every rung (expansion is rung-invariant) — empty result
                meta.update(groups=groups, rung=rung_no, trimmed=False)
                return [], meta
            # a rung identical to an already-executed one (same groups, same
            # msm) cannot produce different rows — e.g. rung 2 == rung 1 when
            # there is no prefix gate and fuzzy adds no expansions
            key = (
                tuple((g.terms, g.required, g.weight, g.term_weights) for g in groups),
                msm,
            )
            if key in seen_rungs:
                continue
            seen_rungs.add(key)
            rows = self.search_rung_rows(groups, msm, options)
            meta.update(groups=groups, msm=msm, rung=rung_no, trimmed=False)
            if options.trim:
                rows, meta["trimmed"] = self._trim_page(rows)
            last = rows
            if rows:
                return rows, meta
        return last, meta

    def search_rung_rows(
        self, groups: list[TermGroup], msm: int, options: SearchOptions
    ) -> list:
        """One rung as finalized rows — local executor when active (zero Spark
        jobs), else one executed Spark job."""
        if self._local is not None:
            return self._local.search_rung(groups, msm, options)
        return self.search_rung(groups, msm, options).collect()

    def search(self, q: str | Query, options: SearchOptions | None = None) -> DataFrame:
        """DataFrame facade over ``search_hits`` (the harness/batch contract)."""
        return self.spark.createDataFrame(self.search_hits(q, options), RESULT_SCHEMA)


def oracle_topk(
    corpus: DataFrame,
    groups: list[TermGroup],
    msm: int,
    k: int = 20,
    options: SearchOptions | None = None,
    tokenizer: str = "pandas",
) -> DataFrame:
    """Brute-force scorer, no index: explode -> join -> groupBy -> sum, scores
    straight from the corpus (SURVEY §7.1 step 4). The correctness oracle."""
    spark = corpus.sparkSession
    docs = bm25.doc_table(corpus, tokenizer)
    tf = bm25.term_freqs(docs)
    tstats = bm25.term_stats(tf)
    cs = bm25.corpus_stats(docs).collect()[0]
    scored_all = bm25.scored_postings(tf, tstats, int(cs.n_docs), float(cs.avg_doc_len))
    terms = sorted({t for g in groups for t in g.terms})
    scored = scored_all.filter(F.col("term").isin(terms)).select(
        "term", "doc_id", "score"
    )
    if options is not None and options.exclude_terms:
        excl = scored_all.filter(
            F.col("term").isin(sorted(set(options.exclude_terms)))
        ).select("doc_id")
        scored = scored.join(excl, "doc_id", "left_anti")
    demote = None
    if options is not None and options.demote_terms:
        dem = scored_all.filter(
            F.col("term").isin(sorted(set(options.demote_terms)))
        ).select("doc_id")
        demote = (dem, options.demote_factor)
    n_required = sum(1 for g in groups if g.required)
    return topk_from_scored(
        scored, _groups_df(spark, groups), n_required, msm, k, docs.drop("tokens"),
        options, groups=groups, demote=demote,
    )
