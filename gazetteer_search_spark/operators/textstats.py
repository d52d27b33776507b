"""Text analysis operators: language-ID heuristic, quality scoring, token
counting, document fingerprinting. All pure Catalyst column expressions —
each has an exact ANSI-SQL twin for the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker-word sets for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "de", "et", "les", "des"],
    "de": ["der", "die", "das", "und", "ist"],
}

STOPWORDS_EN = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "on"]


def words_col(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    """Whitespace-ish token count (BPE-ish regex split)."""
    return F.size(words_col(text))


def marker_hits(text: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.array_intersect(F.array_distinct(words_col(text)), arr))


def lang_id(text: Column) -> Column:
    """Heuristic language guess: argmax of marker-word hits, 'unknown' if no
    marker matches. Deterministic tie-break by language name order."""
    best_lang = F.lit("unknown")
    best_hits = F.lit(0)
    for lg in sorted(LANG_MARKERS):
        h = marker_hits(text, LANG_MARKERS[lg])
        better = h > best_hits
        best_lang = F.when(better, F.lit(lg)).otherwise(best_lang)
        best_hits = F.when(better, h).otherwise(best_hits)
    return best_lang


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length band + alnum ratio + stopword ratio.
    (The base_score/DefaultScoreBuilder analog — a static per-doc quality
    prior, reference imp/DefaultScoreBuilder.java:37-92.)"""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    alnum = F.length(F.regexp_replace(text, "[^a-zA-Z0-9]", ""))
    alnum_ratio = F.when(n_chars > 0, alnum / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tokens > 0, marker_hits(text, STOPWORDS_EN) / n_tokens
    ).otherwise(F.lit(0.0))
    len_band = (
        F.when((n_tokens >= 20) & (n_tokens <= 10000), F.lit(1.0))
        .when(n_tokens > 0, F.lit(0.5))
        .otherwise(F.lit(0.0))
    )
    return F.round(0.4 * len_band + 0.4 * alnum_ratio + 0.2 * stop_ratio, 6)


def fingerprint(text: Column) -> Column:
    """Canonical-form fingerprint: md5 of the sorted distinct word set —
    robust to word order/whitespace (the shingle-free near-exact key)."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(words_col(text))))
    return F.md5(canon)


def tag_statistics(
    df: DataFrame, key: str, min_doc_count: int = 1, size: int = 10
) -> DataFrame:
    """Terms aggregation over an arbitrary metadata column with
    minDocCount/size — the generic tag-statistics endpoint's distributed
    form (reference api/stats/TagStatisticsAPI.java:44-100: terms agg over
    any ``more_tags.*`` key). Buckets ordered (doc_count desc, value asc),
    nulls excluded, the ES terms-agg contract. One hash-agg shuffle on the
    key plus a tiny global top-``size`` — scale-safe at any cardinality."""
    return (
        df.filter(F.col(key).isNotNull())
        .groupBy(F.col(key).cast("string").alias("value"))
        .agg(F.count("*").alias("doc_count"))
        .filter(F.col("doc_count") >= min_doc_count)
        .orderBy(F.col("doc_count").desc(), F.col("value").asc())
        .limit(size)
    )


# ---------------------------------------------------------------------------
# PII detection + redaction
# ---------------------------------------------------------------------------
# Patterns are deliberately restricted to constructs with identical semantics
# in Java regex (Spark/Catalyst) and RE2 (DuckDB oracle): character classes,
# greedy + / {m,}, \b word boundaries — no backreferences or lookaround.
# Ordered: emails first (so an IP-like mail domain is consumed as part of the
# email), then IPv4, then international-format phone numbers.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
]


def pii_counts(text: Column) -> list[Column]:
    """One count column per PII type (n_email, n_ipv4, n_phone)."""
    return [
        F.regexp_count(text, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def redact_pii_col(text: Column) -> Column:
    """Replace every PII span with its typed placeholder. Pure Catalyst
    regexp_replace chain — JVM-side, whole-stage-codegen friendly; the
    100-TB shape is a map-only pass with no shuffle."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc PII report + redacted text: the standard pre-training privacy
    scrub (emails / IPv4 / intl phone numbers -> typed placeholders).
    Counts are computed on the ORIGINAL text, redaction is sequential in
    PII_PATTERNS order."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        *pii_counts(t),
        redact_pii_col(t).alias("redacted"),
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        lang_id(t).alias("lang_guess"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``dup_word_frac``: 1 - distinct_words/total_words (within-doc word
      repetition; the duplicate-line fraction analog for single-line docs)
    - ``top_bigram_frac``: occurrences of the doc's most frequent word
      bigram / total bigrams (Gopher's top-2-gram character-fraction
      filter, word-normalized)

    Scale shape: dup_word_frac is a per-row array expression (map-only).
    The bigram mode is computed distributed — explode + two partial-agg
    passes keyed on doc_id, so per-doc state never exceeds one (doc,
    bigram) group and 10k-word documents don't hit an O(n^2) per-row
    higher-order loop.
    """
    t = F.col(text_col)
    ws = words_col(t)
    base = df.select(F.col(id_col).alias("doc_id"), ws.alias("ws"))
    per_doc = base.select(
        "doc_id",
        F.size("ws").alias("n_words"),
        F.round(
            F.when(
                F.size("ws") > 0,
                1.0 - F.size(F.array_distinct("ws")) / F.size("ws"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_word_frac"),
    )
    idx = F.sequence(F.lit(0), F.size("ws") - 2)
    grams = F.when(
        F.size("ws") >= 2,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice("ws", i + 1, 2))),
    ).otherwise(F.array().cast("array<string>"))
    bigram_stat = (
        base.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .count()
        .groupBy("doc_id")
        .agg((F.max("count") / F.sum("count")).alias("_tbf"))
    )
    return (
        per_doc.join(bigram_stat, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            "dup_word_frac",
            F.round(F.coalesce(F.col("_tbf"), F.lit(0.0)), 6).alias(
                "top_bigram_frac"
            ),
        )
    )


def lm_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bigram: bool = True,
) -> DataFrame:
    """Corpus-self language-model surprisal per document (the CCNet/KenLM
    perplexity-filter shape, with the LM trained on the corpus itself in
    the same job): per doc, average -log2 p(token) under the corpus MLE
    unigram model, and optionally average -log2 p(w2 | w1) under the
    corpus bigram model. High-surprisal docs are the distribution outliers
    a perplexity filter drops; low-surprisal docs are boilerplate.

    Output: (doc_id, n_tokens, uni_bits, uni_ppl[, bi_bits, bi_ppl]) —
    ``*_bits`` = avg surprisal in bits/token, ``*_ppl`` = 2^bits. Docs
    with no tokens carry zeros; a doc's first token has no bigram context
    and is skipped in the bigram average (KenLM's <s> analog would add a
    boundary context — the corpus-self MLE keeps every probability
    well-defined without smoothing).

    Scale shape: count tables are hash aggs on the token (map-side
    partials), each joined back once — no self-joins, no UDF; every
    shuffle keys on a token/pair hash or doc_id."""
    words = words_col(F.col(text_col))
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(words).alias("w")
    )
    uni = toks.groupBy("w").agg(F.count("*").alias("c"))
    total = toks.count()
    per_uni = (
        toks.join(uni, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (
                -F.sum(F.log2(F.col("c") / F.lit(float(total))))
                / F.count("*")
            ).alias("_ub"),
        )
    )
    out = df.select(F.col(id_col).alias("doc_id")).join(
        per_uni, "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.round(F.coalesce("_ub", F.lit(0.0)), 6).alias("uni_bits"),
        F.round(F.pow(F.lit(2.0), F.coalesce("_ub", F.lit(0.0))), 6).alias(
            "uni_ppl"
        ),
    )
    if not bigram:
        return out
    # adjacent (w1, w2) pairs, order-preserving, NOT distinct
    pair_arr = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - F.lit(2)),
            lambda i: F.concat_ws(
                " ",
                F.element_at(words, i + F.lit(1)),
                F.element_at(words, i + F.lit(2)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = df.select(
        F.col(id_col).alias("doc_id"), F.explode(pair_arr).alias("pw")
    )
    bic = pairs.groupBy("pw").agg(F.count("*").alias("bc"))
    # context count: pairs sharing the first word (the bigram denominator)
    ctx = (
        pairs.select(F.split("pw", " ")[0].alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("cc"))
    )
    per_bi = (
        pairs.join(bic, "pw")
        .withColumn("w1", F.split("pw", " ")[0])
        .join(ctx, "w1")
        .groupBy("doc_id")
        .agg(
            (
                -F.sum(F.log2(F.col("bc") / F.col("cc"))) / F.count("*")
            ).alias("_bb")
        )
    )
    return out.join(per_bi, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "uni_bits",
        "uni_ppl",
        F.round(F.coalesce("_bb", F.lit(0.0)), 6).alias("bi_bits"),
        F.round(F.pow(F.lit(2.0), F.coalesce("_bb", F.lit(0.0))), 6).alias(
            "bi_ppl"
        ),
    )
