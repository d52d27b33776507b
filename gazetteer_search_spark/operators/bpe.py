"""Distributed BPE tokenizer training (byte-pair-encoding merge learning).

The canonical LLM-pipeline op the reference has no analog of: learn a BPE
merge table (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units") from the corpus, entirely in Spark.

Scale shape
-----------
Classic BPE trains on the *word-frequency dictionary*, not the raw corpus:
one explode + hash-agg collapses the corpus (100 TB) to its distinct words
(maybe 10^8 rows) — and everything after stays on that table. Each merge
iteration is:

1. ``pair_counts`` — one native hash aggregation (map-side partials free)
   over the words table: adjacent symbol pairs weighted by word frequency.
2. argmax pair — a **1-row** collect (``orderBy(count desc, pair asc)
   .limit(1)``, deterministic tie-break).
3. merge application — a native ``F.aggregate`` left-to-right fold over
   each word's symbol array: no Python touches a row. Left-to-right
   non-overlapping semantics fall out of the fold because a merged symbol
   ``a+b`` can never string-equal ``a`` (``b`` is non-empty), so a freshly
   merged element never re-matches the same pair's left side.

The loop's lineage is cut with ``localCheckpoint`` every few iterations —
without it, iteration N's plan contains N nested folds and Catalyst
analysis time goes quadratic (the standard iterative-algorithm pitfall).

Words whose symbols can no longer contain the merged pair are not
re-scanned logically — the fold is a no-op for them — and at the physical
level the words table stays hash-partitioned by ``word`` across
iterations, so no iteration reshuffles.

No reference analog (the reference delegates analysis to ES analyzers);
the word-dictionary trick mirrors subword-nmt's ``learn_bpe`` and
HuggingFace tokenizers' trainer, both of which train on word counts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: appended to every word so merges learn word-final subwords distinctly
#: (the Sennrich end-of-word marker)
END_OF_WORD = "</w>"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, freq) dictionary: ONE explode + hash agg, the only
    pass that ever touches the full corpus. Words are whitespace-split,
    lowercased, empties dropped (the corpus text is already analyzer-clean;
    feed pre-tokenized text for other domains)."""
    return (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _init_symbols(word: Column) -> Column:
    """Word -> initial symbol array: one element per character, plus the
    end-of-word marker."""
    return F.concat(
        F.split(word, ""), F.array(F.lit(END_OF_WORD))
    )


def init_words(freqs: DataFrame) -> DataFrame:
    """(word, freq) -> (word, syms, freq) with character-level symbols —
    the state the merge loop iterates on."""
    return freqs.select(
        "word", _init_symbols(F.col("word")).alias("syms"), "freq"
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency — the BPE
    objective. Native: per row, ``transform`` over the symbol-index range
    emits ``"a b"`` strings; explode + one hash agg. Output: (pair, cnt)."""
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("syms") - F.lit(2)),
        lambda i: F.concat_ws(
            " ",
            F.element_at("syms", i + F.lit(1)),
            F.element_at("syms", i + F.lit(2)),
        ),
    )
    return (
        words.filter(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def apply_merge(words: DataFrame, left: str, right: str) -> DataFrame:
    """Replace every adjacent (left, right) symbol pair with the merged
    symbol ``left+right`` — a native left-to-right ``aggregate`` fold, no
    UDF. Non-overlapping greedy semantics: ``aaa`` under merge (a,a)
    becomes ``[aa, a]``, exactly subword-nmt's scan."""
    lw, rw, merged = F.lit(left), F.lit(right), F.lit(left + right)
    folded = F.aggregate(
        "syms",
        F.expr("cast(array() as array<string>)"),
        lambda out, x: F.when(
            (F.size(out) > 0)
            & (F.element_at(out, -1) == lw)
            & (x == rw),
            F.concat(
                F.slice(out, 1, F.size(out) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(out, F.array(x))),
    )
    return words.select("word", folded.alias("syms"), "freq")


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    min_pair_freq: int = 2,
    checkpoint_every: int = 8,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns
    ``(merges, words)`` — the ordered merge table and the final
    symbolized word table (for vocab extraction / encoding tests).

    Driver work per iteration is ONE row (the argmax pair); everything
    else is distributed. Stops early when the best pair's weighted count
    drops below ``min_pair_freq`` (no useful merges left)."""
    words = init_words(word_freqs(df, text_col)).persist()
    words.count()  # materialize before the loop
    merges: list[tuple[str, str]] = []
    for it in range(num_merges):
        top = (
            pair_counts(words)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_freq:
            break
        left, right = top[0]["pair"].split(" ", 1)
        merges.append((left, right))
        prev = words
        words = apply_merge(words, left, right)
        if (it + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
        else:
            words = words.persist()
            words.count()
        prev.unpersist()
    return merges, words


def vocab(words: DataFrame) -> DataFrame:
    """Final subword vocabulary: (symbol, freq) over the symbolized word
    table — one explode + hash agg on the small dictionary."""
    return (
        words.select(F.explode("syms").alias("symbol"), "freq")
        .groupBy("symbol")
        .agg(F.sum("freq").alias("freq"))
    )


def encode(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge table (in order) to a ``(word, syms, freq)``
    table — the distributed encoder twin of ``train_bpe``'s state
    evolution; used to tokenize NEW text with a frozen tokenizer. Chains
    one native fold per merge; cut lineage with localCheckpoint when
    applying hundreds of merges."""
    out = words
    for i, (left, right) in enumerate(merges):
        out = apply_merge(out, left, right)
        if (i + 1) % 24 == 0:
            out = out.localCheckpoint(eager=True)
    return out


# ---------------------------------------------------------------------------
# pure-python reference (test oracle for the iterative path)
# ---------------------------------------------------------------------------

def train_bpe_reference(
    texts: list[str], num_merges: int, min_pair_freq: int = 2
) -> list[tuple[str, str]]:
    """Single-process reference implementation (subword-nmt's algorithm
    verbatim) for pytest equivalence against ``train_bpe`` — same
    tie-break: (count desc, pair-string asc)."""
    from collections import Counter

    freqs: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                freqs[w] += 1
    words = {w: list(w) + [END_OF_WORD] for w in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for w, syms in words.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pc[f"{a} {b}"] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        left, right = best[0].split(" ", 1)
        merges.append((left, right))
        for w, syms in words.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            words[w] = out
    return merges


# ---------------------------------------------------------------------------
# corpus encoding with a frozen merge table (the tokenizer-application op)
# ---------------------------------------------------------------------------

def merge_ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {pair: i for i, pair in enumerate(merges)}

def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic rank-greedy BPE encode of ONE word: repeatedly merge the
    lowest-rank adjacent pair present (all its occurrences, left to right)
    until none applies — provably equivalent to replaying the merge table
    in training order (each merge's pair can only be formed by lower-rank
    merges), which tests pin against the distributed fold replay."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank = None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
        if best_rank is None:
            break
        # apply that merge left-to-right, non-overlapping
        left = None
        for pair, r in ranks.items():
            if r == best_rank:
                left = pair
                break
        a, b = left
        out: list[str] = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        syms = out
    return syms

def encode_corpus(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize a corpus with a frozen BPE merge table -> subword array
    column (the training-data tokenizer-application pass).

    Shape: an Arrow-batched pandas UDF with a per-batch word->subwords
    cache — under a Zipf word distribution the per-batch work is
    ~O(distinct words), not O(tokens), and the merge table rides the UDF
    closure (broadcast once per executor). Encoding is inherently a
    per-word sequential reduction (HF tokenizers' Rust core runs the same
    loop); the batch cache is what makes it a bulk operator rather than a
    per-row one."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    ranks = merge_ranks(merges)

    @pandas_udf(ArrayType(StringType()))
    def _enc(s: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = cache[w] = encode_word(w, ranks)
            return got

        return s.map(
            lambda t: [
                sub
                for w in t.lower().split()
                if w
                for sub in enc_word(w)
            ]
        )

    return df.withColumn(out_col, _enc(F.col(text_col)))
