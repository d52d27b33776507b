"""Distributed BPE training (operators/bpe.py): Spark merge learning must
equal the single-process subword-nmt-style reference exactly (same argmax
tie-break), the fold must implement greedy left-to-right non-overlapping
merging, and encode() with a frozen merge table must reproduce training's
final state."""

from __future__ import annotations

from pyspark.sql import functions as F

from gazetteer_search_spark.operators import bpe

TEXTS = [
    "low lower lowest low low",
    "new newer newest new lower",
    "wider wide new low",
    "the lowest newest widest",
]


def _df(spark):
    return spark.createDataFrame([(t,) for t in TEXTS], "text string")


def test_train_matches_reference(spark):
    merges, _ = bpe.train_bpe(_df(spark), num_merges=16, min_pair_freq=2)
    ref = bpe.train_bpe_reference(TEXTS, 16, 2)
    assert merges == ref
    assert len(merges) > 4  # the corpus genuinely yields merges


def test_word_freqs(spark):
    rows = {
        r.word: r.freq for r in bpe.word_freqs(_df(spark)).collect()
    }
    assert rows["low"] == 4
    assert rows["new"] == 3
    assert rows["the"] == 1


def test_fold_is_greedy_left_to_right(spark):
    # 'aaa' under merge (a,a) -> [aa, a], never [a, aa] or [aa, aa]
    words = spark.createDataFrame(
        [("aaa", ["a", "a", "a"], 1)], "word string, syms array<string>, freq long"
    )
    out = bpe.apply_merge(words, "a", "a").collect()[0]["syms"]
    assert out == ["aa", "a"]


def test_fold_merged_symbol_does_not_rematch(spark):
    # [a, b, b] under (b,b): the first b pairs with the second -> [a, bb]
    words = spark.createDataFrame(
        [("abb", ["a", "b", "b"], 1)], "word string, syms array<string>, freq long"
    )
    out = bpe.apply_merge(words, "b", "b").collect()[0]["syms"]
    assert out == ["a", "bb"]


def test_encode_reproduces_training_state(spark):
    df = _df(spark)
    merges, trained = bpe.train_bpe(df, num_merges=10, min_pair_freq=2)
    fresh = bpe.init_words(bpe.word_freqs(df))
    encoded = bpe.encode(fresh, merges)
    a = {r.word: r.syms for r in trained.collect()}
    b = {r.word: r.syms for r in encoded.collect()}
    assert a == b


def test_min_pair_freq_stops_early(spark):
    df = spark.createDataFrame([("x y z",)], "text string")  # all freq-1
    merges, _ = bpe.train_bpe(df, num_merges=5, min_pair_freq=2)
    assert merges == []


def test_pair_counts_weighted_by_freq(spark):
    words = bpe.init_words(bpe.word_freqs(_df(spark)))
    pc = {r.pair: r.cnt for r in bpe.pair_counts(words).collect()}
    # 'lo' appears in low(4) lower(2: from 'lower' x1 + 'lowest'? no) —
    # count directly: words containing 'l','o' adjacent: low 4, lower 2,
    # lowest 2 -> weights 4+2+2
    freqs = {r.word: r.freq for r in bpe.word_freqs(_df(spark)).collect()}
    expect = sum(
        f for w, f in freqs.items() if "lo" in w
    )
    assert pc["l o"] == expect


def test_encode_word_rank_greedy():
    merges = [("l", "o"), ("lo", "w"), ("e", "r"), ("er", "</w>")]
    ranks = bpe.merge_ranks(merges)
    assert bpe.encode_word("lower", ranks) == ["low", "er</w>"]
    assert bpe.encode_word("xyz", ranks) == ["x", "y", "z", "</w>"]


def test_encode_corpus_matches_fold_replay(spark):
    df = _df(spark)
    merges, trained = bpe.train_bpe(df, num_merges=12, min_pair_freq=2)
    # per-word: rank-greedy single-word encoder == the distributed
    # in-order fold replay (training-state equivalence)
    ranks = bpe.merge_ranks(merges)
    for r in trained.collect():
        assert bpe.encode_word(r.word, ranks) == list(r.syms)
    # corpus-level: subwords concatenate back to the original words
    enc = bpe.encode_corpus(df, merges).collect()
    for row in enc:
        joined = "".join(row.bpe_tokens).replace(bpe.END_OF_WORD, " ").strip()
        assert joined == " ".join(row.text.lower().split())


def test_encode_corpus_empty_merges(spark):
    df = spark.createDataFrame([("ab ba",)], "text string")
    out = bpe.encode_corpus(df, []).collect()[0].bpe_tokens
    assert out == ["a", "b", "</w>", "b", "a", "</w>"]
