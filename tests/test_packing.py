"""Sequence packing (operators/packing.py): concat-and-chunk slices.

Invariants pinned against a plain Python re-pack of the same ordered
stream: slice coverage (per-doc slices sum to the doc's token count and
tile it contiguously), sequence fullness (every sequence except each
group's last holds exactly the budget), determinism, and group isolation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.operators import packing


def _py_pack(docs: list[tuple[int, str, int]], budget: int):
    """(doc_id, group, n_tok) ordered stream -> {(doc, group, seq): (off, len)}"""
    out = {}
    pos: dict[str, int] = {}
    for doc_id, grp, n in sorted(docs, key=lambda r: (r[1], r[0])):
        if n <= 0:
            continue
        start = pos.get(grp, 0)
        pos[grp] = start + n
        for seq in range(start // budget, (start + n - 1) // budget + 1):
            lo = max(start, seq * budget)
            hi = min(start + n, (seq + 1) * budget)
            out[(doc_id, grp, seq)] = (lo - start, hi - lo)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, ["en", "fr", "zh"][i % 3], (i * 37) % 23)  # includes zeros
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, n long")


def test_slices_match_python_oracle(spark, docs):
    got = {
        (r.doc_id, r.pack_group, r.seq_id): (r.off, r.n_slice)
        for r in packing.pack_sequences(
            docs, budget=16, token_col="n", group_col="lang"
        ).collect()
    }
    want = _py_pack([(r.doc_id, r.lang, r.n) for r in docs.collect()], 16)
    assert got == want


def test_full_sequences_except_group_tail(spark, docs):
    packed = packing.pack_sequences(docs, budget=16, token_col="n", group_col="lang")
    man = packing.sequence_manifest(packed).collect()
    last = {}
    for r in man:
        last[r.pack_group] = max(last.get(r.pack_group, -1), r.seq_id)
    for r in man:
        if r.seq_id < last[r.pack_group]:
            assert r.n_tokens == 16, (r.pack_group, r.seq_id)
        else:
            assert 0 < r.n_tokens <= 16


def test_doc_token_mass_is_conserved(spark, docs):
    packed = packing.pack_sequences(docs, budget=16, token_col="n", group_col="lang")
    per_doc = {
        r.doc_id: r.s
        for r in packed.groupBy("doc_id").agg(F.sum("n_slice").alias("s")).collect()
    }
    for r in docs.collect():
        if r.n > 0:
            assert per_doc[r.doc_id] == r.n
        else:
            assert r.doc_id not in per_doc


def test_default_token_count_and_global_stream(spark):
    d = spark.createDataFrame(
        [(0, "a b c"), (1, "d e"), (2, ""), (3, "f g h i")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r.doc_id, r.seq_id, r.off, r.n_slice)
        for r in packing.pack_sequences(d, budget=4).collect()
    )
    # stream: doc0 3 tok | doc1 2 tok | doc3 4 tok -> seq0=[d0:3, d1:1],
    # seq1=[d1:1, d3:3], seq2=[d3:1]
    assert rows == [
        (0, 0, 0, 3),
        (1, 0, 0, 1),
        (1, 1, 1, 1),
        (3, 1, 0, 3),
        (3, 2, 3, 1),
    ]


def test_bad_budget_rejected(spark, docs):
    with pytest.raises(ValueError, match="budget"):
        packing.pack_sequences(docs, budget=0, token_col="n")


@pytest.fixture(scope="module")
def text_docs(spark):
    rows = [
        (0, "alpha beta gamma delta " * 12),          # 48 tokens
        (1, "one two three"),                         # 3 tokens (< size)
        (2, "x " * 10),                               # exactly one step
        (3, ""),                                      # zero tokens -> drops
        (4, "Word9 WORD9 word9 " * 25),               # folding + 75 tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_overlap_invariants(spark, text_docs):
    """Every token covered; consecutive chunks share exactly `overlap`
    tokens; final chunk clips at the doc end and is never pure overlap."""
    size, overlap = 10, 3
    step = size - overlap
    rows = packing.chunk_documents(
        text_docs, size=size, overlap=overlap
    ).collect()
    toks = {
        r.doc_id: r.toks
        for r in text_docs.select(
            "doc_id",
            F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != F.lit("")
            ).alias("toks"),
        ).collect()
    }
    assert 3 not in {r.doc_id for r in rows}  # zero-token doc drops
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        n = len(toks[d])
        # start grid: 0, step, ... last start inside the doc
        assert [c.chunk_start for c in chunks] == list(range(0, n, step))
        for c in chunks:
            want = toks[d][c.chunk_start : c.chunk_start + size]
            assert c.chunk_text == " ".join(want)
            assert c.n_tokens == len(want)
        # consecutive chunks share exactly `overlap` tokens (except a
        # clipped tail shorter than overlap shares what remains)
        for a, b in zip(chunks, chunks[1:]):
            shared = toks[d][b.chunk_start : a.chunk_start + size]
            assert a.chunk_text.split(" ")[step:] == shared[: len(shared)]
        # coverage: stitching non-overlap prefixes + last chunk == doc
        rebuilt = []
        for c in chunks[:-1]:
            rebuilt.extend(c.chunk_text.split(" ")[:step])
        rebuilt.extend(chunks[-1].chunk_text.split(" "))
        assert rebuilt == toks[d]


def test_chunk_no_overlap_tiles_exactly(spark, text_docs):
    rows = packing.chunk_documents(text_docs, size=10, overlap=0).collect()
    d0 = sorted(
        (r for r in rows if r.doc_id == 0), key=lambda r: r.chunk_id
    )
    assert [r.chunk_start for r in d0] == [0, 10, 20, 30, 40]
    assert [r.n_tokens for r in d0] == [10, 10, 10, 10, 8]
    assert sum(r.n_tokens for r in d0) == 48  # tiles, no double-count


def test_chunk_bad_params_rejected(spark, text_docs):
    with pytest.raises(ValueError, match="size must be positive"):
        packing.chunk_documents(text_docs, size=0)
    with pytest.raises(ValueError, match="overlap must be in"):
        packing.chunk_documents(text_docs, size=10, overlap=10)
    with pytest.raises(ValueError, match="overlap must be in"):
        packing.chunk_documents(text_docs, size=10, overlap=-1)
