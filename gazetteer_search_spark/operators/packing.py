"""Sequence packing for training-data pipelines (concat-and-chunk).

LLM pre-training consumes FIXED-LENGTH token sequences, not documents: the
corpus is ordered deterministically, token streams are concatenated, and
the stream is cut at exact ``budget``-token boundaries — documents spanning
a boundary contribute a slice to each side (the standard GPT-style packing;
the alternative "no-split greedy bins" wastes tail capacity and is
order-dependent). This operator computes, for every document, the
sequence(s) it lands in and the token slice it contributes — fully
declaratively: one window cumsum + one explode, no UDF, no driver state.

Scale shape: packing is per ``group_col`` (a language, a shard hash — any
deterministic stratum), so the window partitions by group and parallelism
is the number of groups; an ungrouped call packs one global stream and is
documented as the single-partition form (small/ordered exports only).
Determinism: (group, doc order) fully determines every slice — the same
corpus packs identically on any cluster size, which is what makes packed
datasets resumable and auditable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gazetteer_search_spark.operators.textstats import token_count, words_col


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str | Column | None = None,
    id_col: str = "doc_id",
    group_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """One row per (document, training sequence) slice:

    - ``pack_group``: the stratum the stream belongs to (``group_col``
      value, or '' for the global stream)
    - ``seq_id``: 0-based sequence number within the group's token stream
    - ``off``: the slice's starting token offset WITHIN the document
    - ``n_slice``: slice length in tokens (sums to the doc's token count
      across its rows; every sequence except each group's last holds
      exactly ``budget`` tokens — both invariants are pinned by tests)

    ``token_col`` defaults to the engine's whitespace-ish token count over
    ``text_col``. Zero-token docs are dropped (they contribute nothing to
    the stream)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    tok = (
        token_count(F.col(text_col))
        if token_col is None
        else (F.col(token_col) if isinstance(token_col, str) else token_col)
    )
    grp = (
        F.col(group_col).cast("string")
        if group_col
        else F.lit("")
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        grp.alias("pack_group"),
        tok.cast("long").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    # ROWS frame, not the default RANGE: duplicate ids within a group must
    # each see only the rows BEFORE them, or tied rows both absorb both
    # token counts and slices overlap (the DuckDB oracle pins ROWS too)
    w = (
        Window.partitionBy("pack_group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = base.withColumn("cum", F.sum("n_tok").over(w)).withColumn(
        "start", F.col("cum") - F.col("n_tok")
    )
    b = F.lit(int(budget))
    first = F.expr(f"start DIV {int(budget)}")
    last = F.expr(f"(cum - 1) DIV {int(budget)}")
    return (
        c.withColumn("seq_id", F.explode(F.sequence(first, last)))
        .select(
            "doc_id",
            "pack_group",
            "seq_id",
            (F.greatest(F.col("start"), F.col("seq_id") * b) - F.col("start"))
            .alias("off"),
            (
                F.least(F.col("cum"), (F.col("seq_id") + F.lit(1)) * b)
                - F.greatest(F.col("start"), F.col("seq_id") * b)
            ).alias("n_slice"),
        )
    )


def sequence_manifest(packed: DataFrame) -> DataFrame:
    """Roll the slice table up to one row per training sequence: (pack_group,
    seq_id, n_docs, n_tokens). Every sequence except each group's last must
    hold exactly the budget — the completeness check a packing job runs
    before shipping the dataset."""
    return packed.groupBy("pack_group", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_slice").alias("n_tokens"),
    )


def chunk_documents(
    df: DataFrame,
    size: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAG-style sliding-window chunking: split each document's token
    sequence into windows of ``size`` tokens advancing by ``size - overlap``
    — the standard retrieval-corpus preparation where consecutive chunks
    share ``overlap`` tokens so no answer span is cut at a boundary. The
    complement of ``pack_sequences``: packing concatenates ACROSS documents
    for training, chunking splits WITHIN documents for retrieval.

    One row per (document, chunk): (doc_id, chunk_id, chunk_start,
    n_tokens, chunk_text). Chunk starts are 0, step, 2*step, ... while the
    start lies inside the document, so every token appears in >= 1 chunk
    and the final chunk clips at the document end (may be shorter than
    ``size``, never pure overlap). Zero-token docs drop.

    Scale shape: map-only — tokenize, compute the start grid with
    ``sequence``, explode, slice; no shuffle, no window, no UDF. At 100 TB
    this chunker is a single narrow stage whose output partitioning is the
    input's."""
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    if not (0 <= overlap < size):
        raise ValueError(
            f"overlap must be in [0, size), got overlap={overlap} size={size}"
        )
    step = size - overlap
    toks = words_col(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks")
    ).withColumn("n", F.size("toks")).filter(F.col("n") > 0)
    last_start = F.expr(f"((n - 1) DIV {step}) * {step}")
    return (
        base.withColumn(
            "chunk_start",
            F.explode(F.sequence(F.lit(0), last_start, F.lit(step))),
        )
        .select(
            "doc_id",
            (F.col("chunk_start") / F.lit(step))
            .cast("long")
            .alias("chunk_id"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.least(F.lit(size), F.col("n") - F.col("chunk_start"))
            .cast("long")
            .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("toks"), F.col("chunk_start") + F.lit(1), size),
                " ",
            ).alias("chunk_text"),
        )
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    n_shards: int,
    id_col: str = "doc_id",
    ascending: bool = True,
) -> DataFrame:
    """Curriculum ordering + shard assignment for training data: rank every
    row by a difficulty/quality score (ties broken by id — fully
    deterministic), then deal rows round-robin into ``n_shards`` so each
    shard sees the same difficulty profile while the WITHIN-shard order
    follows the curriculum.

    Output: (id, score, rank, shard, shard_pos) — rank is the global
    curriculum position (0-based), shard = rank % n_shards, shard_pos =
    rank // n_shards (the row's position within its shard's stream).

    Scale note: the global row_number is a single total order — fine up to
    ~10^9 rows (one sort); beyond that, swap the exact rank for a bucketed
    approximation (ntile over a sampled CDF) with the same downstream
    columns. The exact form is the auditable twin."""
    from pyspark.sql.window import Window

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    s = F.col(score_col)
    order = [s.asc() if ascending else s.desc(), F.col(id_col).asc()]
    w = Window.orderBy(*order)
    return (
        df.filter(s.isNotNull())
        .select(
            F.col(id_col),
            s.alias("score"),
            (F.row_number().over(w) - 1).alias("rank"),
        )
        .select(
            "*",
            (F.col("rank") % n_shards).alias("shard"),
            (F.col("rank") / n_shards).cast("long").alias("shard_pos"),
        )
    )
