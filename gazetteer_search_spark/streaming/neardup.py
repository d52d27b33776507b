"""Streaming incremental near-duplicate detection at ingest (beyond ref).

Batch near-dup (``operators/dedup.minhash_lsh_pairs``) compares a corpus
against ITSELF; a training-data ingest pipeline needs the INCREMENTAL
form — "is this incoming document a near-copy of anything already
accepted?" — without rescanning accepted text per micro-batch. This
module keeps a persisted MinHash SIGNATURE REGISTRY (``num_hashes``
int64 slots per accepted doc — the sketch, NOT the shingle sets, so the
registry is ~256 bytes/doc at the default 32 hashes and stays
broadcast-or-bucket-joinable at 10^9 docs) and, per micro-batch:

1. MinHash signatures for the batch (one shuffle over BATCH shingles
   only — accepted documents' text is never re-read),
2. LSH band join of batch band rows vs registry band rows (candidates
   via (band, bucket) agreement, not all-pairs),
3. per-candidate Jaccard ESTIMATE = agreeing signature slots /
   num_hashes (the unbiased MinHash estimator),
4. flags land in ``out_path/batch=<id>``; the batch's signatures are
   appended to the registry at ``registry_path/batch=<id>``.

Exactly-once: both writes OVERWRITE their own batch-id partition (the
same idempotence the percolate stream and Spark's file sink use), and
the registry read EXCLUDES the in-flight batch id, so a replayed batch
never matches its own previous attempt.

The same (band, bucket) space is shared with the batch operator via
``dedup.band_rows_from_sigs`` — signatures persisted by a batch
backfill job are probe-able by the stream and vice versa.

Reference parity note: the reference has no streaming surface at all
(its importer is a batch ES loader, /root/reference/src/main/java/me/
osm/gazetteer/search/imp/ImportObjects.java); this operator family is
part of the beyond-reference LLM-pipeline surface (SURVEY §2.10).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gazetteer_search_spark.operators.dedup import (
    band_rows_from_sigs,
    minhash_signatures,
)

REGISTRY_SCHEMA = "doc_id long, sig array<bigint>"


def read_registry(
    spark: SparkSession, registry_path: str, exclude_batch: int | None = None
) -> DataFrame | None:
    """Signature registry as (doc_id, sig), or None when empty. The
    driver-side glob lists micro-batch partition dirs (bounded by batch
    count, not doc count); ``exclude_batch`` drops the in-flight batch's
    own previous attempt on replay."""
    dirs = sorted(glob.glob(os.path.join(registry_path, "batch=*")))
    if exclude_batch is not None:
        dirs = [
            d for d in dirs
            if os.path.basename(d) != f"batch={int(exclude_batch)}"
        ]
    if not dirs:
        return None
    return (
        spark.read.option("basePath", registry_path)
        .parquet(*dirs)
        .select("doc_id", "sig")
    )


def _est_jaccard(num_hashes: int):
    """Agreeing-slots / num_hashes over two sig arrays — pure Catalyst."""
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    )
    return F.round(agree / F.lit(float(num_hashes)), 6)


def flag_against_sigs(
    batch_sigs: DataFrame,
    registry_sigs: DataFrame | None,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_id, dup_of, est_jaccard): batch docs whose estimated Jaccard
    vs an ACCEPTED doc — in the registry, or earlier (smaller doc_id)
    within the same batch — meets ``threshold``.

    The candidate set is the LSH band join (sub-quadratic); the estimate
    is signature-slot agreement, so no shingle set of a prior doc is
    ever materialized. Within-batch pairs orient larger-id -> smaller-id
    (the smaller id is the canonical survivor, matching the batch
    dedup's representative rule)."""
    bband = band_rows_from_sigs(batch_sigs, num_hashes, bands, hash_fn)
    pairs = None
    if registry_sigs is not None:
        rband = band_rows_from_sigs(registry_sigs, num_hashes, bands, hash_fn)
        # scale shape: the REGISTRY side is the accepted corpus (up to 10^9
        # docs) and must not reshuffle per micro-batch — broadcast the
        # bounded micro-batch's band rows so the registry probe is one
        # shuffle-free scan (BroadcastHashJoin, registry streamed)
        pairs = (
            F.broadcast(bband.alias("a"))
            .join(
                rband.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") != F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_id"),
                F.col("b.doc_id").alias("dup_of"),
            )
        )
    within = (
        bband.alias("a")
        .join(
            bband.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") > F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("b.doc_id").alias("dup_of"),
        )
    )
    pairs = within if pairs is None else pairs.unionByName(within)
    pairs = pairs.distinct()

    all_sigs = (
        batch_sigs
        if registry_sigs is None
        else registry_sigs.unionByName(batch_sigs)
    )
    # pairs is candidate-sized (band agreements only) — broadcast it through
    # both signature joins so the registry-sized all_sigs side never shuffles
    return (
        F.broadcast(
            pairs.join(
                batch_sigs.select("doc_id", F.col("sig").alias("sig_a")),
                "doc_id",
            )
        )
        .join(
            all_sigs.select(
                F.col("doc_id").alias("dup_of"), F.col("sig").alias("sig_b")
            ),
            "dup_of",
        )
        .withColumn("est_jaccard", _est_jaccard(num_hashes))
        .filter(F.col("est_jaccard") >= F.lit(float(threshold)))
        .select("doc_id", "dup_of", "est_jaccard")
    )


def flag_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    registry_sigs: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """(flags, batch_sigs) for one document batch: signatures computed
    from text once, flags via :func:`flag_against_sigs`. Callers persist
    ``batch_sigs`` into the registry after acting on the flags."""
    bsig = minhash_signatures(batch_df, text_col, id_col, n, num_hashes, hash_fn)
    flags = flag_against_sigs(
        bsig, registry_sigs, num_hashes, bands, threshold, hash_fn
    )
    return flags, bsig


def neardup_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    registry_path: str,
    out_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
):
    """Near-dup flagging at INGEST over a document stream. Per
    micro-batch: flag against the registry-as-of-before-this-batch plus
    earlier docs in the batch, write flags to ``out_path/batch=<id>``,
    append the batch's signatures to ``registry_path/batch=<id>``. Both
    writes are batch-id-keyed overwrites and the registry read excludes
    the current id — replays are idempotent. Returns the StreamingQuery
    (availableNow: a finite backlog drains and terminates; long-running
    deployments drop the trigger)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bid = int(batch_id)
        reg = read_registry(spark, registry_path, exclude_batch=bid)
        flags, bsig = flag_batch(
            spark, batch_df, reg, text_col, id_col, n, num_hashes, bands,
            threshold, hash_fn,
        )
        # signatures are consumed twice (flag estimate + registry write):
        # persist so the shingle scan runs once per batch
        bsig = bsig.persist()
        try:
            flags.write.mode("overwrite").parquet(f"{out_path}/batch={bid}")
            bsig.write.mode("overwrite").parquet(
                f"{registry_path}/batch={bid}"
            )
        finally:
            bsig.unpersist()

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
