"""Streaming incremental near-dup: registry probe ≡ batch LSH, replay-safe."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from gazetteer_search_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signatures,
)
from gazetteer_search_spark.streaming.neardup import (
    flag_against_sigs,
    flag_batch,
    neardup_stream,
    read_registry,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def test_flag_matches_batch_lsh_candidates(spark):
    """One batch, no registry: every batch-LSH verified pair (true Jaccard
    >= 0.9) must surface as a within-batch flag at a LOOSER estimate
    threshold, oriented larger-id -> smaller-id."""
    docs = _docs(spark)
    flags, _sigs = flag_batch(spark, docs, None, threshold=0.5)
    got = {(r.doc_id, r.dup_of) for r in flags.collect()}
    truth = minhash_lsh_pairs(docs, n=1, threshold=0.9)
    want = {(max(r.id_a, r.id_b), min(r.id_a, r.id_b)) for r in truth.collect()}
    assert want, "testdata must contain near-dup documents"
    assert want <= got
    # orientation invariant: dup_of is always the smaller (earlier) id
    assert all(d < i for i, d in got)


def test_registry_probe_equals_within_batch_split(spark):
    """Splitting the corpus into (accepted registry, incoming batch) finds
    exactly the cross-half pairs that one all-in-one batch finds —
    compared as unordered pairs with their estimates."""
    docs = _docs(spark)
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    reg = minhash_signatures(first, "text", "doc_id", n=1)

    flags, _ = flag_batch(spark, second, reg, threshold=0.5)
    got = {
        (min(r.doc_id, r.dup_of), max(r.doc_id, r.dup_of), float(r.est_jaccard))
        for r in flags.collect()
        if r.dup_of % 2 == 0  # cross-half only (odd->odd are within-batch)
    }

    both = minhash_signatures(docs, "text", "doc_id", n=1)
    all_flags = flag_against_sigs(both, None, threshold=0.5)
    want = {
        (min(r.doc_id, r.dup_of), max(r.doc_id, r.dup_of), float(r.est_jaccard))
        for r in all_flags.collect()
        if (r.doc_id % 2) != (r.dup_of % 2)
    }
    assert want, "expected cross-half near-dup pairs in testdata"
    assert got == want


def test_registry_probe_plan_broadcasts_batch_never_registry(spark):
    """Scale contract: the registry is the accepted corpus (up to 10^9
    docs) and must not reshuffle per micro-batch — every join in the flag
    plan broadcasts the bounded micro-batch/candidate side, so the plan
    contains BroadcastHashJoins and ZERO SortMergeJoins (a sort-merge join
    would shuffle the registry on every batch)."""
    from gazetteer_search_spark.plans import explain_str

    docs = _docs(spark)
    reg = minhash_signatures(
        docs.filter(F.col("doc_id") % 2 == 0), "text", "doc_id", n=1
    )
    flags, _ = flag_batch(
        spark, docs.filter(F.col("doc_id") % 2 == 1), reg, threshold=0.5
    )
    plan = explain_str(flags, mode="simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def _stage(df, dst):
    """One parquet FILE (not directory) for the file-stream source."""
    tmp = str(dst) + ".stage"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.copy(part, dst)
    shutil.rmtree(tmp)


def test_stream_two_batches_and_replay_idempotence(spark, tmp_path):
    """Two micro-batches through the file stream: batch-1 docs flag against
    batch-0's registry; re-running the drained stream adds nothing; and a
    forced re-execution of a batch id yields identical output (overwrite +
    self-batch exclusion)."""
    docs = _docs(spark).orderBy("doc_id").limit(200).persist()
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    half = set(ids[: len(ids) // 2])
    b0_docs = docs.filter(F.col("doc_id").isin(half))
    b1_docs = docs.filter(~F.col("doc_id").isin(half))
    src = tmp_path / "in"
    src.mkdir()
    _stage(b0_docs, src / "b0.parquet")

    reg_p, out_p, ckpt = (
        str(tmp_path / "reg"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )

    def _run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        neardup_stream(
            spark, stream, reg_p, out_p, ckpt, threshold=0.5
        ).awaitTermination()

    _run()
    n_docs_b0 = minhash_signatures(b0_docs, "text", "doc_id", n=1).count()
    assert read_registry(spark, reg_p).count() == n_docs_b0 > 0

    # second file -> second batch probes the first's registry
    _stage(b1_docs, src / "b1.parquet")
    _run()
    n_docs_b1 = minhash_signatures(b1_docs, "text", "doc_id", n=1).count()
    assert read_registry(spark, reg_p).count() == n_docs_b0 + n_docs_b1

    flags = spark.read.parquet(out_p)
    cross = flags.filter(
        F.col("dup_of").isin(half) & ~F.col("doc_id").isin(half)
    )
    # ground truth: the same split probed directly
    reg0 = minhash_signatures(b0_docs, "text", "doc_id", n=1)
    direct, _ = flag_batch(spark, b1_docs, reg0, threshold=0.5)
    want = {(r.doc_id, r.dup_of) for r in direct.collect() if r.dup_of in half}
    got = {(r.doc_id, r.dup_of) for r in cross.collect()}
    assert got == want

    # replay: drained stream re-run adds no partitions or rows
    parts_before = sorted(glob.glob(f"{reg_p}/batch=*"))
    rows_before = spark.read.parquet(out_p).count()
    _run()
    assert sorted(glob.glob(f"{reg_p}/batch=*")) == parts_before
    assert spark.read.parquet(out_p).count() == rows_before

    # forced re-execution of an existing batch id: identical output (the
    # registry read excludes batch=1 itself, so no self-matching)
    reg_excl = read_registry(spark, reg_p, exclude_batch=1)
    replay_flags, replay_sigs = flag_batch(
        spark, b1_docs, reg_excl, threshold=0.5
    )
    replay_flags.write.mode("overwrite").parquet(f"{out_p}/batch=1")
    replay_sigs.write.mode("overwrite").parquet(f"{reg_p}/batch=1")
    assert spark.read.parquet(out_p).count() == rows_before
    assert read_registry(spark, reg_p).count() == n_docs_b0 + n_docs_b1
    docs.unpersist()
