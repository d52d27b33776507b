"""Streaming rollup maintenance — continuous downsampling of an event
stream into persisted rollup partials (operators/rollup.py's algebra).

The 100-TB shape: raw events land continuously; every micro-batch folds
into hourly partials so coarse dashboards never scan raw data. Crash
safety drives the layout — the same LSM discipline the index's segment
generations use:

- Each micro-batch writes ITS OWN partials under
  ``batches/batch_id=N/`` with mode=overwrite. A replayed batch (crash
  before the checkpoint commit) simply overwrites its own directory —
  byte-idempotent, no read-modify-write of shared state, so a crash at
  ANY point double-counts nothing. (The earlier design merged into
  shared bucket partitions per batch; a crash between the partition
  overwrite and the checkpoint commit would re-merge an already-merged
  batch — the classic non-idempotent-merge hazard. Append-only batch
  partials eliminate it.)
- Partials are DECOMPOSABLE (count/sum/min/max), so the consolidated
  view is one re-aggregation over the batch partials (``read_rollup``)
  — exact by algebra; ``compact_rollup`` rewrites many batch dirs into
  one when the batch count grows (the LSM compaction step).
- ``Trigger.AvailableNow`` drains everything unprocessed then stops;
  the checkpoint makes file pickup exactly-once across restarts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gazetteer_search_spark.streaming.events import read_events_stream

_BATCHES = "batches"


def _agg_partials(
    df: DataFrame, dims: list[str], metric_cols: list[str]
) -> DataFrame:
    """Re-aggregate partial rows sharing (bucket, dims) — the decomposable
    combine: sum of counts/sums, min of mins, max of maxes."""
    aggs = [F.sum("doc_count").alias("doc_count")]
    for m in metric_cols:
        aggs += [
            F.sum(f"{m}_sum").alias(f"{m}_sum"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
        ]
    return df.groupBy("bucket", *[F.col(d) for d in dims]).agg(*aggs)


def read_rollup(
    spark: SparkSession,
    rollup_dir: str,
    dims: list[str],
    metric_cols: list[str],
) -> DataFrame:
    """Consolidated rollup view over every batch's partials — feed this to
    operators.rollup.rollup_query for coarser re-aggregation."""
    path = os.path.join(rollup_dir, _BATCHES)
    raw = spark.read.parquet(path).drop("batch_id")
    return _agg_partials(raw, dims, metric_cols)


def compact_rollup(
    spark: SparkSession,
    rollup_dir: str,
    dims: list[str],
    metric_cols: list[str],
) -> int:
    """Rewrite all batch partials into one consolidated batch dir (the
    LSM compaction): write to a fresh temp batch id, then drop the old
    dirs. Returns the consolidated row count."""
    import shutil

    path = os.path.join(rollup_dir, _BATCHES)
    old = [
        d for d in os.listdir(path) if d.startswith("batch_id=")
    ]
    merged = read_rollup(spark, rollup_dir, dims, metric_cols)
    tmp = os.path.join(rollup_dir, "_compact_tmp")
    merged.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    for d in old:
        shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    os.rename(tmp, os.path.join(path, "batch_id=compacted"))
    return n


def stream_rollup(
    spark: SparkSession,
    events_dir: str,
    rollup_dir: str,
    checkpoint: str,
    dims: list[str],
    metric_cols: list[str],
    interval: str = "hour",
    ts_col: str = "ts",
    compact_threshold: int | None = 16,
) -> dict:
    """Drain every unprocessed event file into per-batch rollup partials
    (Trigger.AvailableNow). Returns {"batches": N, "rollup_rows": M,
    "compacted": bool} with M the CONSOLIDATED bucket count.

    ``compact_threshold``: when the drain leaves more than this many
    batch dirs, run ``compact_rollup`` afterwards (the LSM compaction
    policy — read amplification stays bounded no matter how many
    micro-batches have landed). None disables."""
    from gazetteer_search_spark.operators.rollup import build_rollup

    state = {"batches": 0}

    def _fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        partials = build_rollup(
            batch, ts_col, dims, metric_cols, interval
        )
        (
            partials.write.mode("overwrite").parquet(
                os.path.join(
                    rollup_dir, _BATCHES, f"batch_id={int(batch_id)}"
                )
            )
        )
        state["batches"] += 1

    q = (
        read_events_stream(spark, events_dir)
        .writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    bdir = os.path.join(rollup_dir, _BATCHES)
    compacted = False
    if (
        compact_threshold is not None
        and os.path.exists(bdir)
        and sum(1 for d in os.listdir(bdir) if d.startswith("batch_id="))
        > compact_threshold
    ):
        compact_rollup(spark, rollup_dir, dims, metric_cols)
        compacted = True
    n = (
        read_rollup(spark, rollup_dir, dims, metric_cols).count()
        if os.path.exists(bdir)
        else 0
    )
    return {
        "batches": state["batches"],
        "rollup_rows": n,
        "compacted": compacted,
    }
