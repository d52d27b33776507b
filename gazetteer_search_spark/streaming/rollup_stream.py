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


_COMPACT_MANIFEST = "compact_manifest.json"


def _live_batch_dirs(rollup_dir: str) -> list[str]:
    """Batch dir paths a reader may count, honoring the compaction
    manifest: superseded dirs (replaced by a committed compaction whose
    delete may have crashed) and ORPHAN compacted dirs (a compaction that
    crashed before its manifest commit) are both excluded — so a crash at
    any point of compact_rollup never double-counts and never loses data."""
    path = os.path.join(rollup_dir, _BATCHES)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("batch_id="))
    man_path = os.path.join(rollup_dir, _COMPACT_MANIFEST)
    active, superseded = None, set()
    if os.path.exists(man_path):
        import json

        with open(man_path) as f:
            man = json.load(f)
        active = man.get("active")
        superseded = set(man.get("superseded", ()))
    out = []
    for d in dirs:
        if d in superseded:
            continue
        if d.startswith("batch_id=compacted") and d != active:
            continue
        out.append(os.path.join(path, d))
    return out


def read_rollup(
    spark: SparkSession,
    rollup_dir: str,
    dims: list[str],
    metric_cols: list[str],
) -> DataFrame:
    """Consolidated rollup view over every LIVE batch's partials — feed
    this to operators.rollup.rollup_query for coarser re-aggregation."""
    raw = spark.read.parquet(*_live_batch_dirs(rollup_dir)).drop("batch_id")
    return _agg_partials(raw, dims, metric_cols)


def compact_rollup(
    spark: SparkSession,
    rollup_dir: str,
    dims: list[str],
    metric_cols: list[str],
) -> int:
    """Rewrite all live batch partials into one consolidated dir (the LSM
    compaction), crash-safe at every step:

    1. write the merged partials to a ``_compact_tmp`` dir (ignored by
       readers), 2. rename it to a UNIQUE ``batch_id=compacted_<id>`` dir
       (still ignored — not yet the manifest's active), 3. atomically
       commit ``compact_manifest.json`` naming the new active dir and the
       dirs it supersedes — THE commit point — then 4. delete superseded
       and orphan dirs (retried by the next compaction if interrupted).
       A crash before 3 leaves the old dirs live (the orphan is skipped
       and cleaned later); a crash after 3 leaves the new dir live and
       the superseded ones excluded by the manifest — never a double
       count, never a loss. Returns the consolidated row count."""
    import json
    import shutil
    import uuid

    path = os.path.join(rollup_dir, _BATCHES)
    old_names = [os.path.basename(p) for p in _live_batch_dirs(rollup_dir)]
    merged = read_rollup(spark, rollup_dir, dims, metric_cols)
    tmp = os.path.join(rollup_dir, "_compact_tmp")
    merged.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    new_name = f"batch_id=compacted_{uuid.uuid4().hex[:12]}"
    os.rename(tmp, os.path.join(path, new_name))
    # carry forward any prior superseded entries whose delete never ran
    man_path = os.path.join(rollup_dir, _COMPACT_MANIFEST)
    prev_superseded: set = set()
    if os.path.exists(man_path):
        with open(man_path) as f:
            prev_superseded = set(json.load(f).get("superseded", ()))
    superseded = sorted(
        set(old_names)
        | {d for d in prev_superseded if os.path.isdir(os.path.join(path, d))}
    )
    mtmp = man_path + ".tmp"
    with open(mtmp, "w") as f:
        json.dump({"active": new_name, "superseded": superseded}, f)
    os.replace(mtmp, man_path)  # the commit point
    live_after = {
        os.path.basename(p) for p in _live_batch_dirs(rollup_dir)
    }
    for d in os.listdir(path):
        if d.startswith("batch_id=") and d not in live_after:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
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
