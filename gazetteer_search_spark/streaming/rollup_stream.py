"""Streaming rollup maintenance — continuous downsampling of an event
stream into the persisted rollup of operators/rollup.py.

The 100-TB shape: raw events land continuously; every micro-batch folds
into the hourly partials so coarse dashboards never scan raw data. The
partials are DECOMPOSABLE (count/sum/min/max), so maintenance is pure
merge arithmetic per touched bucket:

1. ``foreachBatch``: aggregate THIS micro-batch to (bucket, dims)
   partials — a batch hash agg over only the new rows.
2. Read the existing rollup rows for the touched ``bucket_date``
   partitions ONLY (partition pruning on the hive layout), combine with
   the batch partials (sum counts/sums, min mins, max maxes), and
   dynamic-partition-overwrite just those partitions — untouched history
   is never rewritten.
3. The checkpoint makes file pickup exactly-once: a restart re-processes
   no committed batch, so partials never double-count (asserted by the
   restart test).

``Trigger.AvailableNow`` drains everything currently unprocessed then
stops — the incremental-batch operational mode; a continuous trigger is
the same code with a different trigger argument.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gazetteer_search_spark.streaming.events import read_events_stream


def _batch_partials(
    batch: DataFrame, ts_col: str, dims: list[str], metric_cols: list[str],
    interval: str,
) -> DataFrame:
    from gazetteer_search_spark.operators.rollup import build_rollup

    return build_rollup(batch, ts_col, dims, metric_cols, interval)


def _merge_partials(
    old: DataFrame, new: DataFrame, dims: list[str], metric_cols: list[str]
) -> DataFrame:
    keys = ["bucket", *dims]
    aggs = [F.sum("doc_count").alias("doc_count")]
    for m in metric_cols:
        aggs += [
            F.sum(f"{m}_sum").alias(f"{m}_sum"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
        ]
    return old.unionByName(new).groupBy(*keys).agg(*aggs)


def stream_rollup(
    spark: SparkSession,
    events_dir: str,
    rollup_dir: str,
    checkpoint: str,
    dims: list[str],
    metric_cols: list[str],
    interval: str = "hour",
    ts_col: str = "ts",
) -> dict:
    """Drain every unprocessed event file into the rollup
    (Trigger.AvailableNow), merging partials per touched bucket-date
    partition. Returns {"batches": N, "rollup_rows": M}."""
    state = {"batches": 0}

    def _fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        newp = _batch_partials(
            batch, ts_col, dims, metric_cols, interval
        ).withColumn("bucket_date", F.to_date("bucket"))
        newp = newp.persist()
        touched = [
            r.bucket_date for r in
            newp.select("bucket_date").distinct().collect()
        ]
        sp = batch.sparkSession
        if os.path.exists(os.path.join(rollup_dir, "_started")):
            old = (
                sp.read.parquet(rollup_dir)
                .filter(F.col("bucket_date").isin(touched))
                .drop("bucket_date")
            )
            merged = _merge_partials(
                old, newp.drop("bucket_date"), dims, metric_cols
            ).withColumn("bucket_date", F.to_date("bucket"))
        else:
            merged = newp
        prev = sp.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        sp.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                merged.write.mode("overwrite")
                .partitionBy("bucket_date")
                .parquet(rollup_dir)
            )
        finally:
            sp.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        open(os.path.join(rollup_dir, "_started"), "w").close()
        newp.unpersist()
        state["batches"] += 1

    q = (
        read_events_stream(spark, events_dir)
        .writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = (
        spark.read.parquet(rollup_dir).count()
        if os.path.exists(os.path.join(rollup_dir, "_started"))
        else 0
    )
    return {"batches": state["batches"], "rollup_rows": n}
