"""Time-series rollup (ES rollup-job / downsampling API analog).

The 100-TB pattern behind it: raw event tables are append-heavy and
queried by coarse time buckets; a persisted rollup at the finest useful
interval makes every compatible coarser query read O(buckets) instead of
O(events). This module is the batch shape of that contract:

- ``build_rollup``: ONE hash aggregation over the raw table grouped by
  (date_trunc(interval), *dims) carrying count + per-metric sum/min/max —
  the partial-aggregate set every coarser query can be EXACTLY rebuilt
  from (count/sum/min/max are decomposable; avg derives as sum/count).
  Written parquet, partitioned by the bucket date for pruning.
- ``rollup_query``: re-aggregate the rollup to any coarser calendar
  interval and dim subset — a hash agg over bucket rows, never the raw
  table. Correctness is a pure algebra fact (sum of sums, min of mins),
  which the oracle harness verifies by computing the same answer straight
  from the raw events.

Non-decomposable metrics (exact percentiles, distinct counts) need
sketches (t-digest / HLL) — out of scope here; Spark's
``approx_count_distinct`` partials are the natural extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gazetteer_search_spark.operators.aggs import _CALENDAR_INTERVALS

#: fineness order for compatibility checks
_ORDER = {iv: i for i, iv in enumerate(_CALENDAR_INTERVALS)}


def build_rollup(
    df: DataFrame,
    ts_col: str,
    dims: list[str],
    metric_cols: list[str],
    interval: str = "hour",
    out_dir: str | None = None,
) -> DataFrame:
    """Aggregate raw events to a rollup at ``interval`` granularity.
    Output: (bucket, *dims, doc_count, {m}_sum, {m}_min, {m}_max per
    metric). With ``out_dir``, also writes parquet partitioned by
    ``bucket_date`` (partition pruning for time-ranged rollup reads)."""
    if interval not in _CALENDAR_INTERVALS:
        raise ValueError(
            f"interval must be one of {_CALENDAR_INTERVALS}, got {interval!r}"
        )
    # partials stay UNROUNDED — rounding belongs to the final query's
    # output (a rounded partial re-summed across buckets can drift past
    # the final rounding boundary vs the raw-table answer)
    aggs = [F.count("*").alias("doc_count")]
    for m in metric_cols:
        c = F.col(m).cast("double")
        aggs += [
            F.sum(c).alias(f"{m}_sum"),
            F.min(c).alias(f"{m}_min"),
            F.max(c).alias(f"{m}_max"),
        ]
    out = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(
            F.date_trunc(interval, F.col(ts_col)).alias("bucket"),
            *[F.col(d) for d in dims],
        )
        .agg(*aggs)
    )
    if out_dir is not None:
        (
            out.withColumn("bucket_date", F.to_date("bucket"))
            .write.mode("overwrite")
            .partitionBy("bucket_date")
            .parquet(out_dir)
        )
        spark = df.sparkSession
        return spark.read.parquet(out_dir).drop("bucket_date")
    return out


def rollup_query(
    rollup: DataFrame,
    interval: str,
    dims: list[str],
    metric_cols: list[str],
    rollup_interval: str = "hour",
) -> DataFrame:
    """Answer a (interval, dims) aggregation FROM the rollup: re-bucket the
    rollup's buckets with the coarser truncation and combine the partials
    (sum of counts/sums, min of mins, max of maxes; avg = sum/count).
    Raises when the requested interval is FINER than the rollup's — that
    query needs the raw table."""
    if interval not in _CALENDAR_INTERVALS:
        raise ValueError(
            f"interval must be one of {_CALENDAR_INTERVALS}, got {interval!r}"
        )
    if _ORDER[interval] < _ORDER[rollup_interval]:
        raise ValueError(
            f"rollup at {rollup_interval!r} cannot answer a finer "
            f"{interval!r} query — use the raw table"
        )
    if rollup_interval == "week" and interval != "week":
        # weeks do NOT nest into months/years (a week straddling Feb 1
        # would be assigned whole to January) — the re-bucketing algebra
        # is exact only for hierarchical pairs
        raise ValueError(
            "a week-grained rollup cannot re-bucket to "
            f"{interval!r}: ISO weeks straddle month/year boundaries — "
            "build the rollup at day grain or coarser-aligned"
        )
    aggs = [F.sum("doc_count").alias("doc_count")]
    for m in metric_cols:
        aggs += [
            F.sum(f"{m}_sum").alias(f"_{m}_sum_raw"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
        ]
    out = (
        rollup.groupBy(
            F.date_trunc(interval, F.col("bucket")).alias("bucket"),
            *[F.col(d) for d in dims],
        )
        .agg(*aggs)
    )
    final = [F.col("bucket"), *[F.col(d) for d in dims], F.col("doc_count")]
    for m in metric_cols:
        final += [
            F.round(F.col(f"_{m}_sum_raw"), 6).alias(f"{m}_sum"),
            F.col(f"{m}_min"),
            F.col(f"{m}_max"),
            F.round(
                F.col(f"_{m}_sum_raw") / F.col("doc_count"), 6
            ).alias(f"{m}_avg"),
        ]
    return out.select(*final).orderBy("bucket", *dims)
