"""Numeric aggregations (ES histogram / stats / percentiles / cardinality
analogs; the reference's aggregation surface is terms-buckets only — see
textstats.tag_statistics — so these widen the family the way ES does).

All native Catalyst expressions: one hash aggregation per call, map-side
partial aggregation for free, no UDF. The cardinality op exposes both the
exact form (count distinct — one shuffle on the value) and the HLL sketch
(approx_count_distinct — no per-value shuffle, mergeable across partitions)
— at 100 TB the sketch is the default, exact is the auditable twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def histogram(df: DataFrame, col: str, interval: float) -> DataFrame:
    """ES histogram agg: fixed-interval buckets keyed by their lower bound
    (empty buckets omitted — ES min_doc_count=1 shape). NULLs drop, exactly
    like ES ignoring missing values."""
    if interval <= 0:
        raise ValueError(f"interval must be positive, got {interval}")
    bucket = (
        F.floor(F.col(col) / F.lit(interval)) * F.lit(interval)
    ).cast("double")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy("bucket")
    )


def numeric_stats(
    df: DataFrame, col: str, percentiles: tuple[float, ...] = (0.5, 0.95)
) -> DataFrame:
    """ES stats + percentiles aggs in one row: count / min / max / sum /
    avg plus exact linear-interpolation percentiles (the ES TDigest analog;
    Spark's ``percentile`` is the exact form — at sketch-appropriate scale
    swap in ``percentile_approx`` with the same call shape)."""
    aggs = [
        F.count(col).alias("n"),
        F.min(col).alias("mn"),
        F.max(col).alias("mx"),
        F.sum(col).alias("total"),
        F.round(F.avg(col), 6).alias("mean"),
    ]
    for p in percentiles:
        # %g label: float-exact for the common grid (0.29 -> p29, not the
        # int()-truncated p28) and collision-free for finer ones
        # (0.999 -> p99_9 vs 0.99 -> p99)
        label = f"p{p * 100:g}".replace(".", "_")
        aggs.append(
            F.round(F.percentile(F.col(col), F.lit(p)), 6).alias(label)
        )
    return df.agg(*aggs)


def cardinality(
    df: DataFrame, col: str, exact: bool = True, rsd: float = 0.05
) -> DataFrame:
    """ES cardinality agg: distinct-value count of a column. ``exact=True``
    is count(DISTINCT col) — one shuffle keyed by the value, auditable;
    ``exact=False`` is the HLL++ sketch (approx_count_distinct at relative
    standard deviation ``rsd``) — constant memory, partial-merge friendly,
    the 100-TB default exactly as in ES."""
    agg = (
        F.count_distinct(F.col(col))
        if exact
        else F.approx_count_distinct(col, rsd)
    )
    return df.agg(agg.alias("cardinality"))
