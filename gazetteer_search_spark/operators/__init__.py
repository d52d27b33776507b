"""Large-scale training-data pipeline operators (first-class components beyond
the reference's own surface): deduplication, embedding similarity search,
text analysis, multimodal column plumbing. All native DataFrame ops or
Arrow-batched kernels — no per-row Python."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition a NARROW input up to the session's default
    parallelism when it arrives under-partitioned (guide §2.5 "input skew"
    — one huge unsplittable file / a single-row-group parquet yields ONE
    scan task, so every per-row kernel before the first exchange runs on
    one core). Operators whose first stage is expression- or UDF-heavy
    (tokenize, hashing, shingling) call this on their source; already-
    parallel inputs pass through untouched, so at cluster scale this is a
    no-op. Results are partitioning-independent (aggregations and joins
    downstream), so this never changes what an operator computes."""
    sc = df.sparkSession.sparkContext
    want = min_parts if min_parts is not None else sc.defaultParallelism
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want)
