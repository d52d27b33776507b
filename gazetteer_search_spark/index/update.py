"""Partial-document update sink (S5) — MERGE-shaped docs-table maintenance.

Analog of the reference's update-by-partial-document jobs that write derived
columns back onto already-imported docs (UpdateStreetsUsage.java:104-113
fills per-street usage counts; UpdatePOITagsAndClasses.run() rewrites POI
tags) — there via ES partial-document bulk updates, here as a Spark
join-overwrite at PARTITION granularity:

    derived(doc_id, col...)  ->  touched doc_parts = distinct(doc_id % P)
    base = docs rows of touched partitions only
    merged = base LEFT JOIN derived  (missing rows keep their old values)
    dynamic partition overwrite     (untouched partitions' files never move)

At 100 TB the docs table is thousands of doc_part partitions and a typical
maintenance pass touches few of them — the rewrite cost scales with the
update's footprint, not the corpus. The merged frame is locally checkpointed
before the overwrite to cut the self-read lineage (on a cluster you would
point REPLACE-style staging or checkpoint dir at reliable storage; the
partition-granular commit semantics are identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def update_docs_columns(
    spark: SparkSession,
    docs_path: str,
    derived: DataFrame,
    key: str = "doc_id",
    n_doc_parts: int = 16,
) -> list[int]:
    """Merge ``derived``'s non-key columns onto the docs table at
    ``docs_path``; rows absent from ``derived`` keep their current values.
    Returns the list of partitions rewritten (the maintenance metric the
    reference logs per update run)."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    docs = spark.read.parquet(docs_path)
    upd_cols = [c for c in derived.columns if c != key]
    if not upd_cols:
        raise ValueError("derived must carry at least one non-key column")

    touched = sorted(
        r.doc_part
        for r in derived.select(
            F.pmod(F.col(key), F.lit(n_doc_parts)).cast("int").alias("doc_part")
        )
        .distinct()
        .collect()
    )
    if not touched:
        return []

    base = docs.filter(F.col("doc_part").isin(touched))
    renamed = derived.select(
        key, *[F.col(c).alias(f"__new_{c}") for c in upd_cols]
    )
    merged = base.join(renamed, key, "left")
    for c in upd_cols:
        merged = merged.withColumn(
            c, F.coalesce(F.col(f"__new_{c}"), F.col(c))
        ).drop(f"__new_{c}")
    out = merged.select(*docs.columns)
    # cut the self-read lineage so the dynamic overwrite of the same path is
    # legal; only the touched partitions are materialized
    out = out.localCheckpoint(eager=True)
    (
        out.sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy("doc_part")
        .parquet(docs_path)
    )
    return touched
