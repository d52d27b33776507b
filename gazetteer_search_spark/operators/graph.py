"""Distributed connected components over duplicate-pair edges.

A near-dup pass (MinHash-LSH / SimHash / n-gram Jaccard — operators/dedup)
emits PAIRS; deduplication needs CLUSTERS: the transitive closure of the
pair relation, with one representative kept per cluster. At 100 TB the
closure cannot be driver-side union-find — components must converge in a
bounded number of DISTRIBUTED rounds regardless of component diameter
(boilerplate chains produce long paths: a->b->c->... where consecutive
docs are near-dups but the ends are not).

The alternating large-star / small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) converges in
O(log^2 n) rounds on ANY graph — each round is one shuffle (groupBy min +
join back), no collect, no per-node state on the driver. Every iteration
truncates lineage via (local)checkpoint so the driver loop cannot build an
unbounded plan.

Reference parity note: the reference's dedup is name-ordinal grouping
(single-key exact groups — see operators/dedup.exact_dup_groups); cluster
closure over NEAR-dup pairs is part of the LLM-training-pipeline surface
this engine adds beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_checkpoint(df: DataFrame) -> DataFrame:
    """Truncate lineage between iterations. Uses the reliable checkpoint dir
    when the application configured one (cluster deployments should:
    localCheckpoint pins executors and is lost on executor death);
    local/test runs fall back to localCheckpoint."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def _large_star(e: DataFrame) -> DataFrame:
    """large-star: every node u connects its LARGER neighbors to its
    minimum neighborhood label m(u) = min(N(u) + {u}). Input/output are
    SYMMETRIC edge sets (both directions present)."""
    mins = (
        e.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
    )
    out = (
        e.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return out.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).union(out.select(F.col("b").alias("u"), F.col("a").alias("v"))).distinct()


def _small_star(e: DataFrame) -> DataFrame:
    """small-star: every node u connects its smaller-or-self closure to the
    minimum: with D = {(u,v): v < u}, emit (v, m(u)) for v in G-(u) + {u},
    v != m(u). Returns the DIRECTED star edges (a > b always)."""
    d = e.filter(F.col("v") < F.col("u"))
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    joined = d.join(mins, "u")
    out = (
        joined.select(F.col("v").alias("a"), F.col("m").alias("b"))
        .union(mins.select(F.col("u").alias("a"), F.col("m").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return out


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, comp) for every node that appears in ``pairs``; ``comp`` is the
    MINIMUM node id of the node's connected component (so comp is a stable,
    deterministic representative). Alternating large-star/small-star until
    the star output is a TRUE disjoint star forest: flat (no parent is also
    a child) AND parent-unique (no child keeps two parents — a two-parent
    node is a live bridge between two not-yet-merged roots, so flatness
    alone stops early and splits the component). Both checks are
    distributed counts — never a driver-side union-find."""
    e0 = (
        pairs.select(
            F.col(a_col).cast("long").alias("u"),
            F.col(b_col).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = e0.union(e0.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    e = _star_checkpoint(e)
    stars = None
    for _ in range(max_iter):
        e = _star_checkpoint(_large_star(e))
        stars = _star_checkpoint(_small_star(e))
        # converged iff stars is a disjoint star forest:
        #   (1) flat — no parent (b) is itself a child (a)
        #   (2) parent-unique — no child points at two parents (two parents
        #       witness an un-merged path between two roots, e.g. the graph
        #       {5-6, 5-7, 1-6, 2-7} flattens to {(5,1),(5,2),(6,1),(7,2)}
        #       after one round: flat, but 5 still bridges roots 1 and 2)
        children = stars.select(F.col("a").alias("n")).distinct()
        flat_viol = (
            stars.select(F.col("b").alias("n")).distinct()
            .join(children, "n", "left_semi")
            .select(F.lit(1).alias("one"))
        )
        multi_parent_viol = (
            stars.groupBy("a")
            .agg(F.count_distinct("b").alias("nb"))
            .filter(F.col("nb") > 1)
            .select(F.lit(1).alias("one"))
        )
        # one early-exit action over the (checkpointed) stars, not two counts
        if flat_viol.unionByName(multi_parent_viol).isEmpty():
            break
        e = (
            stars.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .union(stars.select(F.col("b").alias("u"), F.col("a").alias("v")))
            .distinct()
        )
    else:
        raise RuntimeError(
            f"connected_components: no convergence in {max_iter} rounds"
        )
    comps = stars.select(F.col("a").alias("node"), F.col("b").alias("comp"))
    roots = (
        comps.select(F.col("comp").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    return comps.union(roots).distinct()


def dup_clusters(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Cluster view of a near-dup pair set: (node, comp, cluster_size,
    is_representative). Representative = minimum doc id of the cluster
    (deterministic across runs and cluster sizes)."""
    cc = connected_components(pairs, a_col, b_col, max_iter)
    sizes = cc.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "comp").select(
        "node",
        "comp",
        "cluster_size",
        (F.col("node") == F.col("comp")).alias("is_representative"),
    )


def dedup_by_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Drop every non-representative member of every near-dup cluster: rows
    absent from ``pairs`` survive untouched; within a cluster only the
    minimum id survives. One broadcast-or-shuffle left join against the
    (small) cluster assignment — the assignment is bounded by the number of
    DUPLICATED docs, not corpus size."""
    cc = connected_components(pairs, a_col, b_col)
    drop = cc.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")
