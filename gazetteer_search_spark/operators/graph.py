"""Distributed connected components over duplicate-pair edges.

A near-dup pass (MinHash-LSH / SimHash / n-gram Jaccard — operators/dedup)
emits PAIRS; deduplication needs CLUSTERS: the transitive closure of the
pair relation, with one representative kept per cluster. At 100 TB the
closure cannot be driver-side union-find — components must converge in a
bounded number of DISTRIBUTED rounds regardless of component diameter
(boilerplate chains produce long paths: a->b->c->... where consecutive
docs are near-dups but the ends are not).

Round-6 optimization notes (spark_optimization_guide §2.3/§2.4 — shuffle
fewer bytes, remove shuffles outright):

- Edges are carried in NORMALIZED form (lo < hi), one row per undirected
  edge, instead of the symmetric doubled set. Every aggregation that needs
  both directions reads the frame twice (a free union — no shuffle) and
  the per-iteration ``distinct`` passes over the doubled set disappear:
  each star round now costs one min-aggregation, one join and one
  distinct over HALF the rows the round-5 form shuffled.
- A MIN-CONTRACTION pre-round runs before the star loop: map every node
  to m(v) = min(N(v) + {v}) (one aggregation), rewrite each edge to
  (m(lo), m(hi)) and drop self-loops. A clique — the dominant shape of a
  near-dup pair set, where a group of mutual duplicates emits all
  O(g^2) pairs — collapses to NOTHING in this single round (every member
  maps to the clique minimum, every edge becomes a self-loop), so the
  alternating-star loop runs on the small residual graph. m(v) maps a
  node into its own component and the component minimum is a fixed point
  (m(min) = min), so composing the final labels through m is exact — the
  contracted graph's component-minimum IS the original's.

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


def _sym_min(e: DataFrame) -> DataFrame:
    """(n, m) with m = min(N(n) + {n}) over a NORMALIZED (lo < hi) edge set.
    Both directions come from ONE scan that explodes each edge into its two
    orientations (the union form read the frame twice — on the huge raw
    pair set that is two full passes over a multi-hundred-million-row
    cache; guide §2.4). The single aggregation does map-side partial
    mins over the exploded rows, so nothing wider than (n, v) shuffles."""
    nbrs = e.select(
        F.explode(
            F.array(
                F.struct(F.col("lo").alias("n"), F.col("hi").alias("v")),
                F.struct(F.col("hi").alias("n"), F.col("lo").alias("v")),
            )
        ).alias("_s")
    ).select("_s.n", "_s.v")
    return (
        nbrs.groupBy("n")
        .agg(F.min("v").alias("mn"))
        .select("n", F.least(F.col("mn"), F.col("n")).alias("m"))
    )


def _large_star(e: DataFrame) -> DataFrame:
    """large-star over normalized edges: every node u connects its LARGER
    neighbors to its minimum neighborhood label m(u). For a normalized edge
    (lo, hi) the only larger-neighbor row is (u=lo, v=hi), so the emit join
    keys on lo; m(lo) <= lo < hi keeps the output normalized (lo'=m,
    hi'=old hi) with zero re-ordering work."""
    mins = _sym_min(e)
    return (
        e.join(mins, e.lo == mins.n)
        .select(F.col("m").alias("lo"), F.col("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """small-star over normalized edges: with D = {(u,v): v < u} (i.e. u=hi,
    v=lo), emit (v, m(u)) for v in smaller-neighbors(u) + {u}, v != m(u).
    Output is DIRECTED star edges (a > b always), returned as normalized
    (lo=b=parent, hi=a=child)."""
    mins = e.groupBy("hi").agg(F.min("lo").alias("m"))
    joined = e.join(mins, "hi")
    out = (
        joined.select(F.col("m").alias("lo"), F.col("lo").alias("hi"))
        .union(mins.select(F.col("m").alias("lo"), F.col("hi")))
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    return out


def _alternating_star(e: DataFrame, max_iter: int) -> DataFrame:
    """(node, comp) for every node of the normalized edge set ``e`` —
    alternating large-star/small-star until the star output is a TRUE
    disjoint star forest: flat (no parent is also a child) AND
    parent-unique (no child keeps two parents — a two-parent node is a
    live bridge between two not-yet-merged roots, so flatness alone stops
    early and splits the component). Both checks are distributed counts —
    never a driver-side union-find."""
    stars = None
    for _ in range(max_iter):
        # eager checkpoint: _small_star reads e twice (min-agg + join back),
        # so materializing once beats recomputing the large-star join per
        # branch; checkpointing also truncates the loop's lineage
        e = _star_checkpoint(_large_star(e))
        stars = _star_checkpoint(_small_star(e))
        # converged iff stars is a disjoint star forest:
        #   (1) flat — no parent (lo) is itself a child (hi)
        #   (2) parent-unique — no child points at two parents (two parents
        #       witness an un-merged path between two roots, e.g. the graph
        #       {5-6, 5-7, 1-6, 2-7} flattens to {(5,1),(5,2),(6,1),(7,2)}
        #       after one round: flat, but 5 still bridges roots 1 and 2)
        children = stars.select(F.col("hi").alias("n")).distinct()
        flat_viol = (
            stars.select(F.col("lo").alias("n")).distinct()
            .join(children, "n", "left_semi")
            .select(F.lit(1).alias("one"))
        )
        multi_parent_viol = (
            stars.groupBy("hi")
            .agg(F.count_distinct("lo").alias("nb"))
            .filter(F.col("nb") > 1)
            .select(F.lit(1).alias("one"))
        )
        # one early-exit action over the (checkpointed) stars, not two counts
        if flat_viol.unionByName(multi_parent_viol).isEmpty():
            break
        e = stars
    else:
        raise RuntimeError(
            f"connected_components: no convergence in {max_iter} rounds"
        )
    comps = stars.select(F.col("hi").alias("node"), F.col("lo").alias("comp"))
    roots = (
        comps.select(F.col("comp").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    return comps.union(roots).distinct()


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, comp) for every node that appears in ``pairs``; ``comp`` is the
    MINIMUM node id of the node's connected component (so comp is a stable,
    deterministic representative).

    One min-contraction round (clique collapse) feeds the alternating
    large-star/small-star loop; the final labels compose through the
    contraction map. Exact — not an approximation: the output is the same
    (node, component-min) relation whichever algorithm computes it."""
    a = F.col(a_col).cast("long")
    b = F.col(b_col).cast("long")
    # NO distinct / checkpoint of the raw edge set: duplicates are harmless
    # to the min-aggregation below, and the contraction's own distinct runs
    # AFTER the self-loop filter has dropped the (dominant) intra-clique
    # mass map-side — a near-dup pair listing is orders of magnitude larger
    # than its contracted residue, so materializing it here would be the
    # single biggest cost of the whole closure (measured: the r5 form's
    # distinct+checkpoint of a 233M-row pair set). persist() lets the two
    # passes (min-agg + contraction join) share one scan of the input.
    e0 = pairs.select(
        F.least(a, b).alias("lo"), F.greatest(a, b).alias("hi")
    ).filter(F.col("lo") != F.col("hi"))
    # cache e0 only when the caller's pair set is NOT already cached:
    # normalizing from a cached input is a map-side projection, and a second
    # copy of a multi-hundred-million-row edge set would evict or spill the
    # first (measured +10s on the sf1.0 closure when double-cached)
    _own_persist = not (
        pairs.storageLevel.useMemory or pairs.storageLevel.useDisk
    )
    if _own_persist:
        e0 = e0.persist()
    # min-contraction: m maps every node into its component; cliques (all
    # near-dup groups that emitted full pairwise edges) vanish here
    m = _star_checkpoint(_sym_min(e0))
    # m is NODE-sized (one row per distinct node) — when it fits the
    # broadcast budget the contraction join is map-only and the huge edge
    # set is never shuffled at all (guide §3.1); past the budget AQE picks
    # the join strategy as usual. Either path is exact.
    n_nodes = m.count()
    m_lo = m.select(F.col("n").alias("lo"), F.col("m").alias("_mlo"))
    m_hi = m.select(F.col("n").alias("hi"), F.col("m").alias("_mhi"))
    if n_nodes <= 4_000_000:
        m_lo, m_hi = F.broadcast(m_lo), F.broadcast(m_hi)
    ce = (
        e0.join(m_lo, "lo")
        .join(m_hi, "hi")
        .select(
            F.least(F.col("_mlo"), F.col("_mhi")).alias("lo"),
            F.greatest(F.col("_mlo"), F.col("_mhi")).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    ce = _star_checkpoint(ce)
    if _own_persist:
        e0.unpersist()
    if ce.isEmpty():
        # the contraction alone resolved every component (pure clique/star
        # input): every node's label is m(v), roots label themselves
        return m.select(F.col("n").alias("node"), F.col("m").alias("comp"))
    sub = _alternating_star(ce, max_iter)
    # compose: comp(v) = sub_comp(m(v)), defaulting to m(v) when the
    # contracted supernode kept no edges (its whole component contracted
    # into it). m(min) = min, so component minima survive composition.
    return (
        m.join(sub, m.m == sub.node, "left")
        .select(
            F.col("n").alias("node"),
            F.coalesce(F.col("comp"), F.col("m")).alias("comp"),
        )
    )


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
