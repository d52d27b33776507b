"""Deterministic content-addressed sampling operators.

Training-data pipelines down-sample over-represented strata (language,
source, quality band) and need the decision to be REPRODUCIBLE — the same
row must land in the sample on every run, on every cluster size, with no
RNG state. These operators key the decision on a hash of a stable row key:
keep row iff hash(key) mod M < rate*M. That makes sampling a pure map-side
filter (no shuffle, no driver state), composable with any downstream op,
and re-runnable incrementally (new data gets sampled consistently without
touching old decisions).

Hash families come from dedup.hash64_col: ``xxhash64`` is the JVM-native
scale default; ``md5_60`` is bit-identical to DuckDB's
('0x' || substr(md5(x),1,15))::BIGINT, which lets the ANSI-SQL oracle
recompute the exact sample membership independently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gazetteer_search_spark.operators.dedup import hash64_col

MODULUS = 1_000_000


def _bucket(key_col: str, salt: int, hash_fn: str):
    """Uniform bucket in [0, MODULUS) from a stable row key + salt. The salt
    decorrelates independent samples over the same corpus (e.g. a held-out
    split must not be a subset of the training sample)."""
    h = hash64_col(hash_fn, F.col(key_col).cast("string"), F.lit(str(salt)))
    return F.pmod(h, F.lit(MODULUS))


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    salt: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows, keyed on ``key_col``."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.filter(_bucket(key_col, salt, hash_fn) < int(rate * MODULUS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    key_col: str = "doc_id",
    salt: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic sampling: each value of ``strata_col`` keeps
    its own fraction (e.g. ``{"en": 0.1, "zh": 1.0}`` down-samples English
    10x while keeping all Chinese). Strata absent from ``rates`` use
    ``default_rate``. Pure map-side filter — the per-stratum threshold is a
    CASE expression, so no join, shuffle, or driver-side stratum loop; skewed
    strata cost nothing beyond the scan."""
    for v, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {v!r} must be in [0,1], got {r}")
    thr = F.lit(int(default_rate * MODULUS))
    for value in sorted(rates):
        thr = F.when(
            F.col(strata_col) == value, F.lit(int(rates[value] * MODULUS))
        ).otherwise(thr)
    return df.filter(_bucket(key_col, salt, hash_fn) < thr)


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    shares: dict[str, float],
    key_col: str = "doc_id",
    salt: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Sample DOWN to a target mixture (the domain-weighting step of a
    training-data pipeline: "the output must be 50% en / 30% fr / 20% zh"):
    the largest achievable output is T = min over strata of count_s /
    share_s (the bottleneck stratum is kept whole), per-stratum keep rates
    are share_s * T / count_s, and membership is the same deterministic
    content-addressed filter as stratified_sample. Strata absent from
    ``shares`` drop entirely. One dict-sized count aggregation on the
    driver (strata are domains — bounded), then a pure map-side filter."""
    if not shares:
        raise ValueError("mixture_sample: shares must be non-empty")
    for v, p in shares.items():
        if p <= 0:
            raise ValueError(f"share for {v!r} must be positive, got {p}")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).count().collect()
        if r[0] in shares
    }
    if not counts:
        raise ValueError(
            f"mixture_sample: no rows in any requested stratum {sorted(shares)}"
        )
    t = min(counts[s] / shares[s] for s in counts)
    # the bottleneck stratum's rate is 1.0 by construction but can float-
    # round a hair above (e.g. 0.3 * (7 / 0.3) / 7 = 1.0000000000000002) —
    # clamp; the integer threshold is unchanged (int(1.0 * M) == M)
    rates = {s: min(1.0, shares[s] * t / counts[s]) for s in counts}
    return stratified_sample(
        df, strata_col, rates, default_rate=0.0,
        key_col=key_col, salt=salt, hash_fn=hash_fn,
    )


def weighted_sample(
    df: DataFrame,
    rate_col: str | Column,
    key_col: str = "doc_id",
    salt: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Importance resampling (DSIR-style): keep each row with its OWN
    probability — ``rate_col`` is a per-row keep rate in [0, 1] (a quality
    classifier score, an importance weight ratio, a per-domain factor),
    applied through the same deterministic content-addressed filter as
    :func:`hash_sample`, so membership is reproducible, incremental-safe,
    and a pure map-side predicate (the CASE-threshold form of
    stratified_sample generalized from per-stratum constants to an
    arbitrary per-row expression). Rates outside [0, 1] clamp; NULL rates
    drop the row."""
    r = F.col(rate_col) if isinstance(rate_col, str) else rate_col
    thr = F.least(
        F.lit(float(MODULUS)),
        F.greatest(F.lit(0.0), r * F.lit(float(MODULUS))),
    )
    return df.filter(_bucket(key_col, salt, hash_fn) < thr)


def diversified_sample(
    df: DataFrame,
    order_col: str,
    diversity_col: str | None = None,
    max_per_value: int = 1,
    size: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``sampler`` / ``diversified_sampler`` agg analog: the best ``size``
    rows by ``order_col`` (descending; ties break ``id_col``-ascending so the
    sample is reproducible), with at most ``max_per_value`` rows sharing any
    one value of ``diversity_col`` — the de-biasing cap ES puts under its
    significance/terms aggs so one over-represented source cannot dominate
    the sample. ``diversity_col=None`` is the plain sampler (rank cut only).
    Rows with a NULL diversity value drop (ES missing-bucket semantics).

    Scale shape: one window partitioned by the diversity value applies the
    per-value cap BEFORE the global cut, so the final ordering sees at most
    |values| x max_per_value rows; the cut itself is a TakeOrdered — the
    corpus never fully sorts. No UDF, no driver state."""
    if max_per_value < 1:
        raise ValueError(
            f"max_per_value must be >= 1, got {max_per_value}"
        )
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    order = [F.col(order_col).desc(), F.col(id_col).asc()]
    out = df
    if diversity_col is not None:
        w = Window.partitionBy(diversity_col).orderBy(*order)
        out = (
            df.filter(F.col(diversity_col).isNotNull())
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= F.lit(int(max_per_value)))
            .drop("_rn")
        )
    return out.orderBy(*order).limit(size)


def select_to_budget(
    df: DataFrame,
    budget: int,
    order_col: str,
    token_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Token-budget corpus selection: the maximal quality-ranked PREFIX of
    the corpus whose token sum fits ``budget`` — "fill a 10B-token training
    budget with the best documents first". A row is kept iff its running
    token total in (``order_col`` desc, ``id_col`` asc) order is <= budget
    (greedy prefix, the knapsack-free form every data-curation pipeline
    uses; rows with a NULL order or token value drop). Deterministic: the
    same corpus selects identically at any parallelism.

    Scale shape — a DISTRIBUTED PREFIX SUM, never the naive global window
    (``sum() OVER (ORDER BY ...)`` collapses the corpus into ONE task):

    1. bound the order column into ``n_buckets`` rank-ordered value ranges
       (approxQuantile sketch — one pass; the cut VALUES are only a
       partitioning aid, the selection never depends on them);
    2. one hash aggregation gives per-bucket token sums; the driver prefix-
       sums <= n_buckets rows to find the single BOUNDARY bucket where the
       budget is crossed — every better-ranked bucket is kept whole with no
       per-row ordering work at all;
    3. only the boundary bucket (~1/n_buckets of the corpus) runs an exact
       in-bucket running sum, offset by the driver's prefix.

    Equal order values always share a bucket (cuts compare strictly), so
    bucket ranges respect the global order and the result is bit-identical
    to the one-window form — which is the DuckDB oracle. Worst case: an
    order column with one distinct value collapses every row into the
    boundary bucket (= the naive form); rank on a column with spread."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    base = df.filter(
        F.col(order_col).isNotNull() & F.col(token_col).isNotNull()
    )
    probes = [i / n_buckets for i in range(1, n_buckets)]
    cuts = (
        sorted(set(base.stat.approxQuantile(order_col, probes, 0.001)))
        if probes
        else []
    )
    bkt = F.lit(0)
    for c in cuts:
        bkt = bkt + F.when(F.col(order_col) < F.lit(c), 1).otherwise(0)
    tagged = base.withColumn("_bkt", bkt.cast("int"))
    sums = {
        int(r._bkt): int(r.t)
        for r in tagged.groupBy("_bkt")
        .agg(F.sum(token_col).alias("t"))
        .collect()
    }
    cum = 0
    boundary = None
    keep_whole: list[int] = []
    for b in sorted(sums):
        if cum + sums[b] <= budget:
            keep_whole.append(b)
            cum += sums[b]
        else:
            boundary = (b, cum)
            break
    out = tagged.filter(F.col("_bkt").isin(keep_whole) if keep_whole
                        else F.lit(False))
    if boundary is not None:
        b, offset = boundary
        w = (
            Window.partitionBy("_bkt")
            .orderBy(F.col(order_col).desc(), F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        edge = (
            tagged.filter(F.col("_bkt") == b)
            .withColumn("_cum", F.sum(token_col).over(w) + F.lit(offset))
            .filter(F.col("_cum") <= F.lit(int(budget)))
            .drop("_cum")
        )
        out = out.unionByName(edge)
    return out.drop("_bkt")
