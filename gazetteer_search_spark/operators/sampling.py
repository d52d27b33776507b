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

from pyspark.sql import DataFrame, Window
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
