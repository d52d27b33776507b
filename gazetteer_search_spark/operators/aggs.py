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


_CALENDAR_INTERVALS = ("hour", "day", "week", "month", "year")


def date_histogram(
    df: DataFrame,
    ts_col: str,
    interval: str = "day",
    value_col: str | None = None,
    min_doc_count: int = 1,
    fill_empty: bool = False,
) -> DataFrame:
    """ES date_histogram agg: calendar-interval buckets over a timestamp
    column (``date_trunc`` semantics — the ES calendar_interval form), with
    optional per-bucket metric sum and the ES min_doc_count=0 /
    extended-bounds shape via ``fill_empty``: every interval between the
    first and last non-empty bucket appears, empties carrying zero counts
    (how ES renders gap-free time series for sparse data).

    Output: (bucket timestamp, doc_count [, value_sum]), bucket-ascending.

    Scale shape: ONE hash aggregation keyed by the truncated timestamp
    (map-side partials free); the zero-fill grid derives from the agg's own
    min/max — a one-row ``sequence`` + explode broadcast-joined back, so
    the fill costs O(buckets), never a second corpus pass."""
    if interval not in _CALENDAR_INTERVALS:
        raise ValueError(
            f"interval must be one of {_CALENDAR_INTERVALS}, got {interval!r}"
        )
    aggs = [F.count("*").alias("doc_count")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("value_sum"))
    base = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.date_trunc(interval, F.col(ts_col)).alias("bucket"))
        .agg(*aggs)
    )
    if fill_empty:
        grid = base.agg(
            F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
        ).select(
            F.explode(
                F.sequence("lo", "hi", F.expr(f"interval 1 {interval}"))
            ).alias("bucket")
        )
        base = (
            grid.join(F.broadcast(base), "bucket", "left")
            .withColumn("doc_count", F.coalesce("doc_count", F.lit(0)))
        )
        if value_col is not None:
            base = base.withColumn(
                "value_sum", F.coalesce("value_sum", F.lit(0.0))
            )
    else:
        base = base.filter(F.col("doc_count") >= F.lit(min_doc_count))
    return base.orderBy("bucket")


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


def filters_agg(df: DataFrame, filters: dict[str, Column]) -> DataFrame:
    """ES ``filters`` agg: one named bucket per arbitrary filter condition,
    buckets may OVERLAP (a doc matching two filters counts in both — the ES
    semantics, unlike a terms agg's partition).

    Output: (bucket, doc_count), bucket name-ascending.

    Scale shape: ONE pass — every bucket is a conditional-sum column in a
    single hash aggregation (map-side partials free), then the one result
    row unpivots via ``stack``. N buckets never cost N scans; there is no
    per-bucket job and no shuffle keyed by data values at all."""
    if not filters:
        raise ValueError("filters_agg needs at least one named filter")
    names = sorted(filters)
    row = df.agg(
        *[
            F.sum(F.when(filters[n], 1).otherwise(0))
            .cast("long")
            .alias(f"_b{i}")
            for i, n in enumerate(names)
        ]
    )
    pairs = ", ".join(f"'{n}', _b{i}" for i, n in enumerate(names))
    return (
        row.selectExpr(
            f"stack({len(names)}, {pairs}) AS (bucket, doc_count)"
        )
        .withColumn("doc_count", F.coalesce("doc_count", F.lit(0)))
        .orderBy("bucket")
    )


def range_agg(
    df: DataFrame,
    col: str,
    ranges: list[tuple[float | None, float | None]],
) -> DataFrame:
    """ES ``range`` agg: half-open buckets ``[from, to)`` over a numeric
    column; ``None`` leaves an end unbounded; ranges may overlap (a value in
    two ranges counts in both). Bucket keys use the ES ``from-to`` form with
    ``*`` for the open end. NULL values drop (ES missing-value behavior).

    Same one-pass conditional-sum shape as :func:`filters_agg` — N ranges
    are N columns of one aggregation, not N scans."""
    if not ranges:
        raise ValueError("range_agg needs at least one range")

    def _key(lo: float | None, hi: float | None) -> str:
        f = lambda v: "*" if v is None else f"{v:g}"
        return f"{f(lo)}-{f(hi)}"

    conds = []
    for lo, hi in ranges:
        if lo is None and hi is None:
            c = F.col(col).isNotNull()
        elif lo is None:
            c = F.col(col) < F.lit(hi)
        elif hi is None:
            c = F.col(col) >= F.lit(lo)
        else:
            if hi <= lo:
                raise ValueError(f"empty range [{lo}, {hi})")
            c = (F.col(col) >= F.lit(lo)) & (F.col(col) < F.lit(hi))
        conds.append((_key(lo, hi), c))
    return filters_agg(df, dict(conds))


def rare_terms(
    df: DataFrame, col: str, max_doc_count: int = 1, size: int = 100
) -> DataFrame:
    """ES ``rare_terms`` agg: the LONG-TAIL complement of a terms agg —
    values appearing at most ``max_doc_count`` times, rarest first (then
    value-ascending for determinism), capped at ``size``.

    Scale shape: one hash aggregation keyed by the value + a HAVING filter;
    the count <= K predicate drops the head of the Zipf curve before the
    final order-by, so the sort sees only the tail (ES approximates this
    with a CuckooFilter for the same reason — bounding what survives the
    per-shard merge; exact is affordable here because the filter comes
    first)."""
    if max_doc_count < 1:
        raise ValueError(f"max_doc_count must be >= 1, got {max_doc_count}")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("value"))
        .agg(F.count("*").alias("doc_count"))
        .filter(F.col("doc_count") <= F.lit(max_doc_count))
        .orderBy("doc_count", "value")
        .limit(size)
    )


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


def multi_terms(
    df: DataFrame,
    keys: list[str],
    size: int = 10,
    min_doc_count: int = 1,
) -> DataFrame:
    """ES ``multi_terms`` agg: buckets keyed by a TUPLE of fields ("terms on
    a composite key") — (lang, repo) pairs ranked by count. A terms agg per
    field cannot produce this (marginal counts lose the joint distribution).

    Output: one row per composite bucket — the key fields, doc_count, and
    ``key`` (the ES pipe-joined display form), count desc then key asc,
    top-``size``.

    Scale shape: ONE hash aggregation on the composite key (map-side
    partials free), rows with a NULL component drop (ES missing semantics),
    and the cut is a TakeOrdered — the full bucket space never sorts."""
    if not keys or len(keys) < 2:
        raise ValueError("multi_terms needs >= 2 key fields")
    cond = None
    for c in keys:
        nn = F.col(c).isNotNull()
        cond = nn if cond is None else (cond & nn)
    out = (
        df.filter(cond)
        .groupBy(*[F.col(c).cast("string").alias(c) for c in keys])
        .agg(F.count("*").alias("doc_count"))
    )
    if min_doc_count > 1:
        out = out.filter(F.col("doc_count") >= min_doc_count)
    return (
        out.withColumn("key", F.concat_ws("|", *keys))
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(size)
    )


def adjacency_matrix(df: DataFrame, filters: dict[str, Column]) -> DataFrame:
    """ES ``adjacency_matrix`` agg: given named filters, the doc count of
    every filter AND every pairwise INTERSECTION (the co-occurrence matrix
    a graph/venn visualization reads; ES keys intersections "a&b").

    Output: (key, doc_count), key ascending, zero-count cells dropped (ES
    emits only non-empty cells).

    Scale shape: same one-pass contract as filters_agg — N singletons +
    N(N-1)/2 intersections are conditional-sum columns of ONE hash
    aggregation over ONE scan, unpivoted via ``stack``. ES caps N at 100
    for the same quadratic-columns reason; we inherit that cap."""
    if not filters:
        raise ValueError("adjacency_matrix needs at least one named filter")
    if len(filters) > 100:
        raise ValueError("adjacency_matrix caps at 100 filters (ES parity)")
    names = sorted(filters)
    cells: list[tuple[str, Column]] = [(n, filters[n]) for n in names]
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            cells.append((f"{a}&{b}", filters[a] & filters[b]))
    row = df.agg(
        *[
            F.sum(F.when(c, 1).otherwise(0)).cast("long").alias(f"_c{i}")
            for i, (_, c) in enumerate(cells)
        ]
    )
    pairs = ", ".join(f"'{n}', _c{i}" for i, (n, _) in enumerate(cells))
    return (
        row.selectExpr(f"stack({len(cells)}, {pairs}) AS (key, doc_count)")
        .filter(F.col("doc_count") > 0)
        .orderBy("key")
    )


def pipeline_aggs(
    buckets: DataFrame,
    value_col: str = "doc_count",
    order_col: str = "bucket",
    window: int = 3,
    lag: int = 1,
) -> DataFrame:
    """ES pipeline aggregations over a parent bucket agg (date_histogram /
    histogram output): per ordered bucket —

    - ``derivative``   value - lag(value)           (ES derivative)
    - ``serial_diff``  value - lag(value, ``lag``)  (ES serial_diff)
    - ``cum_sum``      running total                (ES cumulative_sum)
    - ``moving_avg``   mean over the trailing ``window`` buckets including
      the current one (ES moving_fn ``MovingFunctions.unweightedAvg`` with
      the window fully shifted into the past)

    First buckets where a lag is undefined carry NULL (ES skip gap policy).

    Scale shape: the input is POST-AGGREGATION bucket rows — O(buckets),
    not O(corpus) — so the single unpartitioned sort window here is a
    driver-sized frame by construction (ES computes these reductions on
    the coordinating node for the same reason). Never point this at raw
    events; aggregate first."""
    from pyspark.sql.window import Window

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    w = Window.orderBy(order_col)
    v = F.col(value_col).cast("double")
    return buckets.select(
        "*",
        F.round(v - F.lag(v, 1).over(w), 4).alias("derivative"),
        F.round(v - F.lag(v, lag).over(w), 4).alias("serial_diff"),
        F.round(
            F.sum(v).over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("cum_sum"),
        F.round(
            F.avg(v).over(w.rowsBetween(-(window - 1), 0)), 4
        ).alias("moving_avg"),
    )


def bucket_script(
    buckets: DataFrame, name: str, expr: str
) -> DataFrame:
    """ES bucket_script: a per-bucket scalar computed from sibling metrics
    (e.g. ``value_sum / doc_count``) — a plain projection, expressed as a
    SQL string over the bucket row's columns."""
    return buckets.withColumn(name, F.round(F.expr(expr), 4))


def bucket_selector(buckets: DataFrame, predicate: str) -> DataFrame:
    """ES bucket_selector: drop buckets failing a predicate over their
    metrics (HAVING over the parent agg) — a plain filter."""
    return buckets.filter(F.expr(predicate))


def bucket_sort(
    buckets: DataFrame,
    by: str,
    ascending: bool = False,
    size: int | None = None,
    tie_col: str = "bucket",
) -> DataFrame:
    """ES bucket_sort: re-order the parent agg's buckets by a metric with a
    deterministic tie-break, optionally truncating (``size``) — the
    ``orderBy + limit`` of the bucket space."""
    col = F.col(by).asc() if ascending else F.col(by).desc()
    out = buckets.orderBy(col, F.col(tie_col).asc())
    return out.limit(size) if size is not None else out


def extended_stats(df: DataFrame, col: str) -> DataFrame:
    """ES extended_stats agg: count / min / max / sum / avg plus
    sum_of_squares, POPULATION variance and std deviation (the ES
    definitions: variance = sum_of_squares/n - avg^2) — one hash
    aggregation, map-side partials free."""
    c = F.col(col).cast("double")
    return df.filter(c.isNotNull()).agg(
        F.count("*").alias("n"),
        F.min(c).alias("mn"),
        F.max(c).alias("mx"),
        F.round(F.sum(c), 4).alias("total"),
        F.round(F.avg(c), 6).alias("mean"),
        F.round(F.sum(c * c), 4).alias("sum_sq"),
        F.round(F.var_pop(c), 6).alias("variance"),
        F.round(F.stddev_pop(c), 6).alias("std_dev"),
    )


def percentile_ranks(
    df: DataFrame, col: str, values: tuple[float, ...]
) -> DataFrame:
    """ES percentile_ranks agg (inverse percentiles): for each given
    value, the percentage of rows <= it. One conditional-sum hash agg
    over one scan (no per-value pass), unpivoted via ``stack``."""
    if not values:
        raise ValueError("percentile_ranks needs at least one value")
    c = F.col(col).cast("double")
    base = df.filter(c.isNotNull())
    aggs = [F.count("*").alias("_n")] + [
        F.sum(F.when(c <= F.lit(float(v)), 1).otherwise(0)).alias(f"_c{i}")
        for i, v in enumerate(values)
    ]
    row = base.agg(*aggs)
    # 100.0D: a bare 100.0 literal parses as DECIMAL in Spark SQL and
    # poisons the output type (Decimal ranks vs the double the caller and
    # the SQL oracle expect)
    pairs = ", ".join(
        f"cast({float(v)} as double), "
        f"round(cast(100.0 as double) * _c{i} / _n, 6)"
        for i, v in enumerate(values)
    )
    return row.selectExpr(
        f"stack({len(values)}, {pairs}) AS (value, rank)"
    ).orderBy("value")


def weighted_avg(df: DataFrame, value_col: str, weight_col: str) -> DataFrame:
    """ES weighted_avg agg: sum(v*w)/sum(w), NULL-valued or NULL-weighted
    rows skipped (ES missing semantics) — one hash aggregation."""
    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("double")
    return (
        df.filter(v.isNotNull() & w.isNotNull())
        .agg(
            F.round(F.sum(v * w) / F.sum(w), 6).alias("weighted_avg"),
            F.count("*").alias("n"),
        )
    )


def top_metrics(
    df: DataFrame, sort_col: str, metric_cols: list[str],
    ascending: bool = False,
) -> DataFrame:
    """ES top_metrics agg: the metric columns of the row with the
    max (or min) sort value — ``max_by``/``min_by`` (one hash agg, no
    sort). Ties on the sort value break deterministically by taking the
    extreme (sort_value, metric) tuple, so concurrent-equal rows cannot
    flap between runs."""
    if not metric_cols:
        raise ValueError("top_metrics needs at least one metric column")
    s = F.col(sort_col)
    base = df.filter(s.isNotNull())
    fn = F.min_by if ascending else F.max_by
    ext = F.min(s) if ascending else F.max(s)
    # deterministic under sort-ties: pick by the (sort, metric) struct
    aggs = [ext.alias(f"{sort_col}_top")] + [
        fn(F.col(m), F.struct(s, F.col(m))).alias(m) for m in metric_cols
    ]
    return base.agg(*aggs)


def matrix_stats(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """ES matrix_stats agg (two-field form): per-field mean/variance plus
    POPULATION covariance and Pearson correlation — one hash aggregation
    over rows where both fields are present (ES drops incomplete rows)."""
    a = F.col(col_a).cast("double")
    b = F.col(col_b).cast("double")
    base = df.filter(a.isNotNull() & b.isNotNull())
    return base.agg(
        F.count("*").alias("n"),
        F.round(F.avg(a), 6).alias("mean_a"),
        F.round(F.avg(b), 6).alias("mean_b"),
        F.round(F.var_pop(a), 6).alias("var_a"),
        F.round(F.var_pop(b), 6).alias("var_b"),
        F.round(F.covar_pop(a, b), 6).alias("covariance"),
        F.round(F.corr(a, b), 6).alias("correlation"),
    )


#: auto_date_histogram's interval ladder (the ES rounding ladder's
#: calendar members that date_trunc supports), coarse to fine
_AUTO_LADDER = ("year", "month", "week", "day", "hour")


def auto_date_histogram(
    df: DataFrame, ts_col: str, target_buckets: int = 10
) -> DataFrame:
    """ES auto_date_histogram agg: pick the FINEST calendar interval from
    the ladder (year > month > week > day > hour) that yields at most
    ``target_buckets`` non-empty buckets, then bucket with it. Two passes:
    one tiny agg counts distinct truncations per candidate interval (ONE
    scan, all candidates as conditional count-distincts), the driver picks
    the interval from that 1-row result, and the chosen bucketing is the
    ordinary date_histogram hash agg. Output: (interval, bucket,
    doc_count)."""
    if target_buckets < 1:
        raise ValueError(
            f"target_buckets must be >= 1, got {target_buckets}"
        )
    base = df.filter(F.col(ts_col).isNotNull())
    probe = base.agg(
        *[
            F.countDistinct(F.date_trunc(iv, F.col(ts_col))).alias(iv)
            for iv in _AUTO_LADDER
        ]
    ).collect()[0]
    chosen = _AUTO_LADDER[0]
    for iv in _AUTO_LADDER:
        if int(probe[iv]) <= target_buckets:
            chosen = iv
        else:
            break
    return (
        base.groupBy(
            F.date_trunc(chosen, F.col(ts_col)).alias("bucket")
        )
        .agg(F.count("*").alias("doc_count"))
        .select(F.lit(chosen).alias("interval"), "bucket", "doc_count")
        .orderBy("bucket")
    )
