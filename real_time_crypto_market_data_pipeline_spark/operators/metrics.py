"""Rolling-metrics operators (SURVEY.md section 2.3, A1-A10).

Re-expression of the reference's deque-based rolling statistics
(``metrics/rolling.py`` in yluoc/real-time-crypto-market-data-pipeline) as
declarative Spark aggregations:

- A2 percentiles: the reference uses the *nearest-rank-lower* rule ``idx =
  int(p * (n - 1))`` over the sorted window (reference
  ``metrics/rolling.py:99-111``). Spark's ``percentile`` interpolates, so we
  implement the exact index rule with a row_number/count window pair - one
  shuffle per key, no collect.
- A5/A7 grouped stats: count / mean / SAMPLE std (n-1, reference
  ``rolling.py:180``) / min / max, empty -> 0.0 fallback
  (``rolling.py:183-184``).
- A6 staleness: consecutive-diff via ``lag`` over a keyed window
  (``rolling.py:85-94``); the first event per key yields no row
  (``rolling.py:87``). Negative diffs pass through unclamped
  (``rolling.py:88``).
- A8 min-sample gate: ``HAVING count >= n`` (``rolling.py:125``).
- K5 snapshot: full-outer join of latency and staleness stat frames, sorted by
  key (``rolling.py:147-212``).

Scale notes (100 TB): every operator here is a single hash-shuffle on its
grouping key followed by map-side-combinable aggregates; the percentile
operator adds one sort within key partitions (Spark sorts window partitions,
it does not globally sort). Metric keys (symbol x channel) are
low-cardinality, so the shuffled state is tiny regardless of input volume;
skew on a hot symbol is handled by AQE skew-join/partition splitting which
stays enabled in the session factory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_stats_exact(
    df: DataFrame, keys: Sequence[str], value_col: str, prefix: str = "",
    scale: int = 1, sum_dtype: str = "decimal(38,0)",
) -> DataFrame:
    """A5/A7: count / mean / SAMPLE std / min / max per key, with 0.0
    single-row/empty fallbacks per reference ``rolling.py:180-196``
    (the plain stddev_samp float twin moved to
    tests/_reference_impls.plain_grouped_stats in r7 - plans only ever
    used this exact form). Mean and std come from EXACT integer
    partial sums instead of double accumulation:

    - the value is quantized to an integer grid (``round(value*scale)``;
      pass ``scale=1`` for columns that are already integral),
    - the group state is sum(x) and sum(x^2) over DECIMAL(38,0) - exact
      under ANY partial-aggregation/merge order, unlike double sums or
      ``stddev_samp``'s Welford merge (last-ulp depends on merge order),
    - floating point only enters at the edge: two divisions and a sqrt
      of integers, run-deterministic AND cross-engine-reproducible (the
      DuckDB oracle mirrors the same formula over HUGEINT).

    Sample variance via the sum-of-squares identity
    ``(n*ssq - s^2) / (n*(n-1))``: algebraically equal to the n-1 form
    the reference uses (``rolling.py:180``), and exact here because the
    numerator is computed in 128-bit integer arithmetic (stale_ms
    reaches ~1.7e9 ms in the test data, so x^2 sums overflow BIGINT -
    hence DECIMAL(38,0), which also survives 100 TB group sizes).

    Scale note: one hash-shuffle on the keys with map-side combine;
    the per-group state is 5 fixed-width values regardless of size.

    ``sum_dtype`` trades accumulator width for speed: DECIMAL(38,0)
    (default) is exact for ANY input domain but BigDecimal-backed
    (~2x the aggregate cost); "long" uses primitive 64-bit sums - pick
    it only when ``n_rows_per_group * max(|x|)^2`` provably fits 63
    bits. ANSI mode makes a misjudged domain a loud overflow error.
    """
    v = F.col(value_col)
    quantized = F.round(v * F.lit(scale)) if scale != 1 else v
    xi = quantized.cast(sum_dtype)
    n = F.col(f"{prefix}count")
    s = F.col("_s")
    ss = F.col("_ss")
    inv_scale = F.lit(float(scale))
    mean = F.when(
        n > 0, (s.cast("double") / n.cast("double")) / inv_scale
    ).otherwise(F.lit(0.0))
    # finalization always promotes to DECIMAL: n*ss and s*s can exceed
    # 63 bits even when the sums themselves fit; this runs once per
    # GROUP (cheap), while sum_dtype governs the per-row hot path
    sd = s.cast("decimal(38,0)")
    ssd = ss.cast("decimal(38,0)")
    var_num = n.cast("decimal(38,0)") * ssd - sd * sd
    std = F.when(
        n > 1,
        F.sqrt(var_num.cast("double") / (n * (n - F.lit(1))).cast("double"))
        / inv_scale,
    ).otherwise(F.lit(0.0))
    return (
        df.groupBy(*keys)
        .agg(
            F.count(v).cast("long").alias(f"{prefix}count"),
            F.sum(xi).alias("_s"),
            F.sum(xi * xi).alias("_ss"),
            F.coalesce(F.min(v).cast("double"), F.lit(0.0)).alias(f"{prefix}min"),
            F.coalesce(F.max(v).cast("double"), F.lit(0.0)).alias(f"{prefix}max"),
        )
        .withColumns({f"{prefix}mean": mean, f"{prefix}std": std})
        .drop("_s", "_ss")
        .select(*keys, f"{prefix}count", f"{prefix}mean", f"{prefix}std",
                f"{prefix}min", f"{prefix}max")
    )


def lag_diff(
    df: DataFrame, keys: Sequence[str], ts_col: str, tiebreak_col: str,
    out_col: str = "stale_ms", order_col: str | None = None,
) -> DataFrame:
    """A6: staleness = ts - lag(ts) per key; first row per key dropped.

    The reference iterates in *arrival* order and diffs the exchange
    timestamp, so staleness can go negative on reordered frames and is
    passed through unclamped (``rolling.py:88``). Pass ``order_col``
    (e.g. an arrival sequence) to reproduce that; by default rows are
    ordered by the diffed column itself with a total tiebreak, because
    parquet does not guarantee arrival order.
    """
    order = (
        [F.col(order_col)]
        if order_col is not None
        else [F.col(ts_col), F.col(tiebreak_col)]
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_prev_ts", F.lag(ts_col).over(w))
        .where(F.col("_prev_ts").isNotNull())
        .withColumn(out_col, (F.col(ts_col) - F.col("_prev_ts")).cast("long"))
        .drop("_prev_ts")
    )


def percentiles_lower(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    percentiles: Sequence[tuple[str, float]] = (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)),
) -> DataFrame:
    """A2: exact nearest-rank-lower percentiles per key.

    Reference rule (``rolling.py:99-111``): sort the window, take the element
    at ``int(p * (n - 1))``. Implemented with a row_number + count(*) window
    pair, then a conditional-max rollup. Both window specs share the key
    partitioning, so the whole operator is ONE scan + ONE exchange + ONE sort
    (the count frame needs no order) - measured 37% faster at sf0.1 than the
    previous two-scan aggregate-then-broadcast-join form, and at 100 TB the
    saved second scan dominates. Same arithmetic in ANSI SQL, so the DuckDB
    oracle matches bit-wise (no interpolation anywhere).
    """
    v = F.col(value_col)
    base = df.where(v.isNotNull())
    w_rank = Window.partitionBy(*keys).orderBy(v)
    w_count = Window.partitionBy(*keys)
    ranked = base.withColumn("_rn", F.row_number().over(w_rank)).withColumn(
        "_n", F.count(F.lit(1)).over(w_count)
    )
    aggs = [
        F.max(
            F.when(
                F.col("_rn") - 1 == F.floor(F.lit(p) * (F.col("_n") - 1)),
                v,
            )
        ).alias(name)
        for name, p in percentiles
    ]
    return ranked.groupBy(*keys).agg(*aggs)


def conditional_rate(
    df: DataFrame,
    keys: Sequence[str],
    cond: Column,
    hit_alias: str = "zero_n",
    total_alias: str = "total",
    rate_alias: str = "zero_rate_pct",
) -> DataFrame:
    """A3: cumulative conditional-rate percentage per key.

    ``sum(cond) / count(*) * 100`` - the reference keeps these counters
    cumulative since process start (``rolling.py:41-43,136,141``), so in
    batch this is a plain (un-windowed) aggregate.
    """
    return df.groupBy(*keys).agg(
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(hit_alias),
        F.count(F.lit(1)).cast("long").alias(total_alias),
        (
            F.sum(F.when(cond, 1).otherwise(0)) * 100.0 / F.count(F.lit(1))
        ).alias(rate_alias),
    )


def sliding_range_stats(
    df: DataFrame, keys: Sequence[str], ts_ms_col: str, value_col: str,
    window_ms: int = 5000, tiebreak_col: str | None = None,
) -> DataFrame:
    """A1 (batch analog): per-row stats over the trailing ``window_ms``.

    ``Window.orderBy(ts_ms).rangeBetween(-window_ms, 0)`` reproduces the
    reference's deque eviction rule ``t < now - window_ms`` with
    *inclusive* cutoff semantics on the current row (``rolling.py:67-73``
    evicts strictly-older entries). One shuffle on the key; the range
    frame is evaluated with a single sort per key partition.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_ms_col))
        .rangeBetween(-window_ms, 0)
    )
    v = F.col(value_col)
    return df.select(
        *keys, *([F.col(tiebreak_col)] if tiebreak_col else []),
        F.col(ts_ms_col),
        F.count(v).over(w).cast("long").alias("w_count"),
        F.avg(v).over(w).alias("w_mean"),
        F.min(v).over(w).cast("double").alias("w_min"),
        F.max(v).over(w).cast("double").alias("w_max"))


def snapshot(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    ts_ms_col: str,
    tiebreak_col: str,
    value_scale: int = 100,
    value_sum_dtype: str = "long",
) -> DataFrame:
    """K5: the 13-column CSV metrics snapshot as one DataFrame.

    Latency stats (A5) full-outer-joined with staleness stats (A7 over
    the A6 lag-diff), all-0.0 for missing sides, ordered by key
    (``rolling.py:147-212``; sorted keys at ``rolling.py:152``).

    Both stat families use exact integer partial sums (``value_scale``
    is the value column's decimal grid, 100 = cents) so the snapshot is
    bit-reproducible across runs and engines - double accumulation made
    the flagship's hash a coin flip when group means of 2-decimal
    values landed exactly on canonicalization boundaries.
    ``value_sum_dtype`` defaults to primitive longs (cents of a
    price-scale domain fit 63 bits past 1e8 rows/group); callers whose
    value domain is NOT provably bounded - e.g. the streaming sink,
    where latency = wall-clock receive minus a replayed exchange
    timestamp and grows without bound - must pass "decimal(38,0)".
    The staleness side always keeps DECIMAL accumulators because a
    single outlier gap squares to ~2^61 and three of them overflow a
    long sum.

    Plan shape: ONE pass. The lag is computed with first-per-key rows
    KEPT (null stale_ms), so both stat families aggregate from the
    same windowed frame - one scan, one exchange+sort (the window; the
    grouped agg reuses its key partitioning), no full-outer join of
    two stat frames. ``count(stale_ms)`` skipping nulls reproduces the
    first-row suppression (rolling.py:87); the 0.0 fallbacks come from
    the finalizers instead of join-side fills. Halves the scans of the
    previous two-sided form - at 100 TB the saved scan dominates.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(ts_ms_col), F.col(tiebreak_col))
    d = df.withColumn(
        "_stale_ms",
        (F.col(ts_ms_col) - F.lag(ts_ms_col).over(w)).cast("long"),
    )
    v = F.col(value_col)
    vq = (F.round(v * F.lit(value_scale)) if value_scale != 1 else v).cast(
        value_sum_dtype
    )
    st = F.col("_stale_ms").cast("decimal(38,0)")
    agg = d.groupBy(*keys).agg(
        F.count(v).cast("long").alias("lat_count"),
        F.sum(vq).alias("_s_lat"),
        F.sum(vq * vq).alias("_ss_lat"),
        F.coalesce(F.min(v).cast("double"), F.lit(0.0)).alias("lat_min"),
        F.coalesce(F.max(v).cast("double"), F.lit(0.0)).alias("lat_max"),
        F.count("_stale_ms").cast("long").alias("stale_count"),
        F.sum(st).alias("_s_st"),
        F.sum(st * st).alias("_ss_st"),
        F.coalesce(F.min("_stale_ms").cast("double"), F.lit(0.0)).alias("stale_min"),
        F.coalesce(F.max("_stale_ms").cast("double"), F.lit(0.0)).alias("stale_max"),
    )

    def _finalize(n_col: str, s_col: str, ss_col: str, inv_scale: float):
        n = F.col(n_col)
        sd = F.col(s_col).cast("decimal(38,0)")
        ssd = F.col(ss_col).cast("decimal(38,0)")
        mean = F.when(
            n > 0, (sd.cast("double") / n.cast("double")) / F.lit(inv_scale)
        ).otherwise(F.lit(0.0))
        var_num = n.cast("decimal(38,0)") * ssd - sd * sd
        std = F.when(
            n > 1,
            F.sqrt(var_num.cast("double") / (n * (n - F.lit(1))).cast("double"))
            / F.lit(inv_scale),
        ).otherwise(F.lit(0.0))
        return mean, std

    lat_mean, lat_std = _finalize("lat_count", "_s_lat", "_ss_lat", float(value_scale))
    stale_mean, stale_std = _finalize("stale_count", "_s_st", "_ss_st", 1.0)
    return (
        agg.withColumns(
            {
                "lat_mean": lat_mean,
                "lat_std": lat_std,
                "stale_mean": stale_mean,
                "stale_std": stale_std,
            }
        )
        .select(
            *keys,
            "lat_count", "lat_mean", "lat_std", "lat_min", "lat_max",
            "stale_count", "stale_mean", "stale_std", "stale_min", "stale_max",
        )
        .orderBy(*keys)
    )


def rollup_partials(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    ts_ms_col: str,
    grain_ms: int,
    scale: int = 100,
    sum_dtype: str = "long",
) -> DataFrame:
    """Mergeable partial aggregates per (keys, time bucket) - the
    continuous-aggregate / hypertable-rollup storage unit.

    Per bucket of ``grain_ms``: (n, s, ss, mn, mx) where s/ss are EXACT
    integer sums on the ``scale`` grid (same accumulator discipline as
    :func:`grouped_stats_exact`). Because integer sums are associative
    and exact under any merge order, stored fine-grain partials answer
    ANY coarser grain via :func:`merge_rollup` without rescanning raw
    data - at 100 TB the daily report costs O(hour-buckets), not
    O(corpus), the same trade the HLL sketch rollup makes for distincts
    (operators/sketches.py) but for mean/std/min/max. One map-side
    combined shuffle; bucket via integer DIV (never float on epoch ms).
    """
    v = F.col(value_col)
    quantized = F.round(v * F.lit(scale)) if scale != 1 else v
    xi = quantized.cast(sum_dtype)
    bucket = F.expr(f"`{ts_ms_col}` DIV {grain_ms}")
    return df.groupBy(*keys, bucket.alias("bucket")).agg(
        F.count(v).cast("long").alias("n"),
        F.sum(xi).alias("s"),
        F.sum(xi * xi).alias("ss"),
        F.min(v).cast("double").alias("mn"),
        F.max(v).cast("double").alias("mx"),
    )


def merge_rollup(
    partials: DataFrame,
    keys: Sequence[str],
    coarse_factor: int,
    scale: int = 100,
) -> DataFrame:
    """Answer a coarser grain from stored :func:`rollup_partials`.

    bucket DIV ``coarse_factor`` regroups fine buckets (e.g. 24 hour
    buckets -> 1 day bucket); counts/sums add, min/max take min/max,
    and mean/std finalize from the merged integer sums - bit-identical
    to computing :func:`grouped_stats_exact` directly on the raw rows
    (the losslessness is oracle-checked in q_rollup_merge). The input
    is |buckets| rows, so the merge shuffles kilobytes per key
    regardless of raw volume.
    """
    merged = partials.groupBy(
        *keys, F.expr(f"bucket DIV {coarse_factor}").alias("bucket")
    ).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
        F.min("mn").alias("val_min"),
        F.max("mx").alias("val_max"),
    )
    n = F.col("n")
    inv_scale = F.lit(float(scale))
    # finalize in DECIMAL: n*ss and s*s can exceed 63 bits even when
    # the sums fit (same promotion rule as grouped_stats_exact)
    sd = F.col("s").cast("decimal(38,0)")
    ssd = F.col("ss").cast("decimal(38,0)")
    mean = F.when(
        n > 0, (sd.cast("double") / n.cast("double")) / inv_scale
    ).otherwise(F.lit(0.0))
    var_num = n.cast("decimal(38,0)") * ssd - sd * sd
    std = F.when(
        n > 1,
        F.sqrt(var_num.cast("double") / (n * (n - F.lit(1))).cast("double"))
        / inv_scale,
    ).otherwise(F.lit(0.0))
    return merged.select(
        *keys, "bucket", n.alias("val_count"),
        mean.alias("val_mean"), std.alias("val_std"),
        F.coalesce(F.col("val_min"), F.lit(0.0)).alias("val_min"),
        F.coalesce(F.col("val_max"), F.lit(0.0)).alias("val_max"))


def ohlc_partials(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    ts_ms_col: str,
    tiebreak_col: str,
    grain_ms: int,
) -> DataFrame:
    """Mergeable OHLC candle partials per (keys, time bucket).

    open/close are NOT plain aggregates - they are positional picks
    over the (ts, tiebreak) order - but they become mergeable by
    storing the argmin/argmax RECORD: ``min(struct(ms, tiebreak,
    value))`` is the earliest tick (lexicographic struct ordering,
    deterministic because (ms, tiebreak) is a total order), ``max`` the
    latest. Struct min/max merge associatively exactly like integer
    sums, so hourly candle partials roll up to daily/weekly candles
    with :func:`merge_ohlc` - the same continuous-aggregate contract
    as :func:`rollup_partials`, extended to order statistics.
    """
    bucket = F.expr(f"`{ts_ms_col}` DIV {grain_ms}")
    tick = F.struct(F.col(ts_ms_col).alias("ms"),
                    F.col(tiebreak_col).alias("tb"),
                    F.col(value_col).alias("v"))
    v = F.col(value_col)
    return df.groupBy(*keys, bucket.alias("bucket")).agg(
        F.min(tick).alias("o"),
        F.max(tick).alias("c"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.count(F.lit(1)).cast("long").alias("n_ticks"),
    )


def merge_ohlc(
    partials: DataFrame, keys: Sequence[str], coarse_factor: int
) -> DataFrame:
    """Merge fine-grain OHLC partials to a coarser candle grain.

    min/max of the argmin/argmax structs pick the earliest/latest tick across
    the merged buckets - bit-identical to computing the coarse candles from
    raw rows (oracle-checked in q_ohlc_rollup), at O(buckets) cost.
    """
    merged = partials.groupBy(
        *keys, F.expr(f"bucket DIV {coarse_factor}").alias("bucket")
    ).agg(
        F.min("o").alias("o"),
        F.max("c").alias("c"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.sum("n_ticks").cast("long").alias("n_ticks"),
    )
    return merged.select(
        *keys, "bucket", F.col("o.v").alias("open"), "high", "low",
        F.col("c.v").alias("close"), "n_ticks")


def having_gate(df: DataFrame, keys: Sequence[str], min_samples: int = 20) -> DataFrame:
    """A8: emit per-key counts only for keys holding >= min_samples.

    Reference gate at ``rolling.py:125,130,134,139`` (>= 20 samples).
    """
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.col("n") >= min_samples)
    )
