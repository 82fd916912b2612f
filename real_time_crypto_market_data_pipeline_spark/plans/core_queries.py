"""SURVEY section 2.1-2.4 operator inventory as oracle-checked queries.

These run the reference's operator semantics against the driver's
``events`` / ``embeddings`` / ``lineitem`` tables per the FIXTURES.md
part-B mapping (events.ts <-> exchange timestamp, user_id <-> symbol,
event_type <-> channel, value <-> latency measure, props <-> raw JSON).

Each docstring cites the reference behavior being reproduced
(yluoc/real-time-crypto-market-data-pipeline, file:line).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import metrics as M
from ..tables import load, load_events
from .registry import query

# Every time derivation goes through the type-adaptive integer `ms`
# column (tables.events_ms_col: LONG-ns or timestamp storage), matching
# DuckDB's epoch_ms() truncation exactly.
_events = load_events


# ---------------------------------------------------------------- S5
@query(
    "q_json_decode",
    oracle="""
    SELECT event_id, k FROM (
      SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events
    ) t WHERE k IS NOT NULL
    """,
)
def q_json_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: from_json with skip-on-error (okx_ws.py:72-94).

    PERMISSIVE-mode from_json nulls unparsable input; the isNotNull
    filter reproduces the reference's silent skip (okx_ws.py:92-94).
    """
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.from_json("props", "k INT")["k"].alias("k")
    ).where(F.col("k").isNotNull())


# ---------------------------------------------------------------- S6/F12
@query(
    "q_invariant_check",
    oracle="""
    WITH d AS (
      SELECT user_id, epoch_ms(ts) AS ms,
             lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
      FROM events
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN ms < prev THEN 1 ELSE 0 END) AS BIGINT) AS violations,
           CAST(COUNT(*) AS BIGINT) AS total
    FROM d GROUP BY user_id
    """,
)
def q_invariant_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/F12: monotonicity violation counting (okx_ws.py:85-88).

    The reference asserts `decoded_ns >= recv_ns` under _DEBUG; the
    production-scale form counts violations per key instead of raising.
    Here: events whose ts regressed vs the previous event (by arrival
    order = event_id) per user.
    """
    w = Window.partitionBy("user_id").orderBy("event_id")
    d = _events(spark, sf_dir).withColumn("prev", F.lag("ms").over(w))
    return d.groupBy("user_id").agg(
        F.sum(F.when(F.col("ms") < F.col("prev"), 1).otherwise(0))
        .cast("long")
        .alias("violations"),
        F.count(F.lit(1)).cast("long").alias("total"),
    )


# ---------------------------------------------------------------- F1
@query(
    "q_filter_isin",
    oracle="""
    SELECT event_id, event_type, value FROM events
    WHERE event_type NOT IN ('error', 'signup')
    """,
)
def q_filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: control-message isin filter (normalizer.py:65-66)."""
    return (
        load(spark, sf_dir, "events")
        .where(~F.col("event_type").isin("error", "signup"))
        .select("event_id", "event_type", "value")
    )


# ---------------------------------------------------------------- F2
@query(
    "q_null_guard",
    oracle="""
    SELECT event_id, event_type FROM events
    WHERE props IS NOT NULL AND length(props) > 0 AND value IS NOT NULL
    """,
)
def q_null_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: shape/null guards (normalizer.py:69-78)."""
    return (
        load(spark, sf_dir, "events")
        .where(
            F.col("props").isNotNull()
            & (F.length("props") > 0)
            & F.col("value").isNotNull()
        )
        .select("event_id", "event_type")
    )


# ---------------------------------------------------------------- F3
@query(
    "q_channel_split",
    oracle="""
    SELECT CASE WHEN event_type IN ('click', 'view') THEN 'interaction'
                ELSE 'transaction' END AS branch,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1
    """,
)
def q_channel_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: channel dispatch via when/otherwise (normalizer.py:82,161)."""
    branch = (
        F.when(F.col("event_type").isin("click", "view"), "interaction")
        .otherwise("transaction")
        .alias("branch")
    )
    return (
        load(spark, sf_dir, "events")
        .select(branch)
        .groupBy("branch")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ---------------------------------------------------------------- F4
@query(
    "q_element_at",
    oracle="SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS first_dim FROM embeddings",
)
def q_element_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: head-of-array select (normalizer.py:84)."""
    return load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.try_element_at("embedding", F.lit(1)).cast("double").alias("first_dim"),
    )


# ---------------------------------------------------------------- F5
@query(
    "q_explode",
    oracle="SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings",
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: fan-out explode, count conservation (normalizer.py:163)."""
    return load(spark, sf_dir, "embeddings").select(
        "vec_id", F.explode("embedding").alias("_v")
    ).select("vec_id", F.col("_v").cast("double").alias("val"))


# ---------------------------------------------------------------- F6
@query(
    "q_try_cast",
    oracle="""
    SELECT event_id, k_big FROM (
      SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_big
      FROM events
    ) t WHERE k_big IS NOT NULL AND k_big >= 50
    """,
)
def q_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: string->int cast with null-on-error skip (normalizer.py:87-91)."""
    d = load(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k_big"),
    )
    return d.where(F.col("k_big").isNotNull() & (F.col("k_big") >= 50))


# ---------------------------------------------------------------- F7
@query(
    "q_array_transform",
    oracle="""
    SELECT vec_id,
           COALESCE(list_sum(list_filter(
             list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0),
             x -> x > 0)), 0.0) AS pos_sum
    FROM embeddings
    """,
)
def q_array_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: array transform + element filtering (normalizer.py:97-121).

    The reference maps positional string levels to typed structs and
    drops bad levels; here the same transform->filter->consume shape
    over the embedding arrays, folded to a scalar for hashing.
    """
    e = F.col("embedding")
    doubled = F.transform(e, lambda x: x.cast("double") * 2.0)
    kept = F.filter(doubled, lambda x: x > 0)
    return load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.aggregate(kept, F.lit(0.0), lambda acc, x: acc + x).alias("pos_sum"),
    )


# ---------------------------------------------------------------- F8
@query(
    "q_best_levels",
    oracle="""
    SELECT vec_id,
           COALESCE(CAST(list_filter(embedding, x -> x > 0.5)[1] AS DOUBLE), 0.0) AS best
    FROM embeddings
    """,
)
def q_best_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: first-element-with-default (normalizer.py:124-125)."""
    first_pos = F.try_element_at(
        F.filter(F.col("embedding"), lambda x: x > 0.5), F.lit(1)
    )
    return load(spark, sf_dir, "embeddings").select(
        "vec_id", F.coalesce(first_pos.cast("double"), F.lit(0.0)).alias("best")
    )


# ---------------------------------------------------------------- F9
@query(
    "q_struct_project",
    oracle="""
    SELECT 'okx' AS exchange, CAST(user_id AS VARCHAR) AS symbol,
           event_type AS channel, event_id
    FROM events
    """,
)
def q_struct_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: struct assembly with constant fields (normalizer.py:128-134)."""
    ev = load(spark, sf_dir, "events")
    assembled = ev.select(
        F.struct(
            F.lit("okx").alias("exchange"),
            F.col("user_id").cast("string").alias("symbol"),
            F.col("event_type").alias("channel"),
            F.col("event_id").alias("event_id"),
        ).alias("ev")
    )
    return assembled.select("ev.*")


# ---------------------------------------------------------------- F10
@query(
    "q_spread",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def q_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: derived scalar arithmetic (stdout.py:21)."""
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rev.alias("revenue"),
        (rev * (1 + F.col("l_tax"))).alias("charge"),
    )


# ---------------------------------------------------------------- F11
@query(
    "q_latency_cols",
    oracle="""
    SELECT event_id, epoch_ms(ts) AS ts_ms,
           epoch_ms(ts) // 1000 AS ts_s,
           epoch_ms(ts) % 86400000 AS ms_of_day
    FROM events
    """,
)
def q_latency_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: timestamp-stage arithmetic + unit conversion (stdout.py:16-18)."""
    return _events(spark, sf_dir).select(
        "event_id",
        F.col("ms").alias("ts_ms"),
        F.expr("ms DIV 1000").alias("ts_s"),
        (F.col("ms") % 86400000).alias("ms_of_day"),
    )


# ---------------------------------------------------------------- F13
@query(
    "q_date_partition",
    oracle="""
    SELECT event_id, strftime(ts, '%Y-%m-%d') AS dt,
           CAST(hour(ts) AS INTEGER) AS hr
    FROM events
    """,
)
def q_date_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: epoch-ms -> UTC date partition string (jsonl.py:22,27)."""
    d = _events(spark, sf_dir).withColumn("t", F.timestamp_millis(F.col("ms")))
    return d.select(
        "event_id",
        F.date_format("t", "yyyy-MM-dd").alias("dt"),
        F.hour("t").alias("hr"),
    )


# ---------------------------------------------------------------- F14
@query(
    "q_to_json",
    oracle="""
    SELECT event_id,
           CAST(to_json(struct_pack(event_id := event_id, event_type := event_type))
                AS VARCHAR) AS js
    FROM events
    """,
)
def q_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: struct -> compact JSON re-encode (jsonl.py:32-70,144)."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.to_json(F.struct("event_id", "event_type")).alias("js"),
    )


# ---------------------------------------------------------------- F15
@query(
    "q_format_string",
    oracle="""
    SELECT event_id, printf('%s|ev=%d|val=%.3f', event_type, event_id, value) AS line
    FROM events
    """,
)
def q_format_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15: deterministic formatted-line render (stdout.py:13-32)."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.format_string(
            "%s|ev=%d|val=%.3f", F.col("event_type"), F.col("event_id"), F.col("value")
        ).alias("line"),
    )


# ---------------------------------------------------------------- A2
@query(
    "q_percentiles",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           MAX(CASE WHEN rn - 1 = FLOOR(0.5 * (n - 1)) THEN value END) AS p50,
           MAX(CASE WHEN rn - 1 = FLOOR(0.95 * (n - 1)) THEN value END) AS p95,
           MAX(CASE WHEN rn - 1 = FLOOR(0.99 * (n - 1)) THEN value END) AS p99
    FROM ranked GROUP BY event_type
    """,
    bench=True,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: exact nearest-rank-lower p50/p95/p99 (rolling.py:99-111).

    idx = int(p * (n - 1)) over the sorted series - NOT interpolated,
    NOT percentile_approx; identical arithmetic on both engines.
    """
    return M.percentiles_lower(load(spark, sf_dir, "events"), ["event_type"], "value")


# ---------------------------------------------------------------- A3
@query(
    "q_zero_rate",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN value < 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_n,
           CAST(COUNT(*) AS BIGINT) AS total,
           SUM(CASE WHEN value < 1.0 THEN 1 ELSE 0 END) * 100.0 / COUNT(*) AS zero_rate_pct
    FROM events GROUP BY event_type
    """,
)
def q_zero_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: cumulative zero-latency-rate counters (rolling.py:41-43,136,141).

    Cumulative-since-start semantics -> plain un-windowed aggregate.
    """
    return M.conditional_rate(
        load(spark, sf_dir, "events"), ["event_type"], F.col("value") < 1.0
    )


# ---------------------------------------------------------------- A4
@query(
    "q_count_by_key",
    oracle="SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY user_id",
)
def q_count_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: cumulative message counts per symbol (rolling.py:38,97,126)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ---------------------------------------------------------------- A5
@query(
    "q_grouped_stats",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, value,
             CAST(ROUND(value * 100) AS HUGEINT) AS cents
      FROM events
    ),
    g AS (
      SELECT user_id, event_type,
             CAST(COUNT(cents) AS BIGINT) AS n,
             SUM(cents) AS s, SUM(cents * cents) AS ss,
             COALESCE(CAST(MIN(value) AS DOUBLE), 0.0) AS val_min,
             COALESCE(CAST(MAX(value) AS DOUBLE), 0.0) AS val_max
      FROM c GROUP BY user_id, event_type
    )
    SELECT user_id, event_type, n AS val_count,
           CASE WHEN n > 0
                THEN (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0
                ELSE 0.0 END AS val_mean,
           CASE WHEN n > 1
                THEN SQRT(CAST(n * ss - s * s AS DOUBLE)
                          / CAST(n * (n - 1) AS DOUBLE)) / 100.0
                ELSE 0.0 END AS val_std,
           val_min, val_max
    FROM g
    """,
    bench=True,
)
def q_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: per-(symbol,channel) count/mean/sample-std/min/max (rolling.py:172-184).

    stddev_samp = n-1 denominator exactly as rolling.py:180; empty/one
    sample -> 0.0 fallback (rolling.py:183-184). Computed from exact
    integer-cents partial sums (events.value is a 2-decimal grid) so
    the result is independent of partial-aggregation merge order -
    double accumulation made group means of 2-decimal values land on
    canonicalization tie points often enough to coin-flip the hash.
    """
    return M.grouped_stats_exact(
        load(spark, sf_dir, "events"), ["user_id", "event_type"], "value", "val_",
        scale=100, sum_dtype="long",
    )


# ---------------------------------------------------------------- A6
@query(
    "q_lag_diff",
    oracle="""
    WITH d AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ms,
             lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev
      FROM events
    )
    SELECT user_id, event_id, CAST(ms - prev AS BIGINT) AS stale_ms
    FROM d WHERE prev IS NOT NULL
    """,
    bench=True,
)
def q_lag_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: staleness via consecutive diff; first row per key dropped (rolling.py:85-94)."""
    d = M.lag_diff(_events(spark, sf_dir), ["user_id"], "ms", "event_id")
    return d.select("user_id", "event_id", "stale_ms")


# ---------------------------------------------------------------- A7
@query(
    "q_stale_stats",
    oracle="""
    WITH d AS (
      SELECT user_id, epoch_ms(ts) AS ms,
             lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev
      FROM events
    ),
    g AS (
      SELECT user_id,
             CAST(COUNT(ms - prev) AS BIGINT) AS n,
             SUM(CAST(ms - prev AS HUGEINT)) AS s,
             SUM(CAST(ms - prev AS HUGEINT) * CAST(ms - prev AS HUGEINT)) AS ss,
             COALESCE(CAST(MIN(ms - prev) AS DOUBLE), 0.0) AS stale_min,
             COALESCE(CAST(MAX(ms - prev) AS DOUBLE), 0.0) AS stale_max
      FROM d WHERE prev IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n AS stale_count,
           CASE WHEN n > 0
                THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                ELSE 0.0 END AS stale_mean,
           CASE WHEN n > 1
                THEN SQRT(CAST(n * ss - s * s AS DOUBLE)
                          / CAST(n * (n - 1) AS DOUBLE))
                ELSE 0.0 END AS stale_std,
           stale_min, stale_max
    FROM g
    """,
)
def q_stale_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: windowed stats over the staleness series (rolling.py:186-196).

    Exact-integer-sum variant of A5 over the lag diffs; see
    q_grouped_stats for why (merge-order determinism).
    """
    d = M.lag_diff(_events(spark, sf_dir), ["user_id"], "ms", "event_id")
    return M.grouped_stats_exact(d, ["user_id"], "stale_ms", "stale_")


# ---------------------------------------------------------------- A1 (batch analog)
@query(
    "q_window_range",
    oracle="""
    WITH d AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, value FROM events)
    SELECT user_id, event_id, ms,
           CAST(COUNT(value) OVER w AS BIGINT) AS w_count,
           AVG(value) OVER w AS w_mean,
           CAST(MIN(value) OVER w AS DOUBLE) AS w_min,
           CAST(MAX(value) OVER w AS DOUBLE) AS w_max
    FROM d
    WINDOW w AS (PARTITION BY user_id ORDER BY ms
                 RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
    """,
    bench=True,
)
def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: trailing time-window maintenance as a range frame (rolling.py:62-73).

    The deque eviction rule `t < now - window` becomes
    RANGE BETWEEN w PRECEDING AND CURRENT ROW over integer ms.
    """
    return M.sliding_range_stats(
        _events(spark, sf_dir),
        ["user_id"],
        "ms",
        "value",
        window_ms=3_600_000,
        tiebreak_col="event_id",
    )


# ---------------------------------------------------------------- A8
@query(
    "q_having_gate",
    oracle="""
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY user_id, event_type HAVING COUNT(*) >= 20
    """,
)
def q_having_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: min-sample gate, >= 20 samples (rolling.py:125,130,134,139)."""
    return M.having_gate(
        load(spark, sf_dir, "events"), ["user_id", "event_type"], min_samples=20
    )


# ---------------------------------------------------------------- K5 / flagship
@query(
    "q_csv_snapshot",
    oracle="""
    WITH base AS (
      SELECT user_id, event_type, value, epoch_ms(ts) AS ms, event_id FROM events
    ),
    latc AS (  -- integer cents: exact partial sums, deterministic hash
      SELECT user_id, event_type, value,
             CAST(ROUND(value * 100) AS HUGEINT) AS c
      FROM base
    ),
    lat0 AS (
      SELECT user_id, event_type,
             CAST(COUNT(c) AS BIGINT) AS n, SUM(c) AS s, SUM(c * c) AS ss,
             COALESCE(CAST(MIN(value) AS DOUBLE), 0.0) AS lat_min,
             COALESCE(CAST(MAX(value) AS DOUBLE), 0.0) AS lat_max
      FROM latc GROUP BY user_id, event_type
    ),
    lat AS (
      SELECT user_id, event_type, n AS lat_count,
             CASE WHEN n > 0
                  THEN (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0
                  ELSE 0.0 END AS lat_mean,
             CASE WHEN n > 1
                  THEN SQRT(CAST(n * ss - s * s AS DOUBLE)
                            / CAST(n * (n - 1) AS DOUBLE)) / 100.0
                  ELSE 0.0 END AS lat_std,
             lat_min, lat_max
      FROM lat0
    ),
    lagd AS (
      SELECT user_id, event_type,
             ms - lag(ms) OVER (PARTITION BY user_id, event_type ORDER BY ms, event_id) AS stale_ms
      FROM base
    ),
    st0 AS (
      SELECT user_id, event_type,
             CAST(COUNT(stale_ms) AS BIGINT) AS n,
             SUM(CAST(stale_ms AS HUGEINT)) AS s,
             SUM(CAST(stale_ms AS HUGEINT) * CAST(stale_ms AS HUGEINT)) AS ss,
             COALESCE(CAST(MIN(stale_ms) AS DOUBLE), 0.0) AS stale_min,
             COALESCE(CAST(MAX(stale_ms) AS DOUBLE), 0.0) AS stale_max
      FROM lagd WHERE stale_ms IS NOT NULL GROUP BY user_id, event_type
    ),
    st AS (
      SELECT user_id, event_type, n AS stale_count,
             CASE WHEN n > 0
                  THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                  ELSE 0.0 END AS stale_mean,
             CASE WHEN n > 1
                  THEN SQRT(CAST(n * ss - s * s AS DOUBLE)
                            / CAST(n * (n - 1) AS DOUBLE))
                  ELSE 0.0 END AS stale_std,
             stale_min, stale_max
      FROM st0
    )
    SELECT COALESCE(l.user_id, s.user_id) AS user_id,
           COALESCE(l.event_type, s.event_type) AS event_type,
           CAST(COALESCE(lat_count, 0) AS BIGINT) AS lat_count,
           COALESCE(lat_mean, 0.0) AS lat_mean,
           COALESCE(lat_std, 0.0) AS lat_std,
           COALESCE(lat_min, 0.0) AS lat_min,
           COALESCE(lat_max, 0.0) AS lat_max,
           CAST(COALESCE(stale_count, 0) AS BIGINT) AS stale_count,
           COALESCE(stale_mean, 0.0) AS stale_mean,
           COALESCE(stale_std, 0.0) AS stale_std,
           COALESCE(stale_min, 0.0) AS stale_min,
           COALESCE(stale_max, 0.0) AS stale_max
    FROM lat l FULL OUTER JOIN st s
      ON l.user_id = s.user_id AND l.event_type = s.event_type
    """,
    bench=True,
)
def q_csv_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5: the 13-column CSV metrics snapshot (rolling.py:147-212).

    Latency stats (A5) full-outer-joined with staleness stats (A7 over
    A6), 0.0-filled, key-sorted - the flagship composition that
    exercises read -> project -> lag -> grouped agg -> join -> order.
    """
    return M.snapshot(
        _events(spark, sf_dir),
        keys=["user_id", "event_type"],
        value_col="value",
        ts_ms_col="ms",
        tiebreak_col="event_id",
    )


# ---------------------------------------------------------------- A2 (multi-series)
@query(
    "q_unpivot_percentiles",
    oracle="""
    WITH series AS (
      SELECT 'value' AS series, value AS v FROM events
      UNION ALL
      SELECT 'ms_of_day', CAST(epoch_ms(ts) % 86400000 AS DOUBLE) FROM events
      UNION ALL
      SELECT 'k', CAST(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS DOUBLE)
      FROM events
    ),
    ranked AS (
      SELECT series, v,
             row_number() OVER (PARTITION BY series ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY series) AS n
      FROM series WHERE v IS NOT NULL
    )
    SELECT series,
           MAX(CASE WHEN rn - 1 = FLOOR(0.5 * (n - 1)) THEN v END) AS p50,
           MAX(CASE WHEN rn - 1 = FLOOR(0.95 * (n - 1)) THEN v END) AS p95,
           MAX(CASE WHEN rn - 1 = FLOOR(0.99 * (n - 1)) THEN v END) AS p99
    FROM ranked GROUP BY series
    """,
)
def q_unpivot_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 full shape: percentiles over three series at once.

    The reference tracks three latency series (ex->recv, recv->decode,
    decode->proc) through one metrics object (rolling.py:30-32); here
    three derived series unpivot via ``stack`` into (series, v) rows
    and one percentile pass covers all of them - the multi-measure
    form scales with measures x keys, not with extra passes.
    """
    ev = _events(spark, sf_dir).withColumn(
        "k", F.get_json_object("props", "$.k").try_cast("int")
    )
    series = ev.selectExpr(
        "stack(3, 'value', value,"
        " 'ms_of_day', CAST(ms % 86400000 AS DOUBLE),"
        " 'k', CAST(k AS DOUBLE)) AS (series, v)"
    )
    return M.percentiles_lower(series, ["series"], "v")
