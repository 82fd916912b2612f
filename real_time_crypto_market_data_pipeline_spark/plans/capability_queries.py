"""Capability queries beyond the reference surface (SURVEY 2.6).

Operators every production event-analytics engine needs that the reference
lacks entirely: as-of joins (trade -> prevailing quote), sessionization,
pivot, rollup, and set operations. Each is oracle-checked; the as-of oracle
uses DuckDB's native ASOF JOIN against our union+window implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load, load_events
from .registry import query

# Type-adaptive integer epoch-ms loader (tables.events_ms_col).
_events = load_events


@query(
    "q_asof_join",
    oracle="""
    WITH l AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ms, value
      FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT user_id, epoch_ms(ts) AS qms, MAX(value) AS qvalue
      FROM events WHERE event_type = 'view' GROUP BY user_id, epoch_ms(ts)
    )
    SELECT l.user_id, l.event_id, l.ms, l.value,
           r.qms AS asof_qms, r.qvalue AS asof_qvalue
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ms >= r.qms
    """,
    bench=True,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest at-or-before view.

    Both sides live in the SAME event stream, so the fused
    single-source form applies (asof.asof_join_same_source, r20): one
    scan, one shuffle+sort per key, no range-join blowup; the previous
    right-side MAX pre-aggregation exchange folds into the window order
    (ties sort by value, the carried last_value IS the max). Row-
    identical to the two-input form (test_metrics) and verified against
    DuckDB's native ASOF JOIN over the pre-aggregated quotes.
    """
    from ..operators.asof import asof_join_same_source

    ev = _events(spark, sf_dir).withColumns(
        {"qms": F.col("ms"), "qvalue": F.col("value")}
    )
    fused = asof_join_same_source(
        ev,
        keys=["user_id"],
        ts_col="ms",
        left_pred=F.col("event_type") == "purchase",
        right_pred=F.col("event_type") == "view",
        left_cols=["event_id", "value"],
        right_payload=["qms", "qvalue"],
        right_tiebreak="value",
    )
    return fused.select(
        "user_id", "event_id", "ms", "value", "asof_qms", "asof_qvalue"
    )


@query(
    "q_sessionize",
    oracle="""
    WITH d AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ms,
             lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_ms(ts), event_id) AS prev
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, ms,
             CASE WHEN prev IS NULL OR ms - prev > 86400000 THEN 1 ELSE 0 END AS is_new
      FROM d
    )
    SELECT user_id, event_id,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_id
    FROM marked
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap marking + running sum (24 h inactivity gap).

    The batch form of session_window - one keyed sort serves both window
    passes. Explicit ROWS frame so tie handling matches the oracle exactly.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    marked = ev.withColumn("prev", F.lag("ms").over(w)).withColumn(
        "is_new",
        F.when(
            F.col("prev").isNull() | (F.col("ms") - F.col("prev") > 86_400_000), 1
        ).otherwise(0),
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    return marked.select(
        "user_id",
        "event_id",
        F.sum("is_new").over(w_run).cast("long").alias("session_id"),
    )


@query(
    "q_pivot",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
    FROM events GROUP BY user_id
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type count matrix (explicit value list so
    the output schema is static - required for a deterministic plan)."""
    kinds = ["click", "view", "purchase", "signup", "error"]
    out = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return out.select("user_id", *[F.col(k).cast("long").alias(k) for k in kinds])


@query(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(l_quantity) AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup: subtotal hierarchy (flag, flag+status, grand total) -
    grouping-set nulls mark the subtotal rows identically in both engines."""
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS DOUBLE)
             / 100.0 AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY GROUPING SETS ((l_returnflag), (o_orderpriority),
                            (l_returnflag, o_orderpriority))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: an arbitrary subset of the cube lattice.

    Rollup and cube are fixed lattices; GROUPING SETS picks exactly the
    aggregation levels a dashboard needs - here both one-dimension
    marginals plus the full cross, skipping the grand total. Spark
    plans all three sets through ONE Expand + one aggregate over a
    single scan, not three scans. The price sum runs in integer cents
    (exact under any merge order) because the marginal groups re-sum
    the same values in different partial orders than the cross groups.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupingSets(
            [["l_returnflag"], ["o_orderpriority"], ["l_returnflag", "o_orderpriority"]],
            "l_returnflag",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast(
                    "double"
                )
                / 100.0
            ).alias("sum_price"),
        )
    )


@query(
    "q_set_ops",
    oracle="""
    SELECT user_id FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ) t
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
    GROUP BY user_id HAVING COUNT(*) >= 17
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: clickers ∩ purchasers − heavy-error users."""
    ev = load(spark, sf_dir, "events")
    ids = lambda t: ev.where(F.col("event_type") == t).select("user_id").distinct()  # noqa: E731
    heavy_err = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 17)
        .select("user_id")
    )
    return ids("click").intersect(ids("purchase")).exceptAll(heavy_err).distinct()


@query(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(l_extendedprice) AS sum_price
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube: all 2^2 grouping-set combinations in one pass."""
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("l_extendedprice").alias("sum_price"),
        )
    )


@query(
    "q_semi_anti",
    oracle="""
    SELECT c_custkey, 'has_urgent' AS status FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT c_custkey, 'no_orders' FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins: EXISTS and NOT EXISTS as left_semi / left_anti.

    Both lower to broadcast joins on the filtered orders side - the
    shape where EXISTS beats a join+distinct (no fact-side blowup).
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    has_urgent = (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", F.lit("has_urgent").alias("status"))
    )
    no_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", F.lit("no_orders").alias("status"))
    )
    return has_urgent.unionByName(no_orders)


@query(
    "q_above_customer_avg",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders i
                          WHERE i.o_custkey = o.o_custkey)
    """,
)
def q_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders above their customer's average.

    Decorrelated into a window average - one shuffle on the
    correlation key instead of a per-row subquery; Catalyst performs
    the same rewrite for the SQL form.
    """
    w = Window.partitionBy("o_custkey")
    return (
        load(spark, sf_dir, "orders")
        .withColumn("_avg", F.avg("o_totalprice").over(w))
        .where(F.col("o_totalprice") > F.col("_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_twap",
    oracle="""
    WITH t AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_ms(ts) AS ms,
             LEAD(epoch_ms(ts))
               OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
               AS next_ms
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(next_ms) AS BIGINT) AS n_intervals,
           CAST(SUM(next_ms - ms) AS BIGINT) AS total_ms,
           (CAST(SUM(cents * (next_ms - ms)) AS DOUBLE) / 100.0)
             / CAST(SUM(next_ms - ms) AS DOUBLE) AS twap
    FROM t
    WHERE next_ms IS NOT NULL
    GROUP BY user_id
    """,
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price per key (TWAP).

    Each observation holds until the next one, so its weight is the interval
    to the successor (lead over event time, event_id tiebreak); the open last
    interval is dropped. The market-data twin of the reference's rolling stats
    (rolling.py:67-95): where those weight every sample equally, TWAP weights
    by holding time - the difference matters exactly when sampling is
    irregular, which the reference's own staleness metric measures.

    Exactness: value has 2 decimals, so price*weight is computed in integer
    cents x integer ms - the BIGINT partial sums are exact under any
    partitioning/merge order, and the single final division is the only float
    op (same lesson as q_salted_stats). One shuffle for the window, reused by
    the aggregation (both key on user_id).
    """
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    t = (
        _events(spark, sf_dir)
        .select(
            "user_id",
            "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
            "ms",
        )
        .withColumn("next_ms", F.lead("ms").over(w))
        .where(F.col("next_ms").isNotNull())
        .withColumn("dt", F.col("next_ms") - F.col("ms"))
    )
    return t.groupBy("user_id").agg(
        F.count("dt").alias("n_intervals"),
        F.sum("dt").alias("total_ms"),
        (
            (F.sum(F.col("cents") * F.col("dt")).cast("double") / F.lit(100.0))
            / F.sum("dt").cast("double")
        ).alias("twap"),
    )


@query(
    "q_rollup_merge",
    oracle="""
    WITH c AS (
      SELECT event_type, value, epoch_ms(ts) // 86400000 AS bucket,
             CAST(ROUND(value * 100) AS HUGEINT) AS cents
      FROM events
    ),
    g AS (
      SELECT event_type, bucket,
             CAST(COUNT(cents) AS BIGINT) AS n,
             SUM(cents) AS s, SUM(cents * cents) AS ss,
             COALESCE(CAST(MIN(value) AS DOUBLE), 0.0) AS val_min,
             COALESCE(CAST(MAX(value) AS DOUBLE), 0.0) AS val_max
      FROM c GROUP BY event_type, bucket
    )
    SELECT event_type, bucket, n AS val_count,
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
    bench="extra",
)
def q_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hour partials -> day stats.

    ``metrics.rollup_partials`` stores exact-integer-sum partial aggregates
    per (event_type, hour); ``metrics.merge_rollup`` answers the day grain by
    merging 24 hour-buckets per day - WITHOUT rescanning raw rows. The oracle
    computes the day stats directly from raw events, so a driver match proves
    the rollup is lossless: stored fine-grain partials can serve any coarser
    report. At 100 TB this is the materialized-rollup pattern (TimescaleDB
    continuous aggregates / Druid rollup): the daily query costs
    O(hour-buckets) instead of O(corpus), and the integer accumulators make
    the merge exact under any order - the same re-aggregability contract the
    HLL sketch rollup (q_sketch_distinct) provides for distinct counts.
    """
    from ..operators import metrics as M

    partials = M.rollup_partials(
        _events(spark, sf_dir),
        ["event_type"],
        "value",
        "ms",
        grain_ms=3_600_000,
    )
    return M.merge_rollup(partials, ["event_type"], coarse_factor=24)


@query(
    "q_realized_vol",
    oracle="""
    WITH d AS (
      SELECT user_id, value,
             lag(value) OVER (PARTITION BY user_id
                              ORDER BY epoch_ms(ts), event_id) AS prev
      FROM events
    ),
    r AS (
      SELECT user_id, LN(value / prev) AS lr
      FROM d WHERE prev IS NOT NULL AND prev > 0 AND value > 0
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_returns,
           SUM(lr * lr) AS realized_var,
           SQRT(SUM(lr * lr)) AS realized_vol
    FROM r GROUP BY user_id
    """,
    # extras, not headline: the headline total is pinned to the round-1
    # query set so BENCH totals stay comparable round over round
    bench="extra",
)
def q_realized_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized volatility per key: sum of squared log returns.

    The standard market-microstructure estimator (Andersen/Bollerslev realized
    variance): successive observations per key (event-time order, event_id
    tiebreak) give log returns ln(p_t/p_{t-1}); their squared sum over the
    sample is realized variance, its square root realized volatility. Extends
    the reference's rolling latency stats (rolling.py:67-95) with the
    estimator an exchange-data consumer actually runs on the price stream.

    Plan: one shuffle on user_id serves both the lag window and the
    aggregation (same key); the squared-log-return map stays in whole-stage
    codegen. Float sums commute to well under the driver's 6-significant-digit
    rounding; positivity guards on both sides keep LN total. Scale: window +
    agg on the same key is exchange-reusing, no second shuffle at 100 TB.
    """
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    d = (
        _events(spark, sf_dir)
        .select("user_id", "event_id", "ms", "value")
        .withColumn("prev", F.lag("value").over(w))
        .where(F.col("prev").isNotNull() & (F.col("prev") > 0) & (F.col("value") > 0))
        .withColumn("lr", F.log(F.col("value") / F.col("prev")))
    )
    rv = F.sum(F.col("lr") * F.col("lr"))
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_returns"),
        rv.alias("realized_var"),
        F.sqrt(rv).alias("realized_vol"),
    )


@query(
    "q_drawdown",
    oracle="""
    WITH d AS (
      SELECT user_id, value,
             MAX(value) OVER (PARTITION BY user_id
                              ORDER BY epoch_ms(ts), event_id
                              ROWS UNBOUNDED PRECEDING) AS runmax
      FROM events WHERE value > 0
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           MAX(runmax) AS peak,
           MAX((runmax - value) / runmax) AS max_drawdown
    FROM d GROUP BY user_id
    """,
)
def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per key via a running-maximum window.

    Drawdown at each observation is the fractional drop from the running peak
    ((peak - p) / peak); the max over the series is the risk metric every
    trading-data consumer derives from the price stream the reference ships.
    Running max is a rows-frame window -- no self-join, no O(n^2) -- and the
    groupBy reuses the window's user_id exchange. Every per-row value is
    deterministic (max and division, no order-dependent float sums), so the
    oracle hash matches bit-for-bit modulo the driver's rounding.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = (
        _events(spark, sf_dir)
        .select("user_id", "event_id", "ms", "value")
        .where(F.col("value") > 0)
        .withColumn("runmax", F.max("value").over(w))
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.max("runmax").alias("peak"),
        F.max((F.col("runmax") - F.col("value")) / F.col("runmax")).alias(
            "max_drawdown"
        ),
    )


@query(
    "q_interval_join",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id, epoch_ms(ts) AS s,
             epoch_ms(ts) + 1800000 AS e
      FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT user_id, epoch_ms(ts) AS ms,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'view'
    )
    SELECT p.user_id, p.event_id,
           CAST(COUNT(v.ms) AS BIGINT) AS n_views,
           CAST(COALESCE(SUM(v.cents), 0) AS BIGINT) AS view_cents
    FROM p LEFT JOIN v
      ON p.user_id = v.user_id AND v.ms >= p.s AND v.ms <= p.e
    GROUP BY p.user_id, p.event_id
    """,
    bench="extra",
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via bin rewrite: views landing in each purchase window.

    Each purchase opens a 30-minute window; count/sum the same user's views
    inside it. The oracle is the naive inequality join; the Spark plan is
    operators/rangejoin.interval_join_binned - an equi-join on (user_id,
    time-bin) with an exact BETWEEN recheck, so no BroadcastNestedLoopJoin
    appears anywhere in the plan (the O(n x m) trap a literal translation
    would hit at 100 TB). The bin width equals the window length, so each
    interval explodes to at most 2 bins. Sums ride in integer cents (exact
    under any merge order); purchases with zero views survive through the
    operator's LEFT mode (null point rows that the count/sum skip), so each
    source is scanned exactly once - an inner join + restore-join would
    re-scan the purchase side (lineage duplication, observed as a third
    FileScan in that form's plan).
    """
    from ..operators.rangejoin import interval_join_binned

    ev = _events(spark, sf_dir)
    win_ms = 1_800_000
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.col("ms").alias("s"),
        (F.col("ms") + win_ms).alias("e"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("ms").alias("v_ms"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    matched = interval_join_binned(
        views.withColumnRenamed("v_user_id", "user_id"),
        purchases,
        keys=["user_id"],
        point_ts="v_ms",
        start_col="s",
        end_col="e",
        bin_width=win_ms,
        how="left",
    )
    # count(v_ms)/sum skip the nulls LEFT mode emits for zero-match
    # (interval, bin) rows, so unmatched purchases come out as 0/0
    return matched.groupBy("user_id", "event_id").agg(
        F.count("v_ms").cast("long").alias("n_views"),
        F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("view_cents"),
    )


@query(
    "q_zorder_key",
    oracle="""
    WITH d AS (
      SELECT event_id,
             user_id % 65536 AS x,
             (epoch_ms(ts) // 3600000) % 65536 AS y
      FROM events
    )
    SELECT event_id, x, y,
           CAST(list_sum(list_transform(generate_series(0, 15),
                i -> (((x >> i) & 1) << (2 * i))
                     + (((y >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS zkey
    FROM d
    """,
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user, hour) - layout op.

    Interleaves the low 16 bits of the user dimension with the low 16
    bits of the hour bucket: rows close in EITHER dimension land close
    in zkey order. Writing the table sorted by zkey (sortWithinPartitions
    -> parquet row groups) gives min/max stats that are tight in BOTH
    dimensions, so a 2-D predicate (user range x time range) prunes row
    groups the way a 1-D sort can only prune for one dimension - the
    Delta/Iceberg OPTIMIZE ZORDER primitive, expressed as a pure
    codegen'd projection (no shuffle, no UDF; the write-side sort is
    the only exchange and it replaces the one the writer needs anyway).
    The oracle replays the interleave bit-for-bit, proving the key is
    engine-portable (a DuckDB reader would prune identically).
    """
    ev = _events(spark, sf_dir)
    x = (F.col("user_id") % 65536).alias("x")
    # integer `div`, not float /: keeps the repo's integer-only
    # time-bucketing convention (tables.py events_ms_col) exact at any
    # future ts magnitude
    y = (F.expr("ms div 3600000") % 65536).alias("y")
    d = ev.select("event_id", x, y)
    zkey = None
    for i in range(16):
        bit_x = F.shiftleft(F.shiftright(F.col("x"), i).bitwiseAND(F.lit(1)), 2 * i)
        bit_y = F.shiftleft(F.shiftright(F.col("y"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = bit_x + bit_y
        zkey = term if zkey is None else zkey + term
    return d.select("event_id", "x", "y", zkey.cast("long").alias("zkey"))


@query(
    "q_correlation",
    oracle="""
    WITH d AS (
      SELECT event_type, epoch_ms(ts) // 86400000 AS day,
             AVG(value) AS mean_val
      FROM events GROUP BY event_type, epoch_ms(ts) // 86400000
    ),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.mean_val AS x, b.mean_val AS y
      FROM d a JOIN d b ON a.day = b.day AND a.event_type < b.event_type
    )
    SELECT type_a, type_b,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
             / SQRT((COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                    * (COUNT(*) * SUM(y * y) - SUM(y) * SUM(y))) AS corr
    FROM p GROUP BY type_a, type_b
    """,
)
def q_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-series correlation matrix (pairs-trading screen).

    Pearson correlation of daily mean values between every pair of
    event types. The scale property is the ORDER of operations:
    aggregate each series to the common (type, day) grain FIRST, so
    the pairwise expansion runs over |types| x |days| rows - thousands
    - instead of aligning raw streams (the naive form joins 10^11 raw
    events against themselves). The oracle writes the pairing as a
    self-join; the Spark plan instead collects each day's (type, mean)
    structs and expands pairs with higher-order functions, because a
    DataFrame self-join duplicates lineage and re-scans the corpus
    twice (observed in the joined form's plan) - this form has ONE
    FileScan, and every post-collapse exchange carries day-grain rows.
    The correlation is spelled out as the explicit sum formula on both
    sides rather than each engine's corr() builtin, so the only
    divergence is float rounding (inside the driver's
    6-significant-digit hash window).
    """
    d = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.expr("ms div 86400000").alias("day"),  # integer div: exact at any ts magnitude
        )
        .agg(F.avg("value").alias("mean_val"))
    )
    per_day = d.groupBy("day").agg(
        F.collect_list(F.struct("event_type", "mean_val")).alias("series")
    )
    arr = F.col("series")
    pairs = F.filter(
        F.flatten(
            F.transform(
                arr,
                lambda s: F.transform(
                    arr,
                    lambda t: F.struct(
                        s["event_type"].alias("type_a"),
                        t["event_type"].alias("type_b"),
                        s["mean_val"].alias("x"),
                        t["mean_val"].alias("y"),
                    ),
                ),
            )
        ),
        lambda pr: pr["type_a"] < pr["type_b"],
    )
    p = per_day.select(F.explode(pairs).alias("pr")).select("pr.*")
    n = F.count(F.lit(1))
    sx, sy = F.sum("x"), F.sum("y")
    sxy, sx2, sy2 = (
        F.sum(F.col("x") * F.col("y")),
        F.sum(F.col("x") * F.col("x")),
        F.sum(F.col("y") * F.col("y")),
    )
    return p.groupBy("type_a", "type_b").agg(
        n.cast("long").alias("n_days"),
        ((n * sxy - sx * sy) / F.sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy))).alias(
            "corr"
        ),
    )


@query(
    "q_funnel",
    oracle="""
    WITH a AS (
      SELECT user_id, MIN(epoch_ms(ts)) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    b AS (
      SELECT e.user_id, MIN(epoch_ms(e.ts)) AS t_click
      FROM events e JOIN a ON e.user_id = a.user_id
      WHERE e.event_type = 'click' AND epoch_ms(e.ts) >= a.t_view
      GROUP BY e.user_id
    ),
    c AS (
      SELECT e.user_id, MIN(epoch_ms(e.ts)) AS t_purchase
      FROM events e JOIN b ON e.user_id = b.user_id
      WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= b.t_click
      GROUP BY e.user_id
    )
    SELECT a.user_id, a.t_view, b.t_click, c.t_purchase,
           CAST(CASE WHEN c.user_id IS NOT NULL THEN 3
                     WHEN b.user_id IS NOT NULL THEN 2
                     ELSE 1 END AS BIGINT) AS stages_reached
    FROM a LEFT JOIN b ON a.user_id = b.user_id
            LEFT JOIN c ON a.user_id = c.user_id
    """,
    bench="extra",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: view -> click -> purchase, in order.

    Stage N counts only events AT OR AFTER the user's stage-N-1 entry
    time, the semantics product-analytics engines call a strict-order
    funnel (a click before the first view does not advance). The
    oracle spells it as three chained aggregate+join CTEs; the Spark
    plan compiles the same semantics to ONE scan, ONE exchange:

    - a RANGE-frame running min per user marks, at every event, the
      earliest view so far ("a view at-or-before me exists") - so a
      click qualifies exactly when that running min is non-null (the
      frame only holds ms <= current, making `>=` structural);
    - a second running min over the QUALIFIED click times does the
      same for purchases (both windows share one partitioning+sort);
    - one groupBy on the window's user_id partitioning takes the
      stage minimums.

    The chained-join form (the naive translation) re-scans events five
    times; this windowed form was adopted after reading that plan. No
    per-user event-array collect - a hot user streams through the sort.
    """
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ms")
    # RANGE frame on ms: equal-ms peers are IN the frame, so the
    # running mins implement the oracle's `>=` comparisons exactly
    # (ordering by event_id instead would drop same-ms qualifiers).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    view_ms = F.when(F.col("event_type") == "view", F.col("ms"))
    run_view = F.min(view_ms).over(w)
    qual_click = F.when(
        (F.col("event_type") == "click") & run_view.isNotNull(), F.col("ms")
    )
    staged = ev.select(
        "user_id",
        "event_type",
        "ms",
        view_ms.alias("v_ms"),
        qual_click.alias("qc_ms"),
    )
    run_click = F.min(F.col("qc_ms")).over(w)
    qual_purchase = F.when(
        (F.col("event_type") == "purchase") & run_click.isNotNull(), F.col("ms")
    )
    per_user = (
        staged.select("user_id", "v_ms", "qc_ms", qual_purchase.alias("qp_ms"))
        .groupBy("user_id")
        .agg(
            F.min("v_ms").alias("t_view"),
            F.min("qc_ms").alias("t_click"),
            F.min("qp_ms").alias("t_purchase"),
        )
        .where(F.col("t_view").isNotNull())
    )
    return per_user.select(
        "user_id",
        "t_view",
        "t_click",
        "t_purchase",
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .otherwise(1)
        .cast("long")
        .alias("stages_reached"),
    )


@query(
    "q_retention_cohort",
    oracle="""
    WITH presence AS (
      SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS week
      FROM events
    ),
    cohorted AS (
      SELECT user_id, week,
             MIN(week) OVER (PARTITION BY user_id) AS cohort_week
      FROM presence
    )
    SELECT cohort_week, week - cohort_week AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM cohorted GROUP BY cohort_week, week - cohort_week
    """,
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users by first-seen week x weeks since.

    The product-analytics staple: bucket every user into the week of
    their first event (the cohort), then count how many of each
    cohort are still active N weeks later. Order of operations is the
    scale property: the raw stream first collapses to DISTINCT
    (user, week) presence - one map-side-combined exchange that
    shrinks 10^11 events to |users| x |weeks| rows - and the cohort
    window plus the final count run over that small relation (the
    per-user min window costs a second, tiny exchange; count(*) over
    presence rows equals count(distinct user) because presence is
    already distinct).
    """
    wk = F.expr("ms div 604800000").alias("week")  # integer div: exact at any ts magnitude
    presence = (_events(spark, sf_dir).select("user_id", wk).distinct())
    w = Window.partitionBy("user_id")
    cohorted = presence.withColumn("cohort_week", F.min("week").over(w))
    return (
        cohorted.select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@query(
    "q_session_stats",
    oracle="""
    WITH d AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ms, value,
             lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_ms(ts), event_id) AS prev
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, ms, value,
             CASE WHEN prev IS NULL OR ms - prev > 86400000 THEN 1 ELSE 0 END AS is_new
      FROM d
    ),
    sess AS (
      SELECT user_id, ms, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(ms) AS BIGINT) AS start_ms,
           CAST(MAX(ms) - MIN(ms) AS BIGINT) AS duration_ms,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session summary stats over the 24 h-gap sessionization.

    What an analyst reads off sessions: events per session, start,
    duration, and total value (exact integer cents). Composes the
    q_sessionize window (lag-gap mark + running sum) with a grouped
    aggregate whose keys (user_id, session_id) are a SUPERSET of the
    window's user_id partitioning - HashPartitioning(user_id)
    satisfies the aggregate's clustered distribution, so the whole
    query is one scan, one exchange, one sort (plan-audited).
    """
    ev = _events(spark, sf_dir).select("user_id", "event_id", "ms", "value")
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    marked = ev.withColumn("prev", F.lag("ms").over(w)).withColumn(
        "is_new",
        F.when(
            F.col("prev").isNull() | (F.col("ms") - F.col("prev") > 86_400_000), 1
        ).otherwise(0),
    )
    sess = marked.select(
        "user_id",
        "ms",
        "value",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ms").cast("long").alias("start_ms"),
        (F.max("ms") - F.min("ms")).cast("long").alias("duration_ms"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("long")
        .alias("value_cents"),
    )
