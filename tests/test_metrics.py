"""Unit tests for metrics operators against the reference's exact rules
(rolling.py): percentile index rule, sample std, lag suppression,
min-sample gate, range-window eviction."""

from __future__ import annotations

import math
import statistics

import pytest

from real_time_crypto_market_data_pipeline_spark.operators import metrics as M
from tests import _reference_impls as R


def ref_percentile(sorted_vals, p):
    """The reference's nearest-rank-lower rule (rolling.py:107-109)."""
    if not sorted_vals:
        return None
    idx = int(p * (len(sorted_vals) - 1))
    return sorted_vals[idx]


@pytest.fixture(scope="module")
def series_df(spark):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0]
    return spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "key STRING, i LONG, v DOUBLE"
    ), vals


def test_percentile_matches_reference_rule(series_df):
    df, vals = series_df
    got = {
        r["key"]: (r.p50, r.p95, r.p99)
        for r in M.percentiles_lower(df, ["key"], "v").collect()
    }
    s = sorted(vals)
    assert got["k"] == (
        ref_percentile(s, 0.5),
        ref_percentile(s, 0.95),
        ref_percentile(s, 0.99),
    )


def test_percentile_rule_differs_from_interpolation(series_df):
    """Guard: our rule is nearest-rank-lower, NOT Spark's interpolating
    percentile(); with an even count they disagree, proving we
    implemented the reference rule rather than delegating."""
    df, _ = series_df
    even = df.where("i < 10")  # 10 values
    ours = M.percentiles_lower(even, ["key"], "v").first().p50
    spark_interp = even.selectExpr("percentile(v, 0.5) AS p").first().p
    vals = sorted([3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0])
    assert ours == vals[int(0.5 * 9)]
    assert spark_interp != ours  # interpolated midpoint differs


def test_grouped_stats_sample_std(series_df):
    df, vals = series_df
    r = R.plain_grouped_stats(df, ["key"], "v", "s_").first()
    assert r.s_count == len(vals)
    assert math.isclose(r.s_mean, statistics.fmean(vals))
    assert math.isclose(r.s_std, statistics.stdev(vals))  # n-1, rolling.py:180
    assert (r.s_min, r.s_max) == (min(vals), max(vals))


def test_grouped_stats_single_row_std_is_zero(spark):
    df = spark.createDataFrame([("k", 5.0)], "key STRING, v DOUBLE")
    r = R.plain_grouped_stats(df, ["key"], "v", "s_").first()
    assert r.s_std == 0.0  # rolling.py:192 fallback


def test_lag_diff_drops_first_row_and_allows_negative(spark):
    df = spark.createDataFrame(
        [("a", 1, 100), ("a", 2, 250), ("a", 3, 200), ("b", 4, 7)],
        "key STRING, i LONG, ms LONG",
    )
    # arrival order (order_col=i), diffing the exchange ts - the
    # reference's semantics where staleness can go negative
    rows = M.lag_diff(df, ["key"], "ms", "i", order_col="i").orderBy("i").collect()
    # first row of each key suppressed (rolling.py:87); b has only one event
    assert [(r.key, r.stale_ms) for r in rows] == [("a", 150), ("a", -50)]
    # negative staleness passes through unclamped (rolling.py:88)

    # deterministic batch ordering by (ts, tiebreak): diffs over sorted ts
    rows2 = M.lag_diff(df, ["key"], "ms", "i").orderBy("i").collect()
    assert sorted(r.stale_ms for r in rows2 if r.key == "a") == [50, 100]


def test_having_gate(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(25)] + [("b", i) for i in range(5)],
        "key STRING, i LONG",
    )
    rows = M.having_gate(df, ["key"], min_samples=20).collect()
    assert [(r.key, r.n) for r in rows] == [("a", 25)]


def test_sliding_range_window_eviction(spark):
    """Window holds only elements within window_ms of the current row
    (deque eviction rule rolling.py:67-73)."""
    df = spark.createDataFrame(
        [("k", 1, 0, 1.0), ("k", 2, 4000, 2.0), ("k", 3, 5000, 3.0), ("k", 4, 12000, 4.0)],
        "key STRING, i LONG, ms LONG, v DOUBLE",
    )
    rows = (
        M.sliding_range_stats(df, ["key"], "ms", "v", window_ms=5000, tiebreak_col="i")
        .orderBy("ms")
        .collect()
    )
    assert [r.w_count for r in rows] == [1, 2, 3, 1]  # t=12000 evicted all others
    assert rows[2].w_mean == 2.0  # (1+2+3)/3
    assert rows[3].w_min == 4.0


def test_snapshot_composition(spark):
    df = spark.createDataFrame(
        [("u", "c", 1, 100, 10.0), ("u", "c", 2, 300, 20.0), ("u", "d", 3, 50, 5.0)],
        "user STRING, chan STRING, i LONG, ms LONG, v DOUBLE",
    )
    rows = M.snapshot(df, ["user", "chan"], "v", "ms", "i").collect()
    by_key = {(r.user, r.chan): r for r in rows}
    uc = by_key[("u", "c")]
    assert uc.lat_count == 2 and uc.stale_count == 1
    assert uc.stale_mean == 200.0
    ud = by_key[("u", "d")]
    # single event: no staleness rows -> all-zero stale side (rolling.py:183-184)
    assert ud.stale_count == 0 and ud.stale_mean == 0.0 and ud.stale_std == 0.0


def test_snapshot_epoch_scale_values_need_decimal(spark):
    """Regression: replay-mode latency = now - captured exchange ts is
    epoch-scale (~5e10 ms and growing), so its squares overflow a long
    sum under ANSI; the streaming sink passes decimal accumulators."""
    big = 5.0e10  # ~19 months in ms; big^2 * 3 rows >> 2^63
    df = spark.createDataFrame(
        [("s", "c", i, i * 100, big + i) for i in range(1, 4)],
        "sym STRING, chan STRING, i LONG, ms LONG, lat DOUBLE",
    )
    rows = M.snapshot(
        df, ["sym", "chan"], "lat", "ms", "i",
        value_scale=1, value_sum_dtype="decimal(38,0)",
    ).collect()
    assert rows[0].lat_count == 3
    assert rows[0].lat_mean == big + 2.0
    # same frame through the long fast path must fail loudly, not wrap
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import ArithmeticException

    with _pytest.raises((ArithmeticException, Py4JJavaError)):
        M.snapshot(df, ["sym", "chan"], "lat", "ms", "i").collect()


def test_conditional_rate(spark):
    df = spark.createDataFrame(
        [("k", 0.0), ("k", 0.0), ("k", 5.0), ("k", 7.0)], "key STRING, v DOUBLE"
    )
    from pyspark.sql import functions as F

    r = M.conditional_rate(df, ["key"], F.col("v") == 0.0).first()
    assert (r.zero_n, r.total) == (2, 4)
    assert r.zero_rate_pct == 50.0


def test_asof_join_semantics(spark):
    """As-of edge cases: at-or-before match, same-ts visibility,
    no-earlier-quote -> null, key isolation."""
    from real_time_crypto_market_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("A", 1, 100, 9.0), ("A", 2, 200, 9.5), ("A", 3, 50, 8.0), ("B", 4, 100, 1.0)],
        "key STRING, event_id LONG, ms LONG, px DOUBLE",
    )
    right = spark.createDataFrame(
        [("A", -1, 100, 99.0), ("A", -2, 150, 98.0), ("B", -3, 500, 7.0)],
        "key STRING, event_id LONG, ms LONG, quote DOUBLE",
    )
    out = {
        r.event_id: r.asof_quote
        for r in asof_join(
            left, right, keys=["key"], ts_col="ms",
            right_cols=["quote"], tiebreak_col="event_id",
        ).collect()
    }
    assert out[1] == 99.0  # same-ts quote visible (at-or-before)
    assert out[2] == 98.0  # latest of the two earlier quotes
    assert out[3] is None  # no quote at-or-before ms=50
    assert out[4] is None  # B's only quote is later; A's quotes invisible


def test_asof_same_source_matches_two_input_form(spark):
    """r20: the fused single-source as-of (one scan, tie resolution in
    the window order) must reproduce the two-input form's rows exactly,
    including right ties at equal (key, ts) resolving to the greatest
    right tiebreak and its payload."""
    from pyspark.sql import functions as F

    from real_time_crypto_market_data_pipeline_spark.operators.asof import (
        asof_join,
        asof_join_same_source,
    )

    events = spark.createDataFrame(
        [  # kind L=left/trade, R=right/quote; two R ties at (A, 100)
            ("A", "L", 1, 100, 9.0), ("A", "R", -1, 100, 99.0),
            ("A", "R", -2, 100, 97.0), ("A", "L", 2, 200, 9.5),
            ("A", "R", -3, 150, 98.0), ("A", "L", 3, 50, 8.0),
            ("B", "L", 4, 100, 1.0), ("B", "R", -5, 500, 7.0),
        ],
        "key STRING, kind STRING, event_id LONG, ms LONG, px DOUBLE",
    )
    ev = events.withColumns({"qms": F.col("ms"), "qvalue": F.col("px")})
    fused = asof_join_same_source(
        ev, keys=["key"], ts_col="ms",
        left_pred=F.col("kind") == "L", right_pred=F.col("kind") == "R",
        left_cols=["event_id", "px"], right_payload=["qms", "qvalue"],
        right_tiebreak="px",
    ).select("key", "event_id", "ms", "px", "asof_qms", "asof_qvalue")
    left = ev.where(F.col("kind") == "L").select("key", "event_id", "ms", "px")
    right = (
        ev.where(F.col("kind") == "R")
        .groupBy("key", "ms")
        .agg(F.max("px").alias("qvalue"))
        .select("key", "ms", F.col("ms").alias("qms"), "qvalue",
                F.lit(-1).cast("long").alias("event_id"))
    )
    two_input = asof_join(
        left, right, keys=["key"], ts_col="ms",
        right_cols=["qms", "qvalue"], tiebreak_col="event_id",
    ).select("key", "event_id", "ms", "px", "asof_qms", "asof_qvalue")
    assert sorted(map(tuple, fused.collect())) == sorted(
        map(tuple, two_input.collect())
    )
    # the tie at (A, 100): same-ts quotes visible, max px (99.0) wins
    tied = {r.event_id: r.asof_qvalue for r in fused.collect()}
    assert tied[1] == 99.0


def test_rollup_merge_is_lossless(spark):
    """Hour partials merged to day == day stats computed from raw rows."""
    from pyspark.sql import functions as F

    from real_time_crypto_market_data_pipeline_spark.operators.metrics import (
        grouped_stats_exact,
        merge_rollup,
        rollup_partials,
    )
    from real_time_crypto_market_data_pipeline_spark.tables import load_events

    ev = load_events(spark, "/root/testdata/sf0.01")
    via_partials = merge_rollup(
        rollup_partials(ev, ["event_type"], "value", "ms", grain_ms=3_600_000),
        ["event_type"],
        coarse_factor=24,
    )
    direct = grouped_stats_exact(
        ev.withColumn("bucket", F.expr("ms DIV 86400000")),
        ["event_type", "bucket"],
        "value",
        prefix="val_",
        scale=100,
        sum_dtype="long",
    )
    a = {tuple(r[:2]): tuple(r[2:]) for r in via_partials.collect()}
    b = {
        (r["event_type"], r["bucket"]): (
            r["val_count"], r["val_mean"], r["val_std"], r["val_min"], r["val_max"]
        )
        for r in direct.collect()
    }
    assert a == b  # bit-identical, not approx: integer sums merge exactly


def test_ohlc_rollup_associative_and_lossless(spark):
    """hour -> day candles == direct day candles, and the merge is
    associative: hour -> 6h -> day gives the identical result."""
    from pyspark.sql import functions as F

    from real_time_crypto_market_data_pipeline_spark.operators.metrics import (
        merge_ohlc,
        ohlc_partials,
    )
    from real_time_crypto_market_data_pipeline_spark.tables import load_events

    ev = load_events(spark, "/root/testdata/sf0.01")
    hourly = ohlc_partials(
        ev, ["event_type"], "value", "ms", "event_id", grain_ms=3_600_000
    )
    day_direct = {
        tuple(r[:2]): tuple(r[2:])
        for r in merge_ohlc(
            ohlc_partials(
                ev, ["event_type"], "value", "ms", "event_id", grain_ms=86_400_000
            ),
            ["event_type"],
            coarse_factor=1,
        ).collect()
    }
    via_hours = {
        tuple(r[:2]): tuple(r[2:])
        for r in merge_ohlc(hourly, ["event_type"], coarse_factor=24).collect()
    }
    # two-step merge: 6-hour intermediate candlesticks, then day.
    # merge_ohlc re-derives open/close from the argmin/argmax structs it
    # groups, so chain ohlc_partials-shaped frames: regroup the partials
    six = hourly.groupBy(
        "event_type", F.expr("bucket DIV 6").alias("bucket")
    ).agg(
        F.min("o").alias("o"), F.max("c").alias("c"),
        F.max("high").alias("high"), F.min("low").alias("low"),
        F.sum("n_ticks").cast("long").alias("n_ticks"),
    )
    via_six = {
        tuple(r[:2]): tuple(r[2:])
        for r in merge_ohlc(six, ["event_type"], coarse_factor=4).collect()
    }
    assert via_hours == day_direct
    assert via_six == day_direct
