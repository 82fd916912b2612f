"""Sketch accuracy + mergeability contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_crypto_market_data_pipeline_spark.operators import sketches as SK
from real_time_crypto_market_data_pipeline_spark.tables import load_events

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return load_events(spark, SF)


def test_daily_estimates_within_tolerance(spark, events):
    sk = SK.daily_user_sketches(events)
    approx = {r.dt: r.approx_users for r in SK.estimate_daily_users(sk).collect()}
    exact = {
        r.dt: r.n
        for r in events.withColumn(
            "dt", F.to_date(F.timestamp_millis(F.col("ms")))
        )
        .groupBy("dt")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for dt, n in exact.items():
        assert abs(approx[dt] - n) <= max(2, 0.05 * n), (dt, approx[dt], n)


def test_sketch_merge_equals_global_sketch(spark, events):
    """Re-aggregability: union of daily sketches == one global sketch
    (identical estimate), and both within 2% of the exact count."""
    sk = SK.daily_user_sketches(events)
    merged = SK.rollup_total_users(sk).first().approx_total_users
    direct = (
        events.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12)))
            .cast("long")
            .alias("n")
        ).first().n
    )
    exact = events.select("user_id").distinct().count()
    assert merged == direct  # associative merge: same sketch state
    assert abs(merged - exact) <= max(2, 0.02 * exact)


def test_approx_quantiles_bracket_exact(spark, events):
    from real_time_crypto_market_data_pipeline_spark.operators.metrics import (
        percentiles_lower,
    )

    approx = {
        r.event_type: (r.p50, r.p95, r.p99)
        for r in SK.approx_quantiles(events).collect()
    }
    exact = {
        r.event_type: (r.p50, r.p95, r.p99)
        for r in percentiles_lower(events, ["event_type"], "value").collect()
    }
    for et, (a50, a95, a99) in approx.items():
        e50, e95, e99 = exact[et]
        assert abs(a50 - e50) <= 0.05 * max(e50, 1)
        assert abs(a95 - e95) <= 0.05 * max(e95, 1)
        assert abs(a99 - e99) <= 0.05 * max(e99, 1)
