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


def test_bloom_no_false_negatives_and_fp_rate(spark):
    """Every inserted key probes true (bloom contract: zero false
    negatives); disjoint keys probe true at no more than a few times
    the analytic (1 - e^{-kn/m})^k rate."""
    import math

    from pyspark.sql import functions as F

    n, m, k = 5_000, 1 << 16, 5
    keys = spark.range(n).select(F.concat(F.lit("in"), F.col("id")).alias("key"))
    other = spark.range(n).select(
        F.concat(F.lit("out"), F.col("id")).alias("key")
    )
    bitmap = SK.bloom_bitmap(keys, "key", num_bits=m, num_hashes=k)

    def hits(df):
        return (
            df.crossJoin(F.broadcast(bitmap))
            .where(SK.bloom_contains(F.col("bloom"), F.col("key"), m, k))
            .count()
        )

    assert hits(keys) == n
    analytic_fp = (1 - math.exp(-k * n / m)) ** k
    assert hits(other) <= max(3 * analytic_fp, 0.01) * n


def test_decontaminate_bloom_matches_exact_variant(spark):
    """The bloom-prefiltered decontamination returns the identical
    flagged set: false positives of the bloom pass are removed by the
    exact verify join."""
    from real_time_crypto_market_data_pipeline_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    exact = sorted(
        (r.doc_id, r.n_overlap)
        for r in QUERIES["q_decontaminate"](spark, sf).collect()
    )
    bloom = sorted(
        (r.doc_id, r.n_overlap)
        for r in QUERIES["q_decontaminate_bloom"](spark, sf).collect()
    )
    assert bloom == exact
    assert len(exact) > 0  # non-vacuous at sf0.001
