"""Mergeable-sketch operators (SURVEY 2.7 'novel sketch' family).

Exact distinct-counting at 100 TB means a full shuffle of every key;
sketches replace it with fixed-size mergeable state:

- **HLL** (``hll_sketch_agg`` / ``hll_union_agg``, Datasketches-backed
  in Spark 3.5+): a per-partition-and-group sketch of a few KB,
  merged associatively - daily sketches roll up to weekly/monthly
  totals WITHOUT rescanning history. That re-aggregability is the
  whole point: store the sketch column, answer any coarser rollup
  later.
- **KLL-style quantiles** via ``percentile_approx`` (t-digest-like
  internal): bounded-size quantile state for streaming/huge groups.

Accuracy contracts are tested (tests/test_sketches.py): estimates
within the configured relative error of exact, and the merge identity
union(sketch(day_i)) == sketch(all days) up to estimate precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tables import events_ms_col


def daily_user_sketches(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """Per-day HLL sketches of distinct users - the storable rollup unit."""
    ms = events["ms"] if "ms" in events.columns else events_ms_col(events)
    return (
        events.withColumn("dt", F.to_date(F.timestamp_millis(ms)))
        .groupBy("dt")
        .agg(
            F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("user_sketch"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )


def estimate_daily_users(sketches: DataFrame) -> DataFrame:
    return sketches.select(
        "dt",
        F.hll_sketch_estimate("user_sketch").cast("long").alias("approx_users"),
        "n_events",
    )


def rollup_total_users(sketches: DataFrame) -> DataFrame:
    """Merge all daily sketches into one total-distinct estimate.

    The merge consumes KB-sized sketches, not the raw events - this is
    the query that costs O(days) instead of O(corpus) at 100 TB.
    """
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("user_sketch"))
        .cast("long")
        .alias("approx_total_users")
    )


def approx_quantiles(
    events: DataFrame, value_col: str = "value", accuracy: int = 10_000
) -> DataFrame:
    """Bounded-state quantiles per event_type (streaming-safe A2 form)."""
    return events.groupBy("event_type").agg(
        F.percentile_approx(value_col, F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), F.lit(accuracy)).alias("q"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).select(
        "event_type",
        F.col("q")[0].alias("p50"),
        F.col("q")[1].alias("p95"),
        F.col("q")[2].alias("p99"),
        "n",
    )
