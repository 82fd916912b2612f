"""Skew-handling operators: salting patterns for hot keys.

At 100 TB a handful of symbols (BTC, ETH) dominate the event volume.
Spark 4 already absorbs hot keys natively for the common shapes -
algebraic aggregates combine map-side before the shuffle, and
rank-limited windows get a map-side ``WindowGroupLimit`` - so for
those, PLAIN code beats salting (measured: SCALING.md "Skew A/B";
salting pays a second exchange for a problem the engine no longer
has). The two-stage salted forms here are for when the per-key
partial STATE is what explodes: aggregation buffers growing with the
key's row count (collect_list, exact-percentile sort buffers),
unbounded-frame windows over a hot key, or engines without those
pushdowns. AQE (on in session.py) covers the join/sort-merge side.
(A salted rank-limited top-k twin was retired in r7: WindowGroupLimit
already bounds the hot key map-side, measured 1.5x faster plain -
SCALING.md "Skew A/B".)

Sample-std merge uses the textbook sum-of-squares identity:
``var = (ssq - sum^2/n) / (n - 1)`` - algebraically identical to
stddev_samp, so results match the unsalted operator exactly (up to
float associativity, which groupBy does not guarantee either).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_grouped_stats(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    prefix: str = "",
    num_salts: int = 16,
) -> DataFrame:
    """A5-equivalent grouped stats with a two-stage salted shuffle.

    Stage 1 groups on (keys..., salt) - hot keys spread over
    ``num_salts`` reducers; stage 2 merges the per-salt partials on
    the true keys. The second shuffle moves only
    |keys| x num_salts rows, regardless of input volume.
    """
    v = F.col(value_col)
    salted = df.withColumn("_salt", (F.rand(seed=42) * num_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(v).alias("_n"),
        F.sum(v).alias("_sum"),
        F.sum(v * v).alias("_ssq"),
        F.min(v).alias("_min"),
        F.max(v).alias("_max"),
    )
    merged = partial.groupBy(*keys).agg(
        F.sum("_n").cast("long").alias("_N"),
        F.sum("_sum").alias("_S"),
        F.sum("_ssq").alias("_Q"),
        F.min("_min").alias("_MIN"),
        F.max("_max").alias("_MAX"),
    )
    n = F.col("_N")
    s = F.col("_S")
    q = F.col("_Q")
    var = F.when(n > 1, (q - s * s / n) / (n - 1)).otherwise(F.lit(0.0))
    return merged.select(
        *keys,
        n.alias(f"{prefix}count"),
        F.coalesce(s / n, F.lit(0.0)).alias(f"{prefix}mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias(f"{prefix}std"),
        F.coalesce(F.col("_MIN").cast("double"), F.lit(0.0)).alias(f"{prefix}min"),
        F.coalesce(F.col("_MAX").cast("double"), F.lit(0.0)).alias(f"{prefix}max"),
    )
