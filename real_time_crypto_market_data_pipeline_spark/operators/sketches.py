"""Mergeable-sketch operators (SURVEY 2.7 'novel sketch' family).

Exact distinct-counting at 100 TB means a full shuffle of every key; sketches
replace it with fixed-size mergeable state:

- **HLL** (``hll_sketch_agg`` / ``hll_union_agg``, Datasketches-backed in
  Spark 3.5+): a per-partition-and-group sketch of a few KB, merged
  associatively - daily sketches roll up to weekly/monthly totals WITHOUT
  rescanning history. That re-aggregability is the whole point: store the
  sketch column, answer any coarser rollup later.
- **KLL-style quantiles** via ``percentile_approx`` (t-digest-like internal):
  bounded-size quantile state for streaming/huge groups.
- **Bloom membership** (:func:`bloom_bitmap` / :func:`bloom_contains`): a
  hand-built distributed bloom filter in pure DataFrame ops, for semi-join
  pruning when the build side is too big to broadcast as an exact set but its
  BITMAP is not. Spark's own runtime bloom-filter join pruning
  (tests/test_scale_patterns.py) does this implicitly for equi-joins; the
  explicit form lets a pipeline store/reuse the bitmap and apply it in
  non-join contexts.

Accuracy contracts are tested (tests/test_sketches.py): estimates within the
configured relative error of exact, and the merge identity
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


def bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Build a bloom-filter bitmap over ``key_col`` as a 1-row DataFrame.

    Distributed build: each key fans out to ``num_hashes`` bit positions
    (``xxhash64(key, seed) mod num_bits``), positions reduce to 64-bit words
    via ``groupBy(word_index).agg(bit_or)`` - a map-side-combined shuffle
    whose output is at most ``num_bits / 64`` rows regardless of corpus size -
    and the sparse words assemble into one dense ``array<long>`` row (column
    ``bloom``, ``num_bits / 8`` bytes; the default 1M bits = 128 KB,
    broadcastable anywhere). False-positive rate follows the standard ``(1 -
    e^{-kn/m})^k``; size ``num_bits`` ~10x the expected distinct-key count for
    <1% at the default ``num_hashes``.
    """
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // 64
    one = F.lit(1).cast("long")
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(s)), F.lit(num_bits))
                    for s in range(num_hashes)
                ]
            )
        ).alias("p")
    )
    words = pos.groupBy((F.col("p") / F.lit(64)).cast("int").alias("w")).agg(
        F.bit_or(
            F.call_function("shiftleft", one, F.pmod(F.col("p"), F.lit(64)).cast("int"))
        ).alias("bits")
    )
    # dense assembly: zero-fill missing words with a distributed left
    # join (not a per-index map lookup on one row, which is O(words x
    # entries) on a single task once the bitmap saturates), then sort
    # the <= n_words structs into position order on the final row
    idx = keys.sparkSession.range(n_words).select(F.col("id").cast("int").alias("w"))
    filled = idx.join(words, "w", "left").select(
        "w", F.coalesce("bits", F.lit(0).cast("long")).alias("bits")
    )
    return filled.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "bits"))),
            lambda x: x["bits"],
        ).alias("bloom")
    )


def bloom_contains(
    bitmap,
    key,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
):
    """Boolean Column: is ``key`` possibly in the bloom ``bitmap``?

    Pure codegen expression - ``num_hashes`` O(1) array index + bit test
    probes per row, no Python, no shuffle. ``num_bits`` / ``num_hashes`` MUST
    match the :func:`bloom_bitmap` build. No false negatives; false positives
    at the standard bloom rate, so callers needing exactness verify survivors
    with a real join (which then only sees the bloom-surviving sliver of the
    probe side).
    """
    one = F.lit(1).cast("long")
    cond = None
    for s in range(num_hashes):
        p = F.pmod(F.xxhash64(key, F.lit(s)), F.lit(num_bits))
        word = F.element_at(bitmap, (p / F.lit(64)).cast("int") + F.lit(1))
        mask = F.call_function("shiftleft", one, F.pmod(p, F.lit(64)).cast("int"))
        hit = word.bitwiseAND(mask) != F.lit(0).cast("long")
        cond = hit if cond is None else (cond & hit)
    return cond
