"""As-of join: match each left row to the latest right row at-or-before it.

The canonical market-data operation (trade -> prevailing quote) that
Spark has no native operator for. Implemented with the union+window
trick, which is the scalable form:

    1. tag both sides and union them on (key, ts)
    2. one window pass per key ordered by (ts, side-tag):
       ``last_value(right_payload) IGNORE NULLS`` carries the most
       recent right row forward
    3. keep only left rows

Cost: ONE shuffle + sort on the key - identical to the sort-merge
join Spark would do anyway, with no range-condition explosion. The
alternative (inequality join + per-left-row max) plans as a
broadcast-nested-loop or cartesian range join: O(left x right) per
key. At 100 TB, union+window is the difference between feasible and
not. Right-side ties on (key, ts) resolve to the greatest tiebreak
(deterministic); a left row at the same ts as a right row sees that
right row (at-or-before semantics, matching DuckDB ASOF JOIN).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame, right: DataFrame, keys: Sequence[str], ts_col: str,
    right_cols: Sequence[str], tiebreak_col: str,
) -> DataFrame:
    """Left as-of join: all left columns + latest-at-or-before right_cols.

    ``tiebreak_col`` must exist on both sides and totally order rows
    within (key, ts); right rows sort before left rows at equal ts so
    a same-timestamp quote is visible to the trade.
    """
    lcols = left.columns
    tagged_left = left.select(
        *lcols, F.lit(1).alias("_side"), *[F.lit(None).alias(f"_r_{c}") for c in right_cols]
    )
    tagged_right = right.select(
        *[
            F.col(c) if c in (*keys, ts_col, tiebreak_col) else F.lit(None).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col), F.col("_side"), F.col(tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *lcols,
        F.col("_side"),
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return carried.where(F.col("_side") == 1).drop("_side")


def asof_join_same_source(
    events: DataFrame, keys: Sequence[str], ts_col: str,
    left_pred, right_pred, left_cols: Sequence[str],
    right_payload: Sequence[str], right_tiebreak: str,
) -> DataFrame:
    """As-of join where BOTH sides are disjoint predicates over ONE
    source - the common market-data case (trades and quotes arrive in
    the same event stream).

    Fuses :func:`asof_join`'s union into the scan (r20): one scan, one
    exchange, one sort, where the two-input form pays two scans plus a
    right-side pre-aggregation exchange when right ties need resolving.
    Tie resolution moves into the WINDOW ORDER: right rows at equal
    (keys, ts) sort by the NATIVE-typed ``right_tiebreak`` (r20 ADVICE:
    a double cast collides int64 tiebreaks above 2^53) and the carried
    ``last_value`` picks the greatest - deterministic iff each tied
    row's ``right_payload`` is a function of (keys, ts, right_tiebreak).
    Left rows take a null tiebreak: left-left order never affects the
    carry (their payload slots are null and ``last`` skips them).
    Predicates must be disjoint (left wins). Row-identical to the
    two-input form (test_metrics; A/B numbers: OPTIMIZATION_r20.md).
    """
    tb = F.when(right_pred, F.col(right_tiebreak))
    both = events.where(left_pred | right_pred).select(
        *keys, *left_cols, F.col(ts_col),
        left_pred.cast("int").alias("_side"), tb.alias("_tb"),
        *[F.when(right_pred, F.col(c)).alias(f"_r_{c}") for c in right_payload])
    w = (Window.partitionBy(*keys)
         .orderBy(F.col(ts_col), F.col("_side"), F.col("_tb"))
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = both.select(
        *keys, *left_cols, F.col(ts_col), F.col("_side"),
        *[F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
          for c in right_payload])
    return carried.where(F.col("_side") == 1).drop("_side")


def banded_interval_count(
    left: DataFrame, right: DataFrame, key_cols: list[str], left_ts: str,
    right_ts: str, range_ms: int, left_id: str, out_col: str = "n_in_range",
) -> DataFrame:
    """Count right-side rows within ``[left_ts - range_ms, left_ts)``
    per left row - an interval join banded for scale.

    The naive plan joins on the equi key with the time range as a
    residual, which degenerates when a key is hot (every left x right
    pair under that key is tested). Banding adds ``floor(ts/range_ms)``
    to the JOIN KEY: each left row probes exactly two bands (its own
    and the previous - together they cover the whole lookback range),
    so the per-key work drops from |L|x|R| to the rows in adjacent
    bands, and the shuffle partitions on (key, band) - hot keys spread
    across time. A right row falls in exactly one band, so no dedup is
    needed. The range predicate stays in the JOIN CONDITION so an
    all-out-of-range left row still survives the left join and counts
    zero. This is the standard time-bucketed interval-join
    decomposition (cf. Spark's stream-stream join state bucketing).
    """
    from pyspark.sql import functions as F

    # integer DIV: float division is only double-exact below 2^53, so
    # banding must never round-trip epoch ms through a double. (DIV
    # truncates toward zero, same as DuckDB's // - consistent on both
    # sides of the oracle.)
    band = lambda c: F.expr(f"`{c}` DIV {range_ms}")  # noqa: E731
    probes = left.withColumn(
        "_band", F.explode(F.array(band(left_ts) - 1, band(left_ts)))
    )
    r = right.select(
        *[F.col(k).alias(f"_r_{k}") for k in key_cols],
        band(right_ts).alias("_r_band"),
        F.col(right_ts).alias("_r_ts"),
    )
    cond = F.col("_band") == F.col("_r_band")
    for k in key_cols:
        cond = cond & (F.col(k) == F.col(f"_r_{k}"))
    cond = (
        cond
        & (F.col("_r_ts") >= F.col(left_ts) - range_ms)
        & (F.col("_r_ts") < F.col(left_ts))
    )
    return (
        probes.join(r, cond, "left")
        .groupBy(left_id)
        .agg(F.count("_r_ts").cast("long").alias(out_col))
    )
