"""Binned interval (range) join: points matched into [start, end] windows.

Spark plans a plain inequality join (``p.ts BETWEEN i.start AND
i.end``) as BroadcastNestedLoopJoin - O(points x intervals) per key,
infeasible at 100 TB. The scalable form is the bin-bucketed rewrite
(the same idea behind Databricks' range-join optimization and
interval-tree joins in genomics engines):

    1. pick a bin width close to the typical interval length;
    2. each point maps to exactly ONE bin: ts div bin;
    3. each interval explodes to the bins it overlaps
       ((start div bin) .. (end div bin));
    4. equi-join on (key, bin) - a plain shuffled hash/sort-merge
       join Catalyst optimizes like any other - then re-check the
       exact BETWEEN predicate to discard same-bin near-misses.

A (point, interval) pair can only meet in the point's single bin, so
the rewrite produces no duplicate pairs and needs no distinct. Cost:
the interval side grows by ~(interval_len / bin + 1) rows - with bin
chosen at the median interval length that is a small constant - and
the join itself is an equi-join whose shuffle Catalyst can co-locate
with downstream aggregation on the same key. Skewed keys fall out of
the usual toolkit (AQE skew split; the bin id itself spreads hot keys
across partitions when included in the shuffle key).
"""

from __future__ import annotations

import numbers
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
    max_bins_per_interval: int = 4096,
) -> DataFrame:
    """Join points into intervals via the bin rewrite.

    ``how="inner"`` returns matched (interval x point) rows carrying
    all columns from both sides (callers should pre-alias clashes).
    ``how="left"`` keeps zero-match intervals with null point columns
    - note a multi-bin interval with no match yields one null row PER
    BIN, so left-mode callers must aggregate with null-skipping
    functions (count(point_col), sum) rather than count(*). That is
    still the right trade at scale: restoring zero-match intervals
    with a second join would re-scan the interval source (lineage
    duplication re-executes it), where the per-bin null rows cost
    O(bins(interval)) extra rows through one aggregate.

    ``bin_width`` is in the ts unit (typically ms). Malformed input
    raises instead of silently joining: ``start > end`` (sequence()
    would auto-negate the step into a DESCENDING bin list that
    matches nothing), and an interval wider than
    ``max_bins_per_interval`` bins (a [0, 2^63] sentinel row would
    otherwise explode the interval side - widen ``bin_width`` or
    raise the cap deliberately). Both checks ride the expression
    feeding ``explode``, so they are per-row codegen and Catalyst
    cannot prune them.
    """
    # integer `div`, never floor(x / w): the double quotient loses
    # integer precision past 2^53 (a ns clock is there in ~104 days).
    # `div` truncates toward zero - still monotone in ts, which is all
    # the rewrite needs: both sides share _bin, so ts in [start, end]
    # implies _bin(ts) in [_bin(start), _bin(end)]. A fractional width
    # would silently truncate (0.5 -> div 0 -> NULL bins -> empty join
    # in non-ANSI sessions): reject anything but a positive int.
    # Integral (not bare int): np.int64 from a pandas/COUNT result is a
    # valid width; bool is not (True renders as `div True` -> SQL error).
    if not isinstance(bin_width, numbers.Integral) or isinstance(bin_width, bool) or bin_width <= 0:
        raise ValueError(f"bin_width must be a positive int, got {bin_width!r}")
    bin_width = int(bin_width)

    def _bin(c: str):
        return F.expr(f"`{c}` div {bin_width}")

    binned_points = points.withColumn("_bin", _bin(point_ts))
    bin_lo = _bin(start_col)
    bin_hi = _bin(end_col)
    checked_hi = (
        F.when(
            F.col(start_col) > F.col(end_col),
            F.raise_error(
                F.format_string(
                    "interval_join_binned: malformed interval %s > %s "
                    f"({start_col} must be <= {end_col})",
                    F.col(start_col).cast("string"),
                    F.col(end_col).cast("string"),
                )
            ).cast("long"),
        )
        .when(
            bin_hi - bin_lo >= F.lit(int(max_bins_per_interval)),
            F.raise_error(
                F.format_string(
                    "interval_join_binned: interval [%s, %s] spans %s bins "
                    f"of width {bin_width}, over max_bins_per_interval="
                    f"{int(max_bins_per_interval)}; widen bin_width or raise "
                    "the cap",
                    F.col(start_col).cast("string"),
                    F.col(end_col).cast("string"),
                    (bin_hi - bin_lo + F.lit(1)).cast("string"),
                )
            ).cast("long"),
        )
        .otherwise(bin_hi)
    )
    binned_intervals = intervals.withColumn(
        "_bin", F.explode(F.sequence(bin_lo, checked_hi))
    )
    if how == "inner":
        return (
            binned_intervals.join(binned_points, [*keys, "_bin"])
            .where(F.col(point_ts).between(F.col(start_col), F.col(end_col)))
            .drop("_bin")
        )
    if how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    # left: keep the BETWEEN as part of the join condition (a WHERE
    # after a left join would drop the unmatched rows again)
    cond = F.lit(True)
    for k in keys:
        cond = cond & (binned_intervals[k] == binned_points[k])
    cond = (
        cond
        & (binned_intervals["_bin"] == binned_points["_bin"])
        & binned_points[point_ts].between(
            binned_intervals[start_col], binned_intervals[end_col]
        )
    )
    joined = binned_intervals.join(binned_points, cond, "left")
    # drop the point side's duplicated key/bin columns
    return joined.drop(binned_points["_bin"]).drop(binned_intervals["_bin"]).drop(
        *[binned_points[k] for k in keys]
    )
