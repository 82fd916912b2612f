"""Query registry: every SURVEY.md section-2 operator as a named query.

Each entry pairs a PySpark builder ``(spark, sf_dir) -> DataFrame`` with the
ANSI-SQL oracle string DuckDB runs on the same parquet tables. The driver
compares row-count + schema + order-insensitive value-hash, so:

- every computed column is aliased identically on both sides;
- orderings always carry a total tiebreak;
- hashing uses md5 (engine-portable), never engine-private hashes;
- percentiles use the reference's exact nearest-rank-lower rule on both sides
  (no interpolation -> no float drift).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
BENCH_KEYS: list[str] = []
# Measured and reported, but outside the headline total: the headline
# set is pinned to the round-1 baseline so totals stay comparable
# (one sanctioned swap, r15: the benched Jaccard is the df-capped
# q_dedup_jaccard_pruned, replacing the r14 perf-weak unpruned form);
# synthetic-input studies (1024-dim crossover twins) land here.
BENCH_EXTRA_KEYS: list[str] = []


def prepare(spark: SparkSession) -> SparkSession:
    """Pin runtime confs that correctness depends on.

    - ``nanosAsLong``: if the driver's ``events.ts`` ships as parquet
      TIMESTAMP(NANOS) (as it did in rounds 1-2), Spark 4 refuses it by
      default; reading it as a raw LONG of nanoseconds matches the engine's
      clock-domain contract (integer ns stays integer - reference
      ``time_helpers.py:12-23``). Current testdata is ``timestamp[us]`` where
      this conf is a no-op; either storage works because all ms derivation
      goes through the type-adaptive ``tables.events_ms_col``.
    - UTC session timezone: DuckDB treats naive timestamps as UTC; all
      date/hour rendering (and the NTZ->LTZ instant mapping in
      ``events_ms_col``) must agree.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf removed in a future Spark: only needed for ns parquet
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def query(
    name: str, oracle: str | None = None, bench: bool | str = False
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            prepare(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = f"q_{name}" if not name.startswith("q_") else name
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        if bench == "extra":
            BENCH_EXTRA_KEYS.append(name)
        elif bench:
            BENCH_KEYS.append(name)
        return wrapped

    return deco
