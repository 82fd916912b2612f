"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship metrics-snapshot query (the
reference's CSV export composition A5+A6+A7, rolling.py:147-212) at
sf0.001. ``queries()`` exposes every implemented operator from
SURVEY.md section 2 (plus the section-2.7 extension operators);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_crypto_market_data_pipeline_spark.plans import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_csv_snapshot"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-checkable query."""
    return dict(ORACLES)
