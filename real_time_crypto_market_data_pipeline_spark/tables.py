"""Table loading for the driver's synthetic parquet testdata.

At 100 TB these reads become partitioned parquet scans on a cluster;
the load path keeps everything declarative so Catalyst applies column
pruning and predicate pushdown at the source (check with
``df.explain`` -> PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_ms_col(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-ms expression for ``events.ts``, adaptive to the storage type.

    The driver's testdata has shipped ``ts`` both as LONG nanoseconds
    and as parquet ``timestamp[us]`` (Spark: TIMESTAMP_NTZ) across
    rounds; every time-derived query funnels through this one helper.
    Both branches use integer arithmetic only - ns values (~1.7e18)
    exceed double's 2^53 exact range:

    - LONG ns  -> ``ts DIV 1000000`` (integer floor-div)
    - timestamp/timestamp_ntz -> ``unix_millis(cast(ts as timestamp_ltz))``
      (JVM integer micros//1000; NTZ->LTZ is instant-preserving under the
      pinned UTC session timezone)

    Matches DuckDB ``epoch_ms(ts)`` truncation exactly in both cases.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype is None:
        raise KeyError(f"column {col!r} not in {df.columns}")
    if dtype == "bigint":
        return F.expr(f"{col} DIV 1000000")
    if dtype.startswith("timestamp"):
        return F.unix_millis(F.col(col).cast("timestamp_ltz"))
    raise TypeError(
        f"events.{col} has unsupported type {dtype!r}; expected LONG "
        "nanoseconds or a timestamp type (testdata schema drift - see "
        "tools/selfcheck.py --schema)"
    )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` with the canonical integer ``ms`` epoch-millis column."""
    df = load(spark, sf_dir, "events")
    return df.withColumn("ms", events_ms_col(df))


# The join key each fact table gets bucketed on: the spine key of the
# TPC-H-shape fact-fact joins (lineitem-orders on orderkey, orders/
# customer on custkey). Dims stay unbucketed - they broadcast.
BUCKET_KEYS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "customer": "c_custkey",
}


def bucketize(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = ("lineitem", "orders"),
    buckets: int = 32,
    suffix: str = "_bucketed",
) -> dict[str, str]:
    """Write fact tables bucketed + sorted on their spine join key.

    This is the storage-level answer to the fact-fact shuffle: two tables
    bucketed into the same bucket count on their join keys sort-merge join
    with ZERO exchanges (asserted in test_scale_patterns.py), deleting the
    per-query shuffle the hint-free spine otherwise pays. At 100 TB you pay
    one bucketed write per table per layout and amortize it over every
    downstream join on that key - the same trade Hive/Iceberg bucketing and
    Delta's Z-order make. Returns {source_name: bucketed_table_name}.

    The in-memory catalog's DROP TABLE leaves managed files behind, so stale
    locations are cleared before each overwrite.
    """
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    out: dict[str, str] = {}
    for name in names:
        key = BUCKET_KEYS[name]
        table = f"{name}{suffix}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
        (
            load(spark, sf_dir, name)
            .write.bucketBy(buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(table)
        )
        out[name] = table
    return out
