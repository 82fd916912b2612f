"""Table loading for the driver's synthetic parquet testdata.

At 100 TB these reads become partitioned parquet scans on a cluster;
the load path keeps everything declarative so Catalyst applies column
pruning and predicate pushdown at the source (check with
``df.explain`` -> PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql paths)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


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

    This is the storage-level answer to the fact-fact shuffle: two
    tables bucketed into the same bucket count on their join keys
    sort-merge join with ZERO exchanges (asserted in
    test_scale_patterns.py), deleting the per-query shuffle the
    hint-free spine otherwise pays. At 100 TB you pay one bucketed
    write per table per layout and amortize it over every downstream
    join on that key - the same trade Hive/Iceberg bucketing and
    Delta's Z-order make. Returns {source_name: bucketed_table_name}.

    The in-memory catalog's DROP TABLE leaves managed files behind, so
    stale locations are cleared before each overwrite.
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
