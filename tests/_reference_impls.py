"""Textbook long-form MinHash/LSH implementations, kept as test oracles.

Moved out of the package in round 6: production code exposes only the
fused wide forms (`dedup.minhash_wide` / `dedup.lsh_bucket_table`, one
partial-aggregated shuffle), while these classic signature-matrix
shapes survive here so the equivalence tests keep comparing the fused
plans against the (doc_id, seed, sig) -> banded composition the LSH
literature describes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_crypto_market_data_pipeline_spark.operators.dedup import (
    DEFAULT_BAND_ROWS,
    DEFAULT_NUM_HASHES,
    minhash_wide,
)


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, seed, sig) signature-matrix rows: unpivot of the wide form."""
    wide = minhash_wide(docs, text_col, num_hashes, shingle_n)
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("seed"), F.col(f"sig{j}").alias("sig")
            )
            for j in range(num_hashes)
        ]
    )
    return wide.select("doc_id", F.explode(pairs).alias("_s")).select(
        "doc_id", F.col("_s.seed").alias("seed"), F.col("_s.sig").alias("sig")
    )


def lsh_buckets(
    signatures: DataFrame, band_rows: int = DEFAULT_BAND_ROWS
) -> DataFrame:
    """Band the signature matrix: bucket = md5(band || sigs in seed order)."""
    banded = signatures.withColumn("band", (F.col("seed") / band_rows).cast("int"))
    return (
        banded.groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("seed"), F.col("sig")))
                    ),
                    lambda s: s["sig"],
                ),
            ).alias("band_sig")
        )
        .select(
            "doc_id",
            "band",
            F.md5(
                F.concat(F.col("band").cast("string"), F.lit("|"), F.col("band_sig"))
            ).alias("bucket"),
        )
    )


def plain_grouped_stats(
    df: DataFrame, keys, value_col: str, prefix: str = ""
) -> DataFrame:
    """A5/A7 textbook float form (count/mean/stddev_samp/min/max with
    0.0 fallbacks, reference rolling.py:180-196). Moved out of the
    package in round 7: plans use only `metrics.grouped_stats_exact`
    (exact integer partials - merge-order deterministic); this plain
    double-path twin survives here as the semantic reference the
    exact and salted variants are compared against."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(v).cast("long").alias(f"{prefix}count"),
        F.coalesce(F.avg(v), F.lit(0.0)).alias(f"{prefix}mean"),
        F.coalesce(F.stddev_samp(v), F.lit(0.0)).alias(f"{prefix}std"),
        F.coalesce(F.min(v).cast("double"), F.lit(0.0)).alias(f"{prefix}min"),
        F.coalesce(F.max(v).cast("double"), F.lit(0.0)).alias(f"{prefix}max"),
    )
