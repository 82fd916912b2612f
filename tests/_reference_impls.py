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
