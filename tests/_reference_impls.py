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


def fold_assign_cells(
    embeddings: DataFrame,
    cents: DataFrame,
    num_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The r7/r8 expression-fold three-level quantizer, kept as the
    oracle-shaped reference: sequential-fold dots (bit-exact vs
    DuckDB's list_sum) over a ONE-broadcast-row index. Production
    `similarity.assign_cells` computes the identical routing with BLAS
    matmuls per Arrow batch (~50x faster per dot, SCALING.md); the
    equality test in test_similarity.py pins that both paths place
    every vector in the same cell."""
    from real_time_crypto_market_data_pipeline_spark.operators.similarity import (
        _cbrt_ceil,
        dot,
        l2_norm,
    )

    def nearest(cells, v, vnorm):
        scored = F.transform(
            cells,
            lambda e: F.struct(
                (dot(v, e["cvec"]) / (vnorm * e["cnorm"])).alias("s"),
                e["cell_id"].alias("c"),
            ),
        )
        return F.aggregate(
            scored,
            F.struct(F.lit(float("-inf")).alias("s"), F.lit(-1).cast("long").alias("c")),
            lambda acc, e: F.when(e["s"] > acc["s"], e).otherwise(acc),
        )["c"]

    g1 = _cbrt_ceil(num_cells)
    sizes = sorted({g1, min(num_cells, g1 * g1), num_cells})
    cents = cents.withColumn("cnorm", l2_norm(F.col("cvec")))
    ent = F.struct("cell_id", "cvec", "cnorm")

    def route(v, vn, depth):
        cur = nearest(F.col("_m0"), v, vn)
        for j in range(1, depth):
            cur = nearest(F.element_at(F.col(f"_m{j}"), cur), v, vn)
        return cur

    idx = (
        cents.where(F.col("cell_id") < sizes[0])
        .groupBy()
        .agg(F.sort_array(F.collect_list(ent)).alias("_m0"))
    )
    for i, size in enumerate(sizes[1:], start=1):
        mapped = (
            cents.where(F.col("cell_id") < size)
            .crossJoin(F.broadcast(idx))
            .select(ent.alias("_e"), route(F.col("cvec"), F.col("cnorm"), i).alias("_p"))
            .groupBy("_p")
            .agg(F.sort_array(F.collect_list("_e")).alias("_k"))
            .groupBy()
            .agg(F.map_from_entries(F.collect_list(F.struct("_p", "_k"))).alias(f"_m{i}"))
        )
        idx = idx.crossJoin(mapped)
    return (
        embeddings.withColumn("_vn", l2_norm(F.col(vec_col)))
        .crossJoin(F.broadcast(idx))
        .withColumn("_cell", route(F.col(vec_col), F.col("_vn"), len(sizes)))
        .select(F.col(id_col), F.col("_cell").cast("int").alias("cell_id"))
    )
