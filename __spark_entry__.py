"""Driver contract: ``entry(spark)`` runs the flagship metrics-snapshot
query (the reference's CSV export composition A5+A6+A7,
rolling.py:147-212) at sf0.001; ``queries()`` exposes every SURVEY
section 2 (+2.7) operator; ``oracle_sql()`` gives each one's DuckDB SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_crypto_market_data_pipeline_spark.plans import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_csv_snapshot"](spark, "/root/testdata/sf0.001")


# The driver verifies a prefix of this dict (50 queries per round), so
# ordering is evidence allocation: oldest driver evidence first, which
# keeps every query's evidence at most 2 rounds old in steady state
# (tools/selfcheck.py --evidence-age mechanizes the check; past
# allocations are reconstructible from CORRECTNESS_r0N.json prefixes).
#
# Round-17 allocation: (1) the 30 r14-evidence queries (oldest, age 2;
# tools/selfcheck.py --evidence-age pins the set); (2) round-17
# changed-code re-checks: both jaccard forms (working eager
# release_shingles), both incremental probes (shared-pass member
# attrs), q_semdedup + the ANN trio (assign_cells routing_sizes
# validation), q_ann_lsh_buckets (VALUES-relation oracle); (3)
# r15-evidence fill in registry order to 50 - the rest leads round 18.
_PRIORITY = [
    # --- 1: r14-evidence cohort (30; age-2 per the ledger, registry order) ---
    "q_latency_cols", "q_percentiles", "q_zero_rate", "q_count_by_key",
    "q_grouped_stats", "q_dedup_near", "q_token_count_bpe", "q_lang_id",
    "q_repetition_stats", "q_fingerprint", "q_media_summary",
    "q_media_features", "q_chunk_documents", "q_pack_sequences",
    "q_corpus_split", "q_corpus_sample", "q_mix_temperature",
    "q_shuffle_shard", "q_quality_topp", "q_quantize_int8", "q_tpch_q13",
    "q_tpch_q16", "q_first_last_value", "q_interval_count", "q_ohlc_bars",
    "q_ohlc_rollup", "q_salted_stats", "q_merge_upsert", "q_scd2_history",
    "q_pit_read",
    # --- 2: code changed in round 17 (release handle, member sharing,
    #        routing_sizes validation, oracle rewrite) ---
    "q_dedup_jaccard", "q_dedup_jaccard_pruned", "q_dedup_near_incremental",
    "q_semdedup_incremental", "q_semdedup", "q_ann_lsh_buckets", "q_ann_ivf",
    "q_ann_ivf_kmeans", "q_ann_recall",
    # --- 3: r15-evidence fill to 50, registry order ---
    "q_asof_join", "q_pivot", "q_rollup", "q_set_ops", "q_cube",
    "q_semi_anti", "q_above_customer_avg", "q_twap", "q_rollup_merge",
    "q_drawdown", "q_interval_join",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    ordered = {k: QUERIES[k] for k in _PRIORITY if k in QUERIES}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-checkable query."""
    qs = queries()
    return {k: ORACLES[k] for k in qs if k in ORACLES}
