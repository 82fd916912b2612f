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


# The driver verifies a prefix of this dict (50 queries per round),
# so ordering is evidence allocation: the prefix is always the 50
# queries whose driver evidence is OLDEST ("oldest-first" rotation).
# With 122 registered queries and 50 slots per round, oldest-first
# keeps every query's evidence at most 2 rounds old in steady state
# (tools/selfcheck.py --evidence-age mechanizes the check).
#
# Round-8 allocation: (1) the 23 r5-evidence queries (oldest, age 2);
# (2) 5 slots for queries whose OPERATOR CODE changed this round (the
# three-level IVF/SemDeDup quantizer + its oracle CTE rewrite, the
# range-join bin_width validation, the checkpoint-dir warn guard) -
# age-0, but the driver re-verifies the changed code; (3) the 22
# alphabetically-first r6-evidence queries as fill; the 27 remaining
# r6-evidence queries lead the round-9 prefix via section 4. (Past
# allocations are reconstructible from CORRECTNESS_r0N.json prefixes.)
_PRIORITY = [
    # --- 1: r5-evidence cohort (23; oldest driver evidence, 2 rounds) ---
    "q_funnel", "q_invariant_check", "q_lang_id", "q_latency_cols",
    "q_media_features", "q_mix_temperature", "q_ohlc_rollup",
    "q_pack_sequences", "q_pit_read", "q_quality_topp", "q_quantize_int8",
    "q_realized_vol", "q_repetition_stats", "q_retention_cohort",
    "q_salted_stats", "q_scd2_history", "q_session_stats", "q_sessionize",
    "q_shuffle_shard", "q_token_count_bpe", "q_tpch_q13", "q_tpch_q16",
    "q_zorder_key",
    # --- 2: code changed in round 8 (re-verify post-change) ---
    "q_semdedup", "q_ann_ivf", "q_ann_ivf_kmeans", "q_interval_join",
    "q_dedup_clusters",
    # --- 3: r6-evidence fill, registry order (22) ---
    "q_array_transform", "q_best_levels", "q_channel_split",
    "q_chunk_documents", "q_corpus_sample", "q_corpus_split",
    "q_cosine_topk", "q_dedup_exact", "q_dedup_jaccard", "q_dedup_near",
    "q_element_at", "q_explode", "q_filter_isin", "q_fingerprint",
    "q_first_last_value", "q_grouped_stats", "q_grouping_sets",
    "q_interval_count", "q_json_decode", "q_media_summary",
    "q_merge_upsert", "q_ohlc_bars",
    # --- 4: beyond the 50-slot prefix: remaining r6-evidence (27) ---
    # these are the registry's oldest evidence after round 8 closes,
    # so they lead the round-9 prefix.
    "q_part_brand_stats", "q_percentiles", "q_profile_columns",
    "q_quality_score", "q_rollup_merge", "q_scrub_text",
    "q_sketch_distinct", "q_stale_stats", "q_struct_project",
    "q_supplier_region", "q_tfidf", "q_to_json", "q_token_stats",
    "q_topk_per_group", "q_tpch_q1", "q_tpch_q10", "q_tpch_q2",
    "q_tpch_q3", "q_tpch_q4", "q_tpch_q5", "q_tpch_q6", "q_tpch_q7",
    "q_tpch_q8", "q_tpch_q9", "q_try_cast", "q_twap",
    "q_unpivot_percentiles",
    # --- 5: the r7-evidence cohort follows in registry order via the
    #        fallback in queries(); it rotates back in rounds 9-10. ---
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
