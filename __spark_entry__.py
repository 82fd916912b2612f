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
# Round-7 allocation: (1) the 24 r4-evidence queries (oldest, age 2);
# (2) 26 more slots: first the 4 queries whose OPERATOR CODE changed
# this round (two-level IVF/SemDeDup quantizer, range-join integer bin
# division, checkpoint-dir guard) so the driver re-verifies the
# changed code (q_ann_ivf_kmeans is age-0 but spends a slot for that),
# then the 8 r5-evidence bench-headline lines, then r5-evidence fill;
# (3) the 23 remaining r5-evidence queries lead round 8, the r6 cohort
# follows via the registry-order fallback. (Past allocations are
# reconstructible from CORRECTNESS_r0N.json prefixes.)
_PRIORITY = [
    # --- 1: r4-evidence cohort (24; oldest driver evidence, 2 rounds) ---
    "q_above_customer_avg", "q_ann_ivf", "q_cosine_topk_arrow_highdim",
    "q_count_by_key", "q_cube", "q_format_string", "q_having_gate",
    "q_null_guard", "q_pivot", "q_rollup", "q_semi_anti", "q_set_ops",
    "q_spread", "q_window_variety", "q_zero_rate",
    "q_tpch_q11", "q_tpch_q12", "q_tpch_q14", "q_tpch_q15",
    "q_tpch_q17", "q_tpch_q18", "q_tpch_q19", "q_tpch_q20", "q_tpch_q22",
    # --- 2a: code changed in round 7 (re-verify post-change) ---
    "q_semdedup", "q_ann_ivf_kmeans", "q_interval_join", "q_dedup_clusters",
    # --- 2b: r5-evidence bench-headline lines ---
    "q_asof_join", "q_lag_diff", "q_window_range", "q_csv_snapshot",
    "q_dedup_lsh_jaccard", "q_join_enrich", "q_order_revenue_topk",
    "q_tpch_q21",
    # --- 2c: r5-evidence fill, registry order (14) ---
    "q_ann_lsh_buckets", "q_boilerplate", "q_corpus_prep", "q_correlation",
    "q_date_partition", "q_decontaminate", "q_decontaminate_bloom",
    "q_dedup_embed", "q_dedup_incremental", "q_dedup_near_pairs",
    "q_dedup_retention", "q_dedup_simhash_pairs", "q_drawdown",
    "q_filter_funnel",
    # --- 3: beyond the 50-slot prefix: remaining r5-evidence (23) ---
    # these are the registry's oldest evidence after round 7 closes,
    # so they lead the round-8 prefix.
    "q_funnel", "q_invariant_check", "q_lang_id", "q_latency_cols",
    "q_media_features", "q_mix_temperature", "q_ohlc_rollup",
    "q_pack_sequences", "q_pit_read", "q_quality_topp", "q_quantize_int8",
    "q_realized_vol", "q_repetition_stats", "q_retention_cohort",
    "q_salted_stats", "q_scd2_history", "q_session_stats", "q_sessionize",
    "q_shuffle_shard", "q_token_count_bpe", "q_tpch_q13", "q_tpch_q16",
    "q_zorder_key",
    # --- 4: the r6-evidence cohort follows in registry order via the
    #        fallback in queries(); it rotates back in rounds 8-9. ---
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
