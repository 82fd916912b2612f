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
# Round-10 allocation: (1) the 28 r7-evidence queries (oldest, age 2);
# (2) re-checks for CODE CHANGED in round 10: the int8-wire SemDeDup
# transport + dequantized oracle CTEs (q_semdedup), the sq8_wire reuse
# (q_quantize_int8), the assign_cells broadcast crossover + _route
# restructure + ivf_assign clamp + split_hot_cells checkpoint_dir
# (q_ann_ivf*); (3) r8-evidence fill in registry order - the remaining
# 26 r8-evidence queries rotate into round 11's prefix.
_PRIORITY = [
    # --- 1: r7-evidence cohort (28; oldest driver evidence) ---
    "q_boilerplate", "q_corpus_prep", "q_count_by_key", "q_csv_snapshot",
    "q_decontaminate", "q_decontaminate_bloom", "q_dedup_incremental",
    "q_dedup_lsh_jaccard", "q_dedup_near_pairs", "q_dedup_retention",
    "q_dedup_simhash_pairs", "q_filter_funnel", "q_having_gate",
    "q_join_enrich", "q_lag_diff", "q_order_revenue_topk", "q_tpch_q11",
    "q_tpch_q12", "q_tpch_q14", "q_tpch_q15", "q_tpch_q17", "q_tpch_q18",
    "q_tpch_q19", "q_tpch_q20", "q_tpch_q21", "q_tpch_q22",
    "q_window_range", "q_window_variety",
    # --- 2: code changed in round 10 (re-verify post-change) ---
    "q_semdedup", "q_ann_ivf", "q_ann_ivf_kmeans", "q_quantize_int8",
    # --- 3: r8-evidence fill, registry order (18; rest lead round 11) ---
    "q_sessionize", "q_grouping_sets", "q_realized_vol", "q_zorder_key",
    "q_funnel", "q_retention_cohort", "q_session_stats", "q_json_decode",
    "q_invariant_check", "q_filter_isin", "q_channel_split",
    "q_element_at", "q_explode", "q_array_transform", "q_best_levels",
    "q_latency_cols", "q_grouped_stats", "q_dedup_exact",
    # --- 4: the remaining r8-evidence cohort follows in registry order
    #        via the fallback in queries(). ---
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
