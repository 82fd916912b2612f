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
# Round-12 allocation: (1) the 26 r9-evidence queries (oldest, age 2);
# (2) re-checks for CODE CHANGED in round 12: the kept-direct SemDeDup
# tail + incremental semantic dedup (q_semdedup, q_semdedup_incremental)
# and the assign_cells/ivf_topk codes-path touches (q_ann_ivf,
# q_ann_ivf_kmeans); (3) r10-evidence fill in registry order to 50 -
# the remaining 26 r10-evidence queries rotate into round 13's prefix.
_PRIORITY = [
    # --- 1: r9-evidence cohort (26; oldest driver evidence) ---
    "q_ann_lsh_buckets", "q_cosine_topk", "q_cosine_topk_arrow_highdim",
    "q_dedup_clusters", "q_dedup_embed", "q_part_brand_stats",
    "q_profile_columns", "q_quality_score", "q_scrub_text",
    "q_sketch_distinct", "q_stale_stats", "q_supplier_region",
    "q_tfidf", "q_token_stats", "q_topk_per_group",
    "q_tpch_q1", "q_tpch_q2", "q_tpch_q3", "q_tpch_q4", "q_tpch_q5",
    "q_tpch_q6", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q10",
    "q_unpivot_percentiles",
    # --- 2: code changed in round 12 (re-verify post-change) ---
    "q_semdedup", "q_semdedup_incremental", "q_ann_ivf", "q_ann_ivf_kmeans",
    # --- 3: r10-evidence fill, registry order (20; rest lead round 13) ---
    "q_sessionize", "q_grouping_sets", "q_realized_vol", "q_zorder_key",
    "q_funnel", "q_retention_cohort", "q_session_stats", "q_json_decode",
    "q_invariant_check", "q_filter_isin", "q_channel_split",
    "q_element_at", "q_explode", "q_array_transform", "q_best_levels",
    "q_latency_cols", "q_count_by_key", "q_grouped_stats", "q_lag_diff",
    "q_window_range",
    # --- 4: the remaining r10-evidence cohort follows in registry order
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
