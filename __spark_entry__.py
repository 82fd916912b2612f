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
# Round-18 allocation: (1) the 31 r15-evidence queries (oldest, age 2;
# tools/selfcheck.py --evidence-age pins the set); (2) round-18
# changed-code re-checks: both jaccard forms (release handle now
# targets the checkpointed base frame, not the max_df Join rebinding),
# both incremental probes (bounded per-bucket compaction firing;
# amax_col parity through member + sink), q_semdedup + the ANN trio
# (assign_cells routing_sizes now admits numpy integers); (3)
# r16-evidence fill in registry order to 50 - the rest leads round 19.
_PRIORITY = [
    # --- 1: r15-evidence cohort (31; age-2 per the ledger, registry order) ---
    "q_correlation", "q_null_guard", "q_try_cast", "q_struct_project",
    "q_lag_diff", "q_stale_stats", "q_window_range", "q_unpivot_percentiles",
    "q_dedup_embed", "q_cosine_topk", "q_cosine_topk_arrow_highdim",
    "q_token_stats", "q_quality_score", "q_tfidf", "q_scrub_text",
    "q_dedup_clusters", "q_sketch_distinct", "q_tpch_q1", "q_topk_per_group",
    "q_tpch_q6", "q_supplier_region", "q_part_brand_stats", "q_tpch_q5",
    "q_tpch_q7", "q_tpch_q8", "q_tpch_q10", "q_tpch_q2", "q_tpch_q3",
    "q_tpch_q4", "q_tpch_q9", "q_profile_columns",
    # --- 2: code changed in round 18 (df-capped release handle, bounded
    #        compactor, amax_col threading, numpy routing_sizes) ---
    "q_dedup_jaccard", "q_dedup_jaccard_pruned", "q_dedup_near_incremental",
    "q_semdedup_incremental", "q_semdedup", "q_ann_ivf", "q_ann_ivf_kmeans",
    "q_ann_recall",
    # --- 3: r16-evidence fill to 50, registry order ---
    "q_sessionize", "q_grouping_sets", "q_realized_vol", "q_zorder_key",
    "q_funnel", "q_retention_cohort", "q_session_stats", "q_json_decode",
    "q_invariant_check", "q_filter_isin", "q_channel_split",
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
