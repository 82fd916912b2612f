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
# Round-21 allocation: (1) the 31 r18-evidence queries (oldest, age 2;
# tools/selfcheck.py --evidence-age pins the set - the four fill keys
# displaced in r20 lead, per that round's plan); (2) round-21
# changed-code re-checks - the shared-shingle-set lsh rewrite
# (q_dedup_lsh_jaccard; q_dedup_near and both incremental probes
# touch the refactored minhash/index-build path), the native-typed
# as-of tiebreak (q_asof_join); the driver-side k-means trainer's
# q_ann_ivf_kmeans already sits in cohort 1; (3) r19-evidence fill to
# 50, registry order.
_PRIORITY = [
    # --- 1: r18-evidence cohort (31; age-2 per the ledger, registry order) ---
    "q_stale_stats", "q_window_range", "q_unpivot_percentiles",
    "q_dedup_jaccard", "q_dedup_jaccard_pruned", "q_dedup_embed",
    "q_cosine_topk", "q_cosine_topk_arrow_highdim", "q_ann_ivf",
    "q_ann_ivf_kmeans", "q_ann_recall", "q_token_stats",
    "q_quality_score", "q_tfidf", "q_dedup_clusters", "q_sketch_distinct",
    "q_semdedup", "q_tpch_q1", "q_topk_per_group", "q_tpch_q6",
    "q_supplier_region", "q_part_brand_stats", "q_tpch_q5", "q_tpch_q7",
    "q_tpch_q8", "q_tpch_q10", "q_tpch_q2", "q_tpch_q3", "q_tpch_q4",
    "q_tpch_q9", "q_profile_columns",
    # --- 2: code changed in round 21 (lsh shared sets, asof tiebreak) ---
    "q_dedup_lsh_jaccard", "q_asof_join", "q_dedup_near",
    "q_dedup_near_incremental", "q_semdedup_incremental",
    # --- 3: r19-evidence fill to 50, registry order ---
    "q_pivot", "q_rollup", "q_set_ops", "q_cube", "q_semi_anti",
    "q_above_customer_avg", "q_twap", "q_rollup_merge", "q_drawdown",
    "q_interval_join", "q_element_at", "q_explode", "q_array_transform",
    "q_best_levels",
]

# A typo here would silently shift the driver-verified prefix (the
# 'if k in QUERIES' guard below would drop it) — fail loud instead.
_UNKNOWN = set(_PRIORITY) - set(QUERIES)
if _UNKNOWN:
    raise AssertionError(f"_PRIORITY names not in QUERIES: {sorted(_UNKNOWN)}")
if len(_PRIORITY) != len(set(_PRIORITY)):
    raise AssertionError("_PRIORITY contains duplicates")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    ordered = {k: QUERIES[k] for k in _PRIORITY if k in QUERIES}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-checkable query."""
    qs = queries()
    return {k: ORACLES[k] for k in qs if k in ORACLES}
