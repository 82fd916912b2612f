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
# Round-9 allocation: (1) the 27 r6-evidence queries (oldest, age 2);
# (2) re-checks for CODE CHANGED in round 9: the quantile ring split +
# its oracle CTE (q_semdedup), similarity-module zero-norm guards (the
# q_ann*/q_cosine* family), the shared _COS oracle-string refactor
# (q_dedup_embed), bin_width widening (q_interval_join), dedup.py
# (q_dedup_clusters); (3) r7-evidence fill in registry order - the
# remaining 28 r7-evidence queries rotate into round 10's prefix.
_PRIORITY = [
    # --- 1: r6-evidence cohort (27; oldest driver evidence) ---
    "q_part_brand_stats", "q_percentiles", "q_profile_columns",
    "q_quality_score", "q_rollup_merge", "q_scrub_text",
    "q_sketch_distinct", "q_stale_stats", "q_struct_project",
    "q_supplier_region", "q_tfidf", "q_to_json", "q_token_stats",
    "q_topk_per_group", "q_tpch_q1", "q_tpch_q10", "q_tpch_q2",
    "q_tpch_q3", "q_tpch_q4", "q_tpch_q5", "q_tpch_q6", "q_tpch_q7",
    "q_tpch_q8", "q_tpch_q9", "q_try_cast", "q_twap",
    "q_unpivot_percentiles",
    # --- 2: code changed in round 9 (re-verify post-change) ---
    "q_semdedup", "q_ann_ivf", "q_ann_ivf_kmeans", "q_dedup_clusters",
    "q_interval_join", "q_cosine_topk",
    "q_dedup_embed", "q_cosine_topk_arrow_highdim", "q_ann_lsh_buckets",
    # --- 3: r7-evidence fill, registry order (14; rest lead round 10) ---
    "q_asof_join", "q_pivot", "q_rollup", "q_set_ops", "q_cube",
    "q_semi_anti", "q_above_customer_avg", "q_drawdown", "q_correlation",
    "q_null_guard", "q_spread", "q_date_partition", "q_format_string",
    "q_zero_rate",
    # --- 4: the remaining r7-evidence cohort follows in registry order
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
