"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship metrics-snapshot query (the
reference's CSV export composition A5+A6+A7, rolling.py:147-212) at
sf0.001; ``queries()`` exposes every implemented operator from SURVEY
section 2 (+2.7); ``oracle_sql()`` gives each one's DuckDB SQL.
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
# Round-6 allocation: (1) the 25 r3-evidence queries (oldest in the
# registry); (2) 25 of the 49 r4-evidence queries - the 8 that are
# bench-headline lines (incl. q_token_stats, the r5 watch item), the
# protocol F-family, a TPC-H spread; (3) beyond the prefix, the
# remaining 24 r4-evidence queries (these lead round 7), then the
# r5 cohort via the registry-order fallback. Registry 125 -> 122 by
# the three consolidations noted in plans/ext_queries.py + COVERAGE.md.
# (Past allocations are reconstructible from CORRECTNESS_r0N.json:
# each round's file lists exactly the prefix the driver checked.)
_PRIORITY = [
    # --- 1: r3-evidence cohort (25; oldest driver evidence, 2 rounds) ---
    "q_percentiles", "q_ann_ivf_kmeans", "q_chunk_documents",
    "q_rollup_merge", "q_tfidf", "q_grouped_stats",
    "q_stale_stats", "q_interval_count", "q_grouping_sets",
    "q_topk_per_group", "q_unpivot_percentiles", "q_supplier_region",
    "q_part_brand_stats", "q_first_last_value", "q_twap", "q_ohlc_bars",
    "q_merge_upsert", "q_profile_columns", "q_sketch_distinct",
    "q_fingerprint", "q_corpus_sample", "q_corpus_split",
    "q_scrub_text", "q_quality_score", "q_media_summary",
    # --- 2: r4-evidence cohort part A (25 of 49) ---
    # bench-headline lines first (q_token_stats is the r5 watch item):
    "q_token_stats", "q_dedup_exact", "q_dedup_near", "q_dedup_jaccard",
    "q_cosine_topk", "q_tpch_q1", "q_tpch_q5", "q_tpch_q9",
    # protocol F-family:
    "q_json_decode", "q_filter_isin", "q_channel_split", "q_element_at",
    "q_explode", "q_try_cast", "q_array_transform", "q_best_levels",
    "q_struct_project", "q_to_json",
    # TPC-H spread:
    "q_tpch_q2", "q_tpch_q3", "q_tpch_q4", "q_tpch_q6", "q_tpch_q7",
    "q_tpch_q8", "q_tpch_q10",
    # --- 3: beyond the 50-slot prefix: r4-evidence part B (24) ---
    # these are the registry's oldest evidence after round 6 closes,
    # so they lead the round-7 prefix.
    "q_above_customer_avg", "q_ann_ivf", "q_cosine_topk_arrow_highdim",
    "q_count_by_key", "q_cube", "q_format_string", "q_having_gate",
    "q_null_guard", "q_pivot", "q_rollup", "q_semi_anti", "q_set_ops",
    "q_spread", "q_window_variety", "q_zero_rate",
    "q_tpch_q11", "q_tpch_q12", "q_tpch_q14", "q_tpch_q15",
    "q_tpch_q17", "q_tpch_q18", "q_tpch_q19", "q_tpch_q20", "q_tpch_q22",
    # --- 4: the 48 r5-evidence queries follow in registry order via the
    #        fallback in queries(); they rotate back in rounds 7-8. ---
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
