"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship metrics-snapshot query (the
reference's CSV export composition A5+A6+A7, rolling.py:147-212) at
sf0.001. ``queries()`` exposes every implemented operator from
SURVEY.md section 2 (plus the section-2.7 extension operators);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_crypto_market_data_pipeline_spark.plans import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_csv_snapshot"](spark, "/root/testdata/sf0.001")


# The driver verifies a prefix of this dict (50 queries per round),
# so ordering is evidence allocation. Round-4 allocation: the 57
# queries whose last driver pass predates the round-2 timestamp[us]
# storage change (all r3-checked queries are green on record in
# CORRECTNESS_r03.json and are rotated out), ordered by exposure:
#   1. events-table queries - the ts fix touched their input storage,
#      so they carry the real (if small) regression risk;
#   2. the full TPC-H spine q1-q22 + relational extras (pivot/cube/
#      set-ops/...) - driver-green only pre-ts-fix;
#   3. the two high-dim cosine twins, which gained real DuckDB
#      oracles this round (previously rows-only) - first value check;
#   4. highest-coverage documents-table dedup/ANN/text queries.
# The 9 remaining documents-table variants (q_dedup_near_pairs,
# q_dedup_simhash[_pairs], q_dedup_jaccard_pruned, q_corpus_prep,
# q_decontaminate, q_dedup_embed, q_token_count_bpe, q_lang_id) share
# their code paths with included base queries, never touch the events
# table, and are re-verified by the local full-oracle pytest sweep;
# they rotate into round 5.
_PRIORITY = [
    # --- 1: events-table queries last checked pre-ts-fix ---
    "q_json_decode", "q_filter_isin", "q_null_guard",
    "q_channel_split", "q_element_at", "q_explode", "q_try_cast",
    "q_array_transform", "q_best_levels", "q_struct_project",
    "q_spread", "q_to_json", "q_format_string", "q_zero_rate",
    "q_count_by_key", "q_having_gate", "q_window_variety",
    # --- 2: TPC-H spine + relational extras ---
    "q_tpch_q1", "q_tpch_q2", "q_tpch_q3", "q_tpch_q4", "q_tpch_q5",
    "q_tpch_q6", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q10",
    "q_tpch_q11", "q_tpch_q12", "q_tpch_q14", "q_tpch_q15",
    "q_tpch_q17", "q_tpch_q18", "q_tpch_q19", "q_tpch_q20",
    "q_tpch_q22",
    "q_pivot", "q_rollup", "q_cube", "q_set_ops", "q_semi_anti",
    "q_above_customer_avg",
    # --- 3: newly-oracled high-dim twins (first value check) ---
    "q_cosine_topk_arrow_highdim", "q_cosine_topk_fold_highdim",
    # --- 4: documents-table family coverage ---
    "q_dedup_exact", "q_dedup_near", "q_dedup_jaccard",
    "q_cosine_topk", "q_ann_ivf", "q_token_stats",
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
