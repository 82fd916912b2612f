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
# Round-19 allocation: (1) the 34 r16-evidence queries (oldest, age 2;
# tools/selfcheck.py --evidence-age pins the set); (2) round-19
# changed-code re-checks: both incremental probes (byte-budgeted
# compaction firing slice - _maybe_compact_kept gains
# max_bytes_per_firing, both probes thread compact_bytes_per_firing);
# (3) r17-evidence fill in registry order to 50 - the rest leads
# round 20.
_PRIORITY = [
    # --- 1: r16-evidence cohort (34; age-2 per the ledger, registry order) ---
    "q_element_at", "q_explode", "q_array_transform", "q_best_levels",
    "q_spread", "q_date_partition", "q_to_json", "q_format_string",
    "q_having_gate", "q_csv_snapshot", "q_dedup_exact", "q_dedup_near_pairs",
    "q_dedup_simhash_pairs", "q_corpus_prep", "q_decontaminate",
    "q_decontaminate_bloom", "q_dedup_lsh_jaccard", "q_dedup_retention",
    "q_boilerplate", "q_dedup_incremental", "q_filter_funnel",
    "q_join_enrich", "q_order_revenue_topk", "q_tpch_q12", "q_tpch_q14",
    "q_tpch_q15", "q_tpch_q17", "q_tpch_q18", "q_tpch_q19", "q_tpch_q22",
    "q_tpch_q11", "q_tpch_q20", "q_tpch_q21", "q_window_variety",
    # --- 2: code changed in round 19 (byte-budgeted compaction slice) ---
    "q_dedup_near_incremental", "q_semdedup_incremental",
    # --- 3: r17-evidence fill to 50, registry order ---
    "q_asof_join", "q_pivot", "q_rollup", "q_set_ops", "q_cube",
    "q_semi_anti", "q_above_customer_avg", "q_twap", "q_rollup_merge",
    "q_drawdown", "q_interval_join", "q_latency_cols", "q_percentiles",
    "q_zero_rate",
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
