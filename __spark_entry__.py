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
# Round-11 allocation: (1) the 25 r8-evidence queries (oldest, age 2);
# (2) re-checks for CODE CHANGED in round 11: the SQ8 codes-on-disk
# input mode on assign_cells/semantic_dedup + the _DERIVED_CELLS
# oracle clamp mirror (q_semdedup, q_ann_ivf*, q_quantize_int8);
# (3) r9-evidence fill in registry order to 50 - the remaining
# 26 r9-evidence queries rotate into round 12's prefix.
_PRIORITY = [
    # --- 1: r8-evidence cohort (25; oldest driver evidence) ---
    "q_chunk_documents", "q_corpus_sample", "q_corpus_split",
    "q_dedup_jaccard", "q_dedup_near", "q_fingerprint",
    "q_first_last_value", "q_interval_count", "q_lang_id",
    "q_media_features", "q_media_summary", "q_merge_upsert",
    "q_mix_temperature", "q_ohlc_bars", "q_ohlc_rollup",
    "q_pack_sequences", "q_pit_read", "q_quality_topp",
    "q_repetition_stats", "q_salted_stats", "q_scd2_history",
    "q_shuffle_shard", "q_token_count_bpe", "q_tpch_q13", "q_tpch_q16",
    # --- 2: code changed in round 11 (re-verify post-change) ---
    "q_semdedup", "q_ann_ivf", "q_ann_ivf_kmeans", "q_quantize_int8",
    # --- 3: r9-evidence fill, registry order (21; rest lead round 12) ---
    "q_asof_join", "q_pivot", "q_rollup", "q_set_ops", "q_cube",
    "q_semi_anti", "q_above_customer_avg", "q_twap", "q_rollup_merge",
    "q_drawdown", "q_interval_join", "q_correlation", "q_null_guard",
    "q_try_cast", "q_struct_project", "q_spread", "q_date_partition",
    "q_to_json", "q_format_string", "q_percentiles", "q_zero_rate",
    # --- 4: the remaining r9-evidence cohort follows in registry order
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
