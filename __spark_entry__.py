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
# Round-20 allocation: (1) the 28 r17-evidence queries (oldest, age 2;
# tools/selfcheck.py --evidence-age pins the set); (2) round-20
# changed-code re-checks - the single-job compaction rewrite (both
# incremental probes) plus the optimization round's plan rewrites
# (q_tpch_q21, q_asof_join, q_scrub_text, q_boilerplate; the also-
# changed q_fingerprint / q_quantize_int8 already sit in cohort 1);
# (3) r18-evidence fill to 50 (the four fill keys displaced by the
# re-checks stay at age 2, in-bound, and lead the r21 rotation).
_PRIORITY = [
    # --- 1: r17-evidence cohort (28; age-2 per the ledger, registry order) ---
    "q_count_by_key", "q_grouped_stats", "q_dedup_near",
    "q_token_count_bpe", "q_lang_id", "q_repetition_stats",
    "q_fingerprint", "q_media_summary", "q_media_features",
    "q_chunk_documents", "q_pack_sequences", "q_corpus_split",
    "q_corpus_sample", "q_ann_lsh_buckets", "q_mix_temperature",
    "q_shuffle_shard", "q_quality_topp", "q_quantize_int8",
    "q_tpch_q13", "q_tpch_q16", "q_first_last_value", "q_interval_count",
    "q_ohlc_bars", "q_ohlc_rollup", "q_salted_stats", "q_merge_upsert",
    "q_scd2_history", "q_pit_read",
    # --- 2: code changed in round 20 (compaction rewrite + optimization) ---
    "q_dedup_near_incremental", "q_semdedup_incremental",
    "q_tpch_q21", "q_asof_join", "q_scrub_text", "q_boilerplate",
    # --- 3: r18-evidence fill to 50, registry order ---
    "q_sessionize", "q_grouping_sets", "q_realized_vol", "q_zorder_key",
    "q_correlation", "q_funnel", "q_retention_cohort", "q_session_stats",
    "q_json_decode", "q_invariant_check", "q_filter_isin", "q_null_guard",
    "q_channel_split", "q_try_cast", "q_struct_project", "q_lag_diff",
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
