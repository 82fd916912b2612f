"""Physical-plan audits: the scale discipline, asserted.

Correct results are necessary; at 100 TB the plan shape decides
whether the query finishes. These tests pin the properties that
matter: filter/column pushdown to the parquet scan, broadcast joins
for dims, TakeOrdered instead of global sorts, WindowGroupLimit for
window top-k, and map-side partial aggregation before every exchange.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest

from real_time_crypto_market_data_pipeline_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@contextmanager
def no_auto_broadcast(spark):
    """Emulate 100 TB join planning: nothing is auto-broadcastable.

    With both the static and the AQE broadcast thresholds at -1, the
    ONLY joins that can build a BroadcastExchange are the explicitly
    hinted ones - so `count("BroadcastHashJoin")` under this context
    equals the number of *forced* broadcasts, exactly the quantity
    that must never include a fact-scale input.
    """
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    saved = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q1_filter_and_columns_pushed(spark):
    plan = physical(QUERIES["q_tpch_q1"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the 4 unused lineitem columns never leave the scan
    read_schema = plan.split("ReadSchema:")[-1]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    # map-side partial aggregation before the exchange
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("Exchange")  # partial below exchange


def test_join_enrich_only_nation_forced_broadcast(spark):
    # at 100 TB only the bounded dim (nation) may be a FORCED
    # broadcast; orders-customer must fall back to a shuffled join
    # when nothing is auto-broadcastable (no OOM-by-hint)
    with no_auto_broadcast(spark):
        plan = physical(QUERIES["q_join_enrich"](spark, SF))
        assert plan.count("BroadcastHashJoin") == 1  # nation only
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # fact scan reads only the join key + measure
    plan = physical(QUERIES["q_join_enrich"](spark, SF))
    orders_scan = [seg for seg in plan.split("FileScan") if "orders.parquet" in seg][0]
    assert "o_orderdate" not in orders_scan.split("ReadSchema:")[-1]


def test_cosine_topk_no_global_sort(spark):
    plan = physical(QUERIES["q_cosine_topk"](spark, SF))
    assert "TakeOrderedAndProject(limit=10" in plan
    assert "BroadcastNestedLoopJoin" in plan
    # the corpus side must not shuffle
    assert "Exchange hashpartitioning" not in plan


def test_window_topk_uses_group_limit(spark):
    plan = physical(QUERIES["q_topk_per_group"](spark, SF))
    # Spark's rank-limit pushdown: per-partition top-k before the shuffle
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan


def test_isin_filter_pushed_to_scan(spark):
    plan = physical(QUERIES["q_filter_isin"](spark, SF))
    assert "PushedFilters: [Not(In(event_type" in plan
    assert "WholeStageCodegen" in plan or "*(1)" in plan


def test_grouped_stats_partial_agg(spark):
    plan = physical(QUERIES["q_grouped_stats"](spark, SF))
    assert "partial_" in plan
    assert plan.count("Exchange hashpartitioning") == 1  # exactly one shuffle


def test_exact_dedup_single_shuffle(spark):
    plan = physical(QUERIES["q_dedup_exact"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_min" in plan or "partial_count" in plan


def test_media_summary_prunes_binary_payload(spark, tmp_path_factory):
    plan = physical(QUERIES["q_media_summary"](spark, SF))
    # the rollup never materializes the payload column
    agg_read = plan.split("ReadSchema:")[-1]
    assert "payload" not in agg_read


@pytest.mark.parametrize("name", ["q_csv_snapshot", "q_percentiles", "q_lag_diff"])
def test_no_cartesian_anywhere(spark, name):
    plan = physical(QUERIES[name](spark, SF))
    assert "CartesianProduct" not in plan


def test_q2_single_narrow_shuffle(spark):
    # repartition(l_partkey) satisfies both the (partkey,suppkey)
    # group-by and the partkey window: exactly one hash exchange, and
    # no supplier strings in the shuffled rows (they broadcast in after
    # the min-filter).
    plan = physical(QUERIES["q_tpch_q2"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    exchanged = plan.split("Exchange hashpartitioning")[1]
    assert "s_name" not in exchanged.split("BroadcastExchange")[0]


def test_q4_semi_join_with_residual_inequality(spark):
    plan = physical(QUERIES["q_tpch_q4"](spark, SF))
    assert "LeftSemi" in plan
    # the correlated l_shipdate > o_orderdate lives as a join residual,
    # not a post-join filter on a widened row
    semi = plan.split("LeftSemi")[1].split("\n")[0]
    assert "l_shipdate" in semi and "o_orderdate" in semi


def test_q9_dims_broadcast_fact_spine_shuffles(spark):
    # part/supplier/nation carry hints; the lineitem-orders spine must
    # NOT be a forced broadcast - under no-auto-broadcast it degrades
    # to a shuffled join instead of building an O(fact) hash table
    with no_auto_broadcast(spark):
        plan = physical(QUERIES["q_tpch_q9"](spark, SF))
        assert plan.count("BroadcastHashJoin") == 3
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_q16_not_in_is_anti_join(spark):
    plan = physical(QUERIES["q_tpch_q16"](spark, SF))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan  # the NOT IN trap avoided


def test_q21_one_lineitem_scan_window_form(spark):
    # r20: both correlated subqueries resolve from distinct-supplier
    # counts over ONE l_orderkey window - lineitem is scanned once
    # (the join form scanned it three times), the orders status check
    # stays a semi join, and nothing degenerates to a cartesian
    plan = physical(QUERIES["q_tpch_q21"](spark, SF))
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corpus_prep_single_scan_single_shuffle(spark):
    # the composed funnel (score -> gate -> dedup -> split) reads the
    # corpus once and shuffles once (the md5(text) dedup window)
    plan = physical(QUERIES["q_corpus_prep"](spark, SF))
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_single_shuffle_serves_all_windows(spark):
    # lead/row_number/running-sum share one partitioning + ordering:
    # exactly one exchange and one sort for all four window functions
    plan = physical(QUERIES["q_scd2_history"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan") == 1


def test_profile_columns_single_scan(spark):
    # all per-column metrics (incl. 5 exact distincts) fold into one
    # Expand-based aggregate over ONE scan of the table - not the
    # oracle's union of per-column scans
    plan = physical(QUERIES["q_profile_columns"](spark, SF))
    assert plan.count("FileScan") == 1
    assert "Expand" in plan


def test_merge_upsert_no_forced_broadcast(spark):
    # both merge legs join O(customer) sides - neither may be a forced
    # broadcast; under no-auto-broadcast they co-partition on c_custkey
    with no_auto_broadcast(spark):
        plan = physical(QUERIES["q_merge_upsert"](spark, SF))
        assert plan.count("BroadcastHashJoin") == 0
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_q21_orders_semi_not_forced_broadcast(spark):
    # the orders status semi-join is fact-fact: only the supplier
    # lookup may remain a forced broadcast at 100 TB
    with no_auto_broadcast(spark):
        plan = physical(QUERIES["q_tpch_q21"](spark, SF))
        assert plan.count("BroadcastHashJoin") == 1  # supplier only
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_twap_window_shuffle_reused_by_agg(spark):
    # window partitioning (user_id) == aggregation key: the agg must
    # reuse the window's exchange, not add a second one
    plan = physical(QUERIES["q_twap"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1


def test_pit_read_single_shuffle(spark):
    # SCD2 window build and the as-of max_by agg share the o_custkey
    # partitioning: one exchange end to end
    plan = physical(QUERIES["q_pit_read"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan") == 1


def test_repetition_stats_single_exchange_partial_agg(spark):
    """One explode pass over all three n-gram orders and ONE exchange
    total: the doc_id fan-out repartition satisfies ClusteredDistribution
    for BOTH the (doc,n,gram) count and the (doc) pivot (doc_id is a
    subset of each grouping key), so neither agg re-shuffles - never a
    per-order rescan or a per-doc array self-scan."""
    plan = physical(QUERIES["q_repetition_stats"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan  # map-side combine within the stage
    assert plan.count("FileScan parquet") == 1  # one scan feeds all orders


def test_pack_sequences_single_exchange(spark):
    """The bucket window is the only exchange; bin assignment is a
    projection over the running sum."""
    plan = physical(QUERIES["q_pack_sequences"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_rollup_merge_two_aggs_share_grain_lineage(spark):
    """Partials agg + merge agg, both map-side combined; the merge
    input is the partials output, never a second raw scan."""
    plan = physical(QUERIES["q_rollup_merge"](spark, SF))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 2  # partials + merge
    assert "partial_sum" in plan


def test_ivf_kmeans_probe_no_corpus_shuffle(spark):
    """The probe scan filters on cell membership and broadcasts the
    one-row query; the scored corpus side never hash-shuffles (top-k
    is TakeOrdered, assignment rides a broadcast join)."""
    from real_time_crypto_market_data_pipeline_spark.operators.similarity import (
        ivf_kmeans_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = physical(ivf_kmeans_topk(emb, 0, k=5, num_cells=4, n_probe=2))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_csv_snapshot_fused_single_pass(spark):
    """The flagship snapshot is one scan, one hash exchange, no join:
    both stat families aggregate from the same lag-windowed frame."""
    df = QUERIES["q_csv_snapshot"](spark, SF)
    df.collect()  # let AQE finalize
    plan = physical(df).split("== Initial Plan ==")[0]
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_realized_vol_window_shuffle_reused_by_agg(spark):
    # lag window partitioning (user_id) == aggregation key: one
    # exchange serves both
    plan = physical(QUERIES["q_realized_vol"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan") == 1


def test_drawdown_single_shuffle_single_scan(spark):
    plan = physical(QUERIES["q_drawdown"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan") == 1


def test_quantize_int8_projection_spread_no_python(spark):
    # per-vector quantization is a map with no Python boundary; the
    # only exchange allowed is the r20 compute-spread of a compact
    # single-file input (wide scans skip it - see spread_for_fanout)
    plan = physical(QUERIES["q_quantize_int8"](spark, SF))
    assert plan.count("Exchange") <= 1
    assert "REPARTITION_BY_NUM" in plan or "Exchange" not in plan
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython


def test_zorder_key_pure_projection(spark):
    plan = physical(QUERIES["q_zorder_key"](spark, SF))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_filter_funnel_one_scan_one_small_shuffle(spark):
    # rules fuse into the scan; the only exchange carries the
    # (source, stage) partial aggregates
    plan = physical(QUERIES["q_filter_funnel"](spark, SF))
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") == 2  # partial + final


def test_funnel_one_scan_one_exchange(spark):
    # the strict-order funnel compiles to one user-keyed sort shared
    # by both RANGE-frame windows and the final aggregate - the
    # chained-join form this replaced scanned events five times
    plan = physical(QUERIES["q_funnel"](spark, SF))
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 2


def test_interval_join_never_nested_loop(spark):
    with no_auto_broadcast(spark):
        plan = physical(QUERIES["q_interval_join"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_retention_cohort_presence_collapses_first(spark):
    # the DISTINCT (user, week) aggregate must sit below the cohort
    # window: the corpus-sized exchange happens once, everything
    # after runs over the small presence relation
    plan = physical(QUERIES["q_retention_cohort"](spark, SF))
    assert plan.count("FileScan") == 1
    # exchanges: presence distinct (user, week) + window (user) +
    # final (cohort, offset) agg - all post-collapse ones are tiny
    assert plan.count("Exchange hashpartitioning") <= 3


def test_correlation_single_scan(spark):
    # pairing via per-day collect_list + HOF expansion, not a
    # self-join: a self-join duplicates lineage and re-scans the
    # corpus twice
    plan = physical(QUERIES["q_correlation"](spark, SF))
    assert plan.count("FileScan") == 1


def test_interval_join_each_source_scanned_once(spark):
    # LEFT-mode bin join: no restore-join, so purchases and views
    # each scan exactly once
    plan = physical(QUERIES["q_interval_join"](spark, SF))
    assert plan.count("FileScan") == 2


def test_semdedup_assignment_materialized_once(spark):
    # r12 kept-direct tail: the kernel emits KEPT rows, so the
    # assignment has exactly ONE consumer and the whole dedup is one
    # unbroken pipeline - scan -> assign -> ONE cell_id exchange ->
    # kernel. No eager checkpoint copy, no anti-join stage, and the
    # corpus is scanned exactly once (the old tail's two-use lineage
    # needed a localCheckpoint to avoid eight re-derived scans).
    plan = physical(QUERIES["q_semdedup"](spark, SF))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_heavy_projections_spread_compact_inputs(spark):
    """r20: fingerprint / scalar_quantize_int8 / boilerplate_ngrams /
    scrub_text spread a compact (single-file) input before their
    compute-dense per-row work, instead of running it all on the
    scan's one partition. Pins (a) the spread fires on a narrow input,
    (b) results are partitioning-invariant (spread cannot change
    rows), (c) an already-wide input is NOT re-exchanged."""
    from real_time_crypto_market_data_pipeline_spark.operators import text as T
    from real_time_crypto_market_data_pipeline_spark.tables import load

    docs = load(spark, SF, "documents")
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # pin the OPERATOR's gate, not the fixture geometry (r20 ADVICE):
    # the spread fires iff the scan arrives narrower than shuffle width
    n_in = docs.rdd.getNumPartitions()
    for op in (T.fingerprint, T.scrub_text):
        narrow = op(docs)
        want = 1 if n_in < target else 0
        assert physical(narrow).count("REPARTITION_BY_NUM") == want
        wide_rows = sorted(map(tuple, op(docs.repartition(7, "doc_id")).collect()))
        assert sorted(map(tuple, narrow.collect())) == wide_rows
    pre_spread = docs.repartition(target, "doc_id")
    # already shuffle-width: the operator must not add a SECOND
    # exchange (the one in the plan is the caller's own repartition)
    assert physical(T.fingerprint(pre_spread)).count("REPARTITION_BY_NUM") == 1


def test_boilerplate_two_scans_no_restore_join(spark):
    # explode_outer keeps shingle-less docs in the stream, so the two
    # documented dsh uses (census + flag join) are the ONLY corpus
    # scans - no third restore-join scan
    plan = physical(QUERIES["q_boilerplate"](spark, SF))
    assert plan.count("FileScan") == 2


def test_jaccard_distinct_exchange_reused_at_runtime(spark):
    """The (doc, shingle) distinct feeds both self-join sides and the
    size census through canonically identical exchanges, so AQE's
    runtime exchange reuse computes it ONCE - the docstring's claim,
    asserted on the final adaptive plan. (Initial-plan FileScan counts
    over-state the cost for identical subtrees: audit final plans.)"""
    df = QUERIES["q_dedup_jaccard"](spark, SF)
    df.collect()
    es = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    final = df._jdf.queryExecution().explainString(es)
    assert "isFinalPlan=true" in final
    assert "ReusedExchange" in final


def test_session_stats_one_scan_one_exchange(spark):
    # the (user_id, session_id) grouping keys are a superset of the
    # window's user_id partitioning, so the aggregate reuses the
    # window's exchange
    plan = physical(QUERIES["q_session_stats"](spark, SF))
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_topk_per_group_has_mapside_window_group_limit(spark):
    """Spark plans the rank<=k filter as WindowGroupLimit Partial
    BELOW the exchange: each map task ships at most k rows per group,
    so a hot group cannot single-reducer the sort - the engine-native
    form of the two-stage top-k (measured against hand salting in
    SCALING.md "Skew A/B")."""
    import re

    plan = physical(QUERIES["q_topk_per_group"](spark, SF))
    # the Partial token must sit on the WindowGroupLimit line itself -
    # a bare substring check matches any partial HashAggregate
    assert re.search(r"WindowGroupLimit.*Partial", plan)
