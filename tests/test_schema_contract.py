"""Testdata schema contract + type-adaptive events.ts loading.

Round 2 was lost to silent schema drift: the driver's ``events.ts``
changed from LONG nanoseconds to parquet ``timestamp[us]`` and every
time-derived query failed at analysis time. These tests pin the two
guarantees that prevent a repeat:

1. the live testdata satisfies the schema contract selfcheck enforces;
2. ``tables.events_ms_col`` derives the SAME integer epoch-ms from
   either storage type (LONG-ns synthesized in tmp_path), using integer
   arithmetic only (ns values exceed double's 2^53 exact range, so
   float division could flip an ms - ADVICE r2).
"""

from __future__ import annotations

import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from real_time_crypto_market_data_pipeline_spark.tables import (
    events_ms_col,
    load_events,
)

SF = "/root/testdata/sf0.001"


def test_live_testdata_satisfies_contract(spark):
    sys.path.insert(0, "tools")
    from selfcheck import check_schema

    assert check_schema(spark, SF) == []


def test_ms_from_timestamp_storage(spark):
    """Current storage (timestamp[us]) -> ms == DuckDB epoch_ms(ts)."""
    import duckdb

    got = {
        r.event_id: r.ms
        for r in load_events(spark, SF).select("event_id", "ms").collect()
    }
    want = dict(
        duckdb.sql(
            f"SELECT event_id, epoch_ms(ts) FROM read_parquet('{SF}/events.parquet')"
        ).fetchall()
    )
    assert got == want


def test_ms_identical_across_storage_types(spark, tmp_path):
    """A LONG-ns copy of the same data yields identical ms values."""
    tbl = pq.read_table(f"{SF}/events.parquet")
    ts_us = tbl["ts"].cast(pa.int64())  # micros since epoch
    ts_ns = pa.compute.multiply(ts_us, pa.scalar(1000, pa.int64()))
    ns_tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", ts_ns)
    ns_dir = tmp_path / "ns"
    ns_dir.mkdir()
    pq.write_table(ns_tbl, ns_dir / "events.parquet")

    from_ts = {
        r.event_id: r.ms
        for r in load_events(spark, SF).select("event_id", "ms").collect()
    }
    from_ns = {
        r.event_id: r.ms
        for r in load_events(spark, str(tmp_path / "ns"))
        .select("event_id", "ms")
        .collect()
    }
    assert from_ns == from_ts
    # and the LONG-ns branch stayed integer arithmetic: a ns value near
    # the top of the data range would flip under double round-trip
    df = load_events(spark, str(tmp_path / "ns"))
    assert dict(df.dtypes)["ts"] == "bigint"
    assert dict(df.dtypes)["ms"] == "bigint"


def test_2p53_boundary_exactness(spark):
    """ns > 2^53: DIV stays exact where float division would round.

    9007199254740993 (2^53+1) is not double-representable; scaled to ns
    territory the error reaches whole milliseconds. The helper must
    floor-divide exactly.
    """
    big_ns = [
        (1, 1_700_000_000_123_456_789),  # realistic 2023 ns timestamp
        (2, 9_007_199_254_740_993),  # 2^53 + 1
        (3, 2**62 + 999_999),  # near-max long, ms floor boundary
    ]
    df = spark.createDataFrame(big_ns, "event_id INT, ts LONG")
    got = {
        r.event_id: r.ms
        for r in df.withColumn("ms", events_ms_col(df)).collect()
    }
    assert got == {k: v // 1_000_000 for k, v in big_ns}


def test_unsupported_type_fails_loudly(spark):
    df = spark.createDataFrame([(1, "x")], "event_id INT, ts STRING")
    with pytest.raises(TypeError, match="schema drift"):
        events_ms_col(df)
