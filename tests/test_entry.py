"""Smoke tests for the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert "q1_pricing_summary" in qs
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_all_queries_run_on_smoke_sf(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, entrymod.SMOKE_SF_DIR)
        assert df.columns, name
