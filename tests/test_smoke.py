from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)


def test_q1_shape(spark, sf_dir):
    qs = entrymod.queries()
    df = qs["q1_pricing_summary"](spark, sf_dir)
    rows = df.collect()
    # returnflag x linestatus groups — small, deterministic
    assert 1 <= len(rows) <= 10
    for r in rows:
        assert r["count_order"] > 0
        assert abs(r["sum_disc_price"]) <= abs(r["sum_base_price"]) * 1.01
