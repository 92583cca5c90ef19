"""Behavior tests for the modern-SQL surface: recursive CTE semantics
(tree completeness, threshold-reset correctness vs a Python model) and
LATERAL top-k bounds."""

from __future__ import annotations

from collections import defaultdict

SF = "/root/testdata/sf0.001"


def test_recursive_tree_covers_all_nations(spark):
    from mo_etl_spark.suites.modern_sql import sql_recursive_cte_tree

    rows = sql_recursive_cte_tree(spark, SF).collect()
    assert len(rows) == 25  # every nation reached exactly once
    by_key = {r["nationkey"]: r for r in rows}
    assert by_key[0]["depth"] == 0 and "/" not in by_key[0]["path"]
    for k, r in by_key.items():
        if k > 0:
            parent = (k - 1) // 2
            assert r["depth"] == by_key[parent]["depth"] + 1
            # path extends the parent's path by exactly one segment
            assert r["path"].rsplit("/", 1)[0] == by_key[parent]["path"]


def test_recursive_running_restart_matches_python_model(spark):
    from mo_etl_spark.suites.modern_sql import sql_recursive_running_restart
    from mo_etl_spark.tables import load_table

    got = {
        (r["o_custkey"], r["o_orderkey"]): r["bucket_total"]
        for r in sql_recursive_running_restart(spark, SF).collect()
    }
    src = (
        load_table(spark, SF, "orders")
        .where("o_custkey < 200")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .collect()
    )
    seqs = defaultdict(list)
    for r in src:
        seqs[r["o_custkey"]].append((r["o_orderkey"], round(r["o_totalprice"] * 100)))
    want = {}
    for cust, orders in seqs.items():
        total = 0
        for okey, cents in sorted(orders):
            total = cents if total >= 10_000_000 else total + cents
            want[(cust, okey)] = total
    assert got == want
    # the reset actually fires somewhere, or the fixture is too small
    # to exercise the non-window-expressible part
    assert any(
        v == c
        for (cust, okey), v in got.items()
        for (o, c) in [max((o, c) for o, c in seqs[cust] if o == okey)]
        if len(seqs[cust]) > 1 and okey != min(o for o, _ in seqs[cust])
    )


def test_lateral_topk_at_most_two_per_nation_ordered(spark):
    from mo_etl_spark.suites.modern_sql import join_lateral_topk_suppliers

    rows = join_lateral_topk_suppliers(spark, SF).collect()
    per_nation = defaultdict(list)
    for r in rows:
        per_nation[r["n_name"]].append(r["acctbal_cents"])
    from mo_etl_spark.tables import load_table
    from pyspark.sql import functions as F

    best = {
        r["n_name"]: r["mx"]
        for r in load_table(spark, SF, "supplier")
        .join(
            load_table(spark, SF, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.max(F.round(F.col("s_acctbal") * 100).cast("long")).alias("mx"))
        .collect()
    }
    assert set(per_nation) == set(best)  # exactly the nations with suppliers
    for nation, cents in per_nation.items():
        assert len(cents) <= 2
        assert max(cents) == best[nation]  # the true max made the top-2
