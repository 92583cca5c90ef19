"""Accuracy/behavior tests for the DataSketches additions and the
salted replicated join:

- theta set algebra in SKETCH mode (cardinalities far above nominal
  entries — the regime the contract query's exact-mode fixture can't
  reach) stays within published error bounds;
- KLL merged-rollup quantiles land within rank tolerance of exact;
- salted_join is result-invariant vs the plain join, including left
  joins with unmatched big-side keys.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_theta_setops_sketch_mode_accuracy(spark):
    # two 60k-element sets overlapping in [40000, 60000): 20k intersection
    a = spark.range(0, 60_000).select(F.col("id").alias("v"))
    b = spark.range(40_000, 100_000).select(F.col("id").alias("v"))
    ska = a.agg(F.theta_sketch_agg("v").alias("sk"))
    skb = b.agg(F.theta_sketch_agg("v").alias("sk2"))
    row = (
        ska.crossJoin(skb)
        .select(
            F.theta_sketch_estimate(F.theta_union("sk", "sk2")).alias("u"),
            F.theta_sketch_estimate(F.theta_intersection("sk", "sk2")).alias("i"),
            F.theta_sketch_estimate(F.theta_difference("sk", "sk2")).alias("d"),
        )
        .first()
    )
    assert abs(row["u"] - 100_000) / 100_000 < 0.05
    assert abs(row["i"] - 20_000) / 20_000 < 0.10  # intersection error compounds
    assert abs(row["d"] - 40_000) / 40_000 < 0.10


def test_kll_rollup_quantiles_within_rank_tolerance(spark):
    from mo_etl_spark.suites.analytics import agg_kll_quantile_rollup
    from mo_etl_spark.tables import load_table

    row = agg_kll_quantile_rollup(spark, SF).first()
    n = load_table(spark, SF, "events").count()
    assert row["n_events"] == n
    # the query re-scans events to measure each estimate's TRUE rank
    # and asserts |rank - q| <= 0.05 itself (KLL k=200 normalized rank
    # error ~1.65%); the booleans are the contract surface
    for col in ("p50_rank_ok", "p90_rank_ok", "p99_rank_ok"):
        assert row[col] is True, col


def test_salted_join_matches_plain_join(spark):
    from mo_etl_spark.operators.skew import salted_join
    from mo_etl_spark.tables import load_table

    e = load_table(spark, SF, "events").select("event_id", "user_id")
    # profile covering only half the users -> unmatched keys exist
    profile = (
        e.select("user_id").distinct().where(F.col("user_id") % 2 == 0)
        .withColumn("cohort", F.col("user_id") % 5)
    )
    for how in ("inner", "left"):
        salted = salted_join(e, profile, on=["user_id"], n_salts=4, how=how)
        plain = e.join(profile, ["user_id"], how)
        assert salted.count() == plain.count()
        assert salted.exceptAll(plain).count() == 0
        assert plain.exceptAll(salted).count() == 0


def test_salted_join_rejects_small_side_preserving_joins(spark):
    import pytest

    from mo_etl_spark.operators.skew import salted_join
    from mo_etl_spark.tables import load_table

    e = load_table(spark, SF, "events").select("event_id", "user_id")
    with pytest.raises(ValueError):
        salted_join(e, e, on=["user_id"], how="full")


def test_misra_gries_heavy_hitters_exact(spark):
    """MG guarantee: with phi >= 1/k every true heavy hitter is
    reported with its EXACT count, across multiple partitions and an
    adversarial interleave of cold keys; phi < 1/k is rejected."""
    import pytest

    from mo_etl_spark.operators.skew import misra_gries_heavy_hitters

    # 10_000 rows: 'a' 30%, 'b' 12%, 2000 cold keys share the rest,
    # interleaved so MG counters churn
    rows = []
    ci = 0
    for i in range(10_000):
        if i % 10 < 3:
            rows.append(("a",))
        elif i % 25 < 3:
            rows.append(("b",))
        else:
            rows.append((f"c{ci % 2000}",))
            ci += 1
    df = spark.createDataFrame(rows, "k string").repartition(8)
    got = {r["k"]: r["cnt"] for r in misra_gries_heavy_hitters(df, "k", k=16, phi=0.1).collect()}
    truth = {}
    for (k,) in rows:
        truth[k] = truth.get(k, 0) + 1
    expected = {k: c for k, c in truth.items() if c > 0.1 * len(rows)}
    assert got == expected and "a" in got

    with pytest.raises(ValueError):
        misra_gries_heavy_hitters(df, "k", k=10, phi=0.05)


def test_count_min_one_sided_error(spark, sf_dir):
    """CMS estimates NEVER undercount (min over rows of summed cells
    >= true count), and the sketch itself is bounded: at most
    depth*width distinct (r, cell) pairs regardless of key count."""
    from mo_etl_spark.suites.aggregates import _CMS_DEPTH, _CMS_WIDTH, agg_count_min_freq

    rows = agg_count_min_freq(spark, sf_dir).collect()
    assert rows
    assert all(r["n_est"] >= r["n_true"] for r in rows)
    assert all(r["overcount"] == r["n_est"] - r["n_true"] for r in rows)
    assert _CMS_DEPTH * _CMS_WIDTH == 1024  # bounded shuffle contract
