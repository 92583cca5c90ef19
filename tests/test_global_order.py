"""Unit tests for the two-pass global-order primitives
(operators/global_order.py): each must be BIT-IDENTICAL to its
single-partition-window reference form on adversarial small inputs —
ties, descending order, N smaller than the bucket count, empty range
partitions — while containing no partition-less Window in its plan."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mo_etl_spark.operators.global_order import (
    ntile_two_pass,
    prefix_sum_two_pass,
    running_max_strict_two_pass,
    with_global_row_number,
)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _synth(spark, n=207, seed_mod=13):
    # keys with heavy ties (id % 13) and a unique tie-break id
    return spark.range(n).select(
        F.col("id").alias("uid"),
        F.pmod(F.col("id") * 7, F.lit(seed_mod)).alias("k"),
        (F.pmod(F.col("id") * 31, F.lit(97))).cast("long").alias("v"),
    )


def test_global_row_number_matches_window(spark):
    df = _synth(spark)
    order = [F.col("k"), F.col("uid")]
    got = with_global_row_number(df, order, out="rn", n_parts=7)
    ref = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert _rows(got, "uid", "rn") == _rows(ref, "uid", "rn")


def test_global_row_number_desc_with_total(spark):
    df = _synth(spark, n=55)
    order = [F.col("k").desc(), F.col("uid")]
    got = with_global_row_number(df, order, out="rn", n_parts=9, total_out="N")
    ref = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert _rows(got, "uid", "rn") == _rows(ref, "uid", "rn")
    assert got.select("N").distinct().collect()[0][0] == 55


def test_ntile_matches_window_all_bucket_shapes(spark):
    # N % n != 0 (207 % 5 = 2), plus tiny-N edge where N < n
    for n_rows, n in ((207, 5), (3, 5), (10, 10), (11, 4)):
        df = _synth(spark, n=n_rows)
        order = [F.col("k"), F.col("uid")]
        got = ntile_two_pass(df, n, order, "t", n_parts=6)
        ref = df.withColumn("t", F.ntile(n).over(Window.orderBy(*order)))
        assert _rows(got, "uid", "t") == _rows(ref, "uid", "t"), (n_rows, n)


def test_prefix_sum_matches_window(spark):
    df = _synth(spark)
    order = [F.col("k"), F.col("uid")]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    ref = df.withColumn("s", F.coalesce(F.sum("v").over(w), F.lit(0)))
    got = prefix_sum_two_pass(df, order, F.col("v"), "s", n_parts=5)
    assert _rows(got, "uid", "s") == _rows(ref, "uid", "s")


def test_running_max_strict_matches_range_window(spark):
    df = _synth(spark)  # k has heavy ties: the strictness matters
    w = Window.orderBy("k").rangeBetween(Window.unboundedPreceding, -1)
    ref = df.withColumn("m", F.max("v").over(w))
    got = running_max_strict_two_pass(df, F.col("k"), F.col("v"), "m", n_parts=5)
    assert _rows(got, "uid", "m") == _rows(ref, "uid", "m")


def test_two_pass_has_no_partitionless_window(spark):
    df = _synth(spark)
    got = ntile_two_pass(df, 5, [F.col("k"), F.col("uid")], "t", n_parts=6)
    plan = got._jdf.queryExecution().executedPlan().toString()
    for ln in plan.splitlines():
        if "Window [" in ln and "windowspecdefinition" in ln:
            assert "_go_pid" in ln, ln


def test_more_partitions_than_rows(spark):
    # empty range partitions must not corrupt offsets
    df = _synth(spark, n=4)
    order = [F.col("k"), F.col("uid")]
    got = with_global_row_number(df, order, out="rn", n_parts=16)
    ref = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert _rows(got, "uid", "rn") == _rows(ref, "uid", "rn")
