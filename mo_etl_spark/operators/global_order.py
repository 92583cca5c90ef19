"""Two-pass GLOBAL-ORDER primitives: exact ntile / prefix-sum /
running-extreme over a total order WITHOUT a single-partition window.

The classic scale-killer is ``Window.orderBy(...)`` with no
``partitionBy`` — Spark plans ``Exchange SinglePartition`` and drags
every row through one task.  All three primitives here use the same
two-pass shape instead (the textbook distributed prefix-scan, cf.
Blelloch 1990 scan semantics applied to shuffled partitions):

1. ``repartitionByRange(n, *order)`` — a range exchange.  The range
   partitioner is a pure function of the key, so EQUAL keys never
   straddle partitions and partition ids ascend with the order.
2. Per-partition aggregates (count / sum / max) — one distributed
   groupBy over at most ``n_parts`` groups.
3. Prefix offsets across partitions via a TRIANGULAR self-join of the
   tiny per-partition aggregate (≤ n_parts rows, so ≤ n_parts² pairs —
   constant in the data size, and deliberately NOT a window so the
   plan contains no ``Exchange SinglePartition`` feeding a Window).
4. Broadcast the offsets back on ``_pid`` and finish with a LOCAL
   window partitioned by ``_pid`` — every window in the final plan
   carries a partition spec; nothing is data-scaled-single-partition.

Cost: one range shuffle + one small hash shuffle for the local window
(by ``_pid``) + two tiny aggregates.  At 100 TB each partition holds
~N/n_parts rows — the operator scales with the cluster, unlike the
single-window form whose one task holds all N rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PID = "_go_pid"


def _n_parts(df: DataFrame, n_parts: int | None) -> int:
    if n_parts is not None:
        return n_parts
    # shuffle.partitions may be non-numeric on some platforms (e.g.
    # "auto" under AQE-managed deployments) — degrade to a sane width
    # instead of raising (ADVICE r4)
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    except (ValueError, TypeError):
        return 32


def _range_tagged(df: DataFrame, order: list[Column], n_parts: int) -> DataFrame:
    """Range-partition by the total order and tag each row with its
    physical partition id (ids ascend with the range order)."""
    return df.repartitionByRange(n_parts, *order).withColumn(
        PID, F.spark_partition_id()
    )


def _prefix_offsets(
    per_pid: DataFrame, value_cols: list[str], total: bool = False
) -> DataFrame:
    """EXCLUSIVE prefix aggregate across partition ids via ONE tiny
    self-cross-join of the ≤ n_parts-row per-partition summary
    (≤ n_parts² pairs — constant in the data size, deliberately NOT a
    window so the plan contains no SinglePartition exchange feeding a
    Window).  Returns (_go_pid, _off_<col>..., [_tot_<col>...]) —
    the conditional sum gives the exclusive offset and the plain sum
    the global total from the SAME pair set, so the summary is
    consumed once."""
    a = per_pid.alias("a")
    b = per_pid.alias("b")
    earlier = F.col(f"b.{PID}") < F.col(f"a.{PID}")
    aggs = [
        F.coalesce(
            F.sum(F.when(earlier, F.col(f"b.{c}"))), F.lit(0)
        ).alias(f"_off_{c}")
        for c in value_cols
    ]
    if total:
        aggs += [F.sum(F.col(f"b.{c}")).alias(f"_tot_{c}") for c in value_cols]
    return a.crossJoin(b).groupBy(F.col(f"a.{PID}").alias(PID)).agg(*aggs)


def with_global_row_number(
    df: DataFrame,
    order: list[Column],
    out: str = "rn",
    n_parts: int | None = None,
    total_out: str | None = None,
) -> DataFrame:
    """Exact 1-based global row_number over a TOTAL order (make the
    order total — include a unique tie-break column), two-pass.  When
    ``total_out`` is given, also attaches the global row count N (for
    ntile-style bucketing) via a 1-row broadcast cross join."""
    np_ = _n_parts(df, n_parts)
    p = _range_tagged(df, order, np_)
    cnt = p.groupBy(PID).agg(F.count(F.lit(1)).alias("_pc"))
    off = _prefix_offsets(cnt, ["_pc"], total=total_out is not None)
    local = F.row_number().over(Window.partitionBy(PID).orderBy(*order))
    keep = [c for c in df.columns]
    res = p.join(F.broadcast(off), PID).withColumn(
        out, (F.col("_off__pc") + local).cast("long")
    )
    if total_out is not None:
        res = res.withColumn(total_out, F.col("_tot__pc"))
    extra = [total_out] if total_out is not None else []
    return res.select(*keep, out, *extra)


def ntile_two_pass(
    df: DataFrame,
    n: int,
    order: list[Column],
    out: str,
    n_parts: int | None = None,
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY order)`` semantics (first
    ``N % n`` buckets get ``N//n + 1`` rows, the rest ``N//n``)
    computed from the two-pass global row number — bit-identical to
    the single-window form when the order is total, but with no
    single-partition stage."""
    rn_col, n_col = "_go_rn", "_go_N"
    ranked = with_global_row_number(
        df, order, out=rn_col, n_parts=n_parts, total_out=n_col
    )
    rn = F.col(rn_col)
    big = F.floor(F.col(n_col) / n)  # rows per small bucket
    rem = F.col(n_col) % n  # number of (big+1)-sized buckets
    head = rem * (big + 1)
    tile = (
        F.when(rn <= head, F.floor((rn - 1) / (big + 1)))
        .otherwise(rem + F.floor((rn - 1 - head) / F.greatest(big, F.lit(1))))
        + 1
    )
    return ranked.withColumn(out, tile.cast("int")).drop(rn_col, n_col)


def prefix_sum_two_pass(
    df: DataFrame,
    order: list[Column],
    value: Column,
    out: str,
    n_parts: int | None = None,
) -> DataFrame:
    """Exact EXCLUSIVE global prefix sum of ``value`` over a total
    order (``sum(value) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING
    AND 1 PRECEDING)``, null → 0): per-partition exclusive cumsum +
    broadcast per-partition offsets.  The sequence-packing layout at
    100 TB is exactly this (per-shard cumsum + shard-offset merge)."""
    np_ = _n_parts(df, n_parts)
    p = _range_tagged(df, order, np_).withColumn("_go_v", value.cast("long"))
    per = p.groupBy(PID).agg(F.sum("_go_v").alias("_pv"))
    off = _prefix_offsets(per, ["_pv"])
    w = Window.partitionBy(PID).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = F.coalesce(F.sum("_go_v").over(w), F.lit(0))
    keep = [c for c in df.columns]
    return (
        p.join(F.broadcast(off), PID)
        .withColumn(out, (F.col("_off__pv") + local).cast("long"))
        .select(*keep, out)
    )


def running_max_strict_two_pass(
    df: DataFrame,
    order_value: Column,
    value: Column,
    out: str,
    n_parts: int | None = None,
) -> DataFrame:
    """``max(value) OVER (ORDER BY order_value RANGE UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` — the running max over STRICTLY
    smaller order keys (null when none), two-pass.  Because the range
    partitioner never splits equal keys, every row in an earlier
    partition has a strictly smaller key than every row here, so the
    cross-partition part is just the prefix max of per-partition
    maxima (triangular join, ≤ n_parts rows); the within-partition
    part is the same RANGE frame, now partitioned by ``_go_pid``.
    ``order_value`` must be integral (RANGE -1 frame requirement)."""
    np_ = _n_parts(df, n_parts)
    p = (
        df.withColumn("_go_k", order_value)
        .withColumn("_go_v", value)
        .repartitionByRange(np_, F.col("_go_k"))
        .withColumn(PID, F.spark_partition_id())
    )
    per = p.groupBy(PID).agg(F.max("_go_v").alias("_pm"))
    a, b = per.alias("a"), per.alias("b")
    off = (
        a.join(b, F.col(f"b.{PID}") < F.col(f"a.{PID}"), "left")
        .groupBy(F.col(f"a.{PID}").alias(PID))
        .agg(F.max(F.col("b._pm")).alias("_prev_max"))  # null if no earlier rows
    )
    w = (
        Window.partitionBy(PID)
        .orderBy("_go_k")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    local = F.max("_go_v").over(w)
    keep = [c for c in df.columns]
    # greatest() skips nulls; null only when BOTH sides are null
    return (
        p.join(F.broadcast(off), PID)
        .withColumn(out, F.greatest(local, F.col("_prev_max")))
        .select(*keep, out)
    )
