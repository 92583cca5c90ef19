"""Join operators beyond Spark's native surface (SURVEY.md §2.3).

The jx language has no general join clause (u — ActiveData documents
denormalized/nested storage instead); the SQL joins come free from
DataFrame.join / Catalyst.  This module adds the two join shapes Spark
lacks natively, built scale-first:

- ``asof_join``: most-recent-right-row-before-left-row.  Implemented as
  union + partitioned window scan — ONE shuffle on the key columns,
  no UDF, no BroadcastNestedLoop; this is the standard big-data as-of
  technique and survives 100 TB (state per key is one row).
- ``range_join``: interval/band join on a time/numeric column.
  Implemented by bucketing both sides to ``bucket_width`` and
  equi-joining on (keys, bucket ± neighbor) then refining the exact
  predicate — turns an O(n·m) theta join into a co-partitioned hash
  join; bucket width should be >= the band width so each left row
  probes at most ceil(width/bucket)+1 buckets.
- ``top_k_per_group``: row_number over (partition, total order) <= k —
  Catalyst plans a partial top-k under AQE instead of a full sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_prefix: str = "r_",
    direction: str = "backward",
    tolerance_ms: int | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    ``on`` keys (left outer): ``backward`` = latest right with
    ``right_ts <= left_ts``; ``forward`` = earliest right with
    ``right_ts >= left_ts``.  ``tolerance_ms`` nulls the match when the
    nearest right row is further than that many milliseconds (pandas
    ``merge_asof`` tolerance semantics: nearest-then-bound, NOT
    any-row-within-bound).

    Plan (both directions): union both sides tagged, ONE window per key
    ordered by (ts, side) carrying the nearest right payload
    (``last(ignorenulls)`` over unbounded-preceding for backward,
    ``first(ignorenulls)`` over unbounded-following for forward), keep
    left rows.  Exactly-equal timestamps match in both directions (the
    side sort key places right rows on the frame side of left rows).
    One shuffle on the keys — never a per-row range probe.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    on = list(on)
    r_payload_t = right.select(F.struct(*right.columns).alias("p")).schema[0].dataType

    # ties: the right row must land inside the left row's frame, so
    # right sorts before left for backward, after left for forward.
    # nearest uses the backward tie layout: an exact-equal right row is
    # caught by the backward frame at distance 0 and backward wins ties,
    # so the forward frame missing equal rows is immaterial.
    l_side, r_side = (0, 1) if direction == "forward" else (1, 0)
    l2 = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.struct(*[c for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_payload_t).alias("__r"),
    )
    r2 = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        F.lit(None).cast(l2.schema["__l"].dataType).alias("__l"),
        F.struct(*[c for c in right.columns]).alias("__r"),
    )
    u = l2.unionByName(r2)
    base = Window.partitionBy(*on).orderBy("__ts", "__side")
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # the forward carry runs over the REVERSED total order with a
    # running (unboundedPreceding..current) frame: Spark's
    # unboundedFollowing frame re-scans forward per row until the first
    # non-null (O(n * gap) per partition — the lesson measured on
    # resample_linterp, 54 s -> 6 s); the reversed running frame is the
    # same value in O(n).  (desc __ts, desc __side) is the exact
    # reverse of the base order, so tie semantics are unchanged.
    wf = (
        Window.partitionBy(*on)
        .orderBy(F.desc("__ts"), F.desc("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if direction == "backward":
        nearest = F.last("__r", ignorenulls=True).over(wb)
    elif direction == "forward":
        nearest = F.last("__r", ignorenulls=True).over(wf)
    else:  # nearest: one shuffle, two sorts of the same partitioning;
        # pick the closer candidate; ties -> backward
        back = F.last("__r", ignorenulls=True).over(wb)
        fwd = F.last("__r", ignorenulls=True).over(wf)
        gb = F.abs(
            F.unix_micros(F.col("__ts")) - F.unix_micros(back[right_ts])
        )
        gf = F.abs(
            F.unix_micros(F.col("__ts")) - F.unix_micros(fwd[right_ts])
        )
        nearest = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(gb <= gf, back)
            .otherwise(fwd)
        )
    matched = u.withColumn("__m", nearest).where(F.col("__side") == l_side)
    if tolerance_ms is not None:
        gap = F.abs(
            F.unix_micros(F.col("__ts")) - F.unix_micros(F.col(f"__m.{right_ts}"))
        ) / F.lit(1000)
        matched = matched.withColumn(
            "__m", F.when(gap <= F.lit(tolerance_ms), F.col("__m"))
        )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in right.columns]
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_point: Column | str,
    right_point: Column | str,
    lower: Column,
    upper: Column,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Band join: match right rows with ``lower <= right_point - left_point
    <= upper`` (all in the same integer units, e.g. epoch millis).

    Scale path: both sides get an integer bucket = point div
    bucket_width; the right side is expanded to every bucket its match
    window can touch (sequence over the span — with bucket_width >=
    band width that is <= 2 buckets), then a plain equi-join on
    (keys..., bucket) followed by the exact band predicate.  Shuffles
    once per side on (keys, bucket); no nested-loop join at any scale.
    """
    on = list(on)
    lp = F.col(left_point) if isinstance(left_point, str) else left_point
    rp = F.col(right_point) if isinstance(right_point, str) else right_point

    lb = left.withColumn("__lp", lp.cast("long")).withColumn(
        "__bucket", F.floor(F.col("__lp") / bucket_width).cast("long")
    )
    # left row l matches right points in [l+lower, l+upper] — expand the
    # RIGHT side to each bucket of [rp-upper, rp-lower] so the equi-join
    # on the LEFT bucket covers the band
    rb = (
        right.withColumn("__rp", rp.cast("long"))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor((F.col("__rp") - upper) / bucket_width).cast("long"),
                    F.floor((F.col("__rp") - lower) / bucket_width).cast("long"),
                )
            ),
        )
    )
    cond = (F.col("__rp") - F.col("__lp") >= lower) & (
        F.col("__rp") - F.col("__lp") <= upper
    )
    joined = lb.join(rb, on=on + ["__bucket"], how="inner").where(cond)
    out = joined.select(
        *[lb[c] for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        *[rb[c].alias(f"r_{c}") for c in right.columns if c not in on],
    )
    if how == "inner":
        return out
    raise ValueError(f"range_join supports inner only, got {how!r}")


def top_k_per_group(
    df: DataFrame,
    partition: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_name: str = "rnk",
) -> DataFrame:
    """Top-k rows per group via row_number over a TOTAL order (callers
    must include a tiebreaker for determinism — SURVEY.md §4.3)."""
    w = Window.partitionBy(*partition).orderBy(*order)
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .where(F.col(rank_name) <= k)
    )


def fuzzy_blocked_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    block_chars: int = 3,
    max_distance: int = 2,
) -> DataFrame:
    """Entity-resolution join: equi-join on a cheap BLOCK key (first
    ``block_chars`` of the casefolded key) to bound candidates, then an
    exact levenshtein filter (``<= max_distance``) verifies each pair —
    the classic blocking+verify record-linkage plan.  One hash-join
    shuffle on the block key; the quadratic edit-distance work runs
    only within blocks.  Recall caveat (documented contract): edits
    INSIDE the block prefix move a record to another block — raise
    block_chars recall via multi-blocking (union of several block
    functions) at scale.

    Returns left.* + right.* + the distance as ``edit_distance``.
    """
    lb = F.lower(F.trim(F.col(left_key)))
    rb = F.lower(F.trim(F.col(right_key)))
    l2 = left.withColumn("__blk", F.substring(lb, 1, block_chars))
    r2 = right.withColumn("__blk", F.substring(rb, 1, block_chars))
    joined = l2.join(r2, "__blk")
    dist = F.levenshtein(
        F.lower(F.trim(F.col(left_key))), F.lower(F.trim(F.col(right_key)))
    )
    return (
        joined.withColumn("edit_distance", dist)
        .where(F.col("edit_distance") <= max_distance)
        .drop("__blk")
    )


def interval_overlap_pairs(
    iv: DataFrame,
    start: str = "s_ms",
    end: str = "e_ms",
    bucket: int = 3_600_000,
    key: str = "user_id",
) -> DataFrame:
    """INTERVAL x INTERVAL self overlap join, bucketed (SURVEY.md §2.3
    extension; suites/analytics.join_interval_overlap_sessions).

    Each interval [start, end] (closed) explodes to the fixed-width
    grid buckets it covers; candidate pairs meet through an EQUI join
    on bucket, the residual overlap predicate is cheap, and duplicate
    matches across shared buckets are eliminated WITHOUT a distinct by
    keeping a pair only in the first bucket both cover
    (bucket == floor(max(starts)/bucket)).  Shuffle volume is
    O(sum(interval_length)/bucket), never O(n^2); pick `bucket` near
    the median interval length so most intervals hit 1-2 buckets.

    Emits a.<key> < b.<key> pairs with both intervals and overlap_ms.
    """
    buck = iv.select(
        key,
        start,
        end,
        F.explode(
            F.sequence(
                (F.col(start) / bucket).cast("long"),
                (F.col(end) / bucket).cast("long"),
            )
        ).alias("bucket"),
    )
    a, b = buck.alias("a"), buck.alias("b")
    first_common = (F.greatest(F.col(f"a.{start}"), F.col(f"b.{start}")) / bucket).cast(
        "long"
    )
    return a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{key}") < F.col(f"b.{key}"))
        & (F.col(f"a.{start}") <= F.col(f"b.{end}"))
        & (F.col(f"b.{start}") <= F.col(f"a.{end}"))
        & (F.col("a.bucket") == first_common),
    ).select(
        F.col(f"a.{key}").alias("u1"),
        F.col(f"b.{key}").alias("u2"),
        F.col(f"a.{start}").alias("a_start_ms"),
        F.col(f"b.{start}").alias("b_start_ms"),
        (
            F.least(F.col(f"a.{end}"), F.col(f"b.{end}"))
            - F.greatest(F.col(f"a.{start}"), F.col(f"b.{start}"))
        ).alias("overlap_ms"),
    )
