"""Spatial join operators (engine addition; the reference has no
spatial surface — this is the 2D analog of join_range's 1D band join).

The grid (fixed-cell) spatial join is the standard distributed
algorithm (public: SpatialSpark/Sedona-style PBSM / grid partitioning):
bucket both sides into square cells of side ``g``; replicate one side
to its 3x3 cell neighborhood; equi-join on the cell key; refine with
the exact predicate.  For a radius predicate with ``r <= g`` the 3x3
neighborhood provably contains every match (two points within ``r``
differ by < g per axis => cell indices differ by <= 1), so the join is
EXACT — bucketing only bounds the candidate set.

Scale shape: one shuffle on the cell key for each side (the replicated
side is dimension-sized here and broadcasts; at large x large both
sides shuffle-partition by cell — spatial locality becomes partition
locality), candidate count is bounded by local density, never N x M.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grid_radius_join(
    points: DataFrame,
    centers: DataFrame,
    g: int,
    r: int,
    broadcast_centers: bool = True,
) -> DataFrame:
    """All (point, center) pairs with squared euclidean distance
    <= r*r, via 3x3-neighborhood grid bucketing.  Requires ``r <= g``
    (asserted) — the exactness condition.

    ``points``: (pid, x, y); ``centers``: (cid, cx, cy); integer
    coordinates (exact cross-engine arithmetic).  Returns
    (pid, cid, d2).
    """
    if r > g:
        raise ValueError(f"grid_radius_join exactness needs r <= g (got r={r}, g={g})")
    pts = points.select(
        "pid",
        "x",
        "y",
        F.floor(F.col("x") / g).alias("cellx"),
        F.floor(F.col("y") / g).alias("celly"),
    )
    ctr = (
        centers.select("cid", "cx", "cy")
        .withColumn("dxo", F.expr("explode(array(-1, 0, 1))"))
        .withColumn("dyo", F.expr("explode(array(-1, 0, 1))"))
        .select(
            "cid",
            "cx",
            "cy",
            (F.floor(F.col("cx") / g) + F.col("dxo")).alias("cellx"),
            (F.floor(F.col("cy") / g) + F.col("dyo")).alias("celly"),
        )
    )
    if broadcast_centers:
        ctr = F.broadcast(ctr)
    d2: Column = (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx")) + (
        F.col("y") - F.col("cy")
    ) * (F.col("y") - F.col("cy"))
    return (
        pts.join(ctr, ["cellx", "celly"])
        .where(d2 <= F.lit(int(r) * int(r)))  # py-side square: int32 lit*lit would wrap
        .select("pid", "cid", d2.alias("d2"))
    )
