"""Skew-mitigation operators (SURVEY.md §4.3 100 TB design rules).

At scale a handful of hot keys (one user generating 1% of all events,
one null-ish default id) turn a groupBy or join into a single straggler
task.  Two standard remedies, both plain DataFrame ops so Catalyst/AQE
still see through them:

- **salted two-stage aggregation**: partial-aggregate on (key, salt)
  — the hot key's rows spread over ``n_salts`` tasks — then final-
  aggregate on key.  Works for any algebraic aggregate (sum/count/min/
  max; avg as sum+count).  AQE's skew handling covers sort-merge JOINs
  but not aggregations, so this is the groupBy-side tool.
- **salted broadcast-replicated join** (`salted_join`): the small side
  is replicated once per salt value, the big side salts randomly —
  each hot-key task handles 1/n of the hot rows.  Only needed when the
  small side is too big to broadcast outright but the key histogram is
  spiky; with a true dimension table, `F.broadcast` alone is better.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column],
    n_salts: int = 16,
    count_alias: str | None = None,
) -> DataFrame:
    """Two-stage skew-safe groupBy for sums/counts.

    Stage 1 groups on (keys..., salt) — deterministic salt from a row
    hash of everything, spreading a hot key across ``n_salts`` partial
    groups; stage 2 sums the partials on the true keys.  Result is
    bit-identical to the direct groupBy for integer aggregates (the
    ones this engine's money math uses), and the shuffle of stage 2
    carries only n_salts rows per key.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    stage1_aggs = [c.alias(f"_s_{name}") for name, c in sums.items()]
    if count_alias is not None:
        stage1_aggs.append(F.count(F.lit(1)).alias("_s__cnt"))
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*stage1_aggs)
    final_aggs = [F.sum(f"_s_{name}").alias(name) for name in sums]
    if count_alias is not None:
        final_aggs.append(F.sum("_s__cnt").alias(count_alias))
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: big side salted deterministically, small side
    replicated across all salt values, join on (keys..., salt).

    Only ``inner`` and ``left`` (big-side-preserving) joins are valid:
    an outer join that preserves the SMALL side would emit one
    null-extended row per salt replica for every unmatched small key."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [*on, "_salt"], how).drop("_salt")


def misra_gries_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 32,
    phi: float = 0.05,
) -> DataFrame:
    """Exact heavy hitters (frequency > phi of the stream) via the
    two-phase Misra-Gries pattern — the 100 TB way to find hot keys
    without a full-domain groupBy:

    1. **candidates**: each partition runs a k-counter Misra-Gries
       summary (mapInPandas, O(k) memory regardless of domain size).
       Guarantee: any key with global frequency > n/k exceeds n_p/k in
       at least one partition, so with phi >= 1/k the candidate union
       is a SUPERSET of the true heavy hitters (no false negatives;
       false positives are culled next).
    2. **verify**: exact recount restricted to the candidate set
       (broadcast semi-filter on the re-scan) and the phi threshold
       applied to exact counts — so the output is exact, not sketchy,
       and hash-checkable against a plain GROUP BY ... HAVING oracle.

    The full-domain groupBy this replaces shuffles one row per
    DISTINCT key; with billions of distinct keys (url, user id) that
    is the dominant cost, while candidates are at most
    k * n_partitions rows.  This is also the skew-DETECTION front end
    for salted_sum_count/salted_join: run it first, salt only the
    reported keys.
    """
    if phi < 1.0 / k:
        raise ValueError(f"phi={phi} must be >= 1/k={1.0 / k} for the superset guarantee")

    def mg_partition(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for v in pdf[key_col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = []
                    for c in counters:
                        counters[c] -= 1
                        if counters[c] == 0:
                            dead.append(c)
                    for c in dead:
                        del counters[c]
        yield pd.DataFrame({key_col: list(counters.keys())})

    keyed = df.select(key_col)
    candidates = keyed.mapInPandas(
        mg_partition, schema=f"{key_col} string"
    ).distinct()
    total = keyed.groupBy().agg(F.count("*").alias("_n"))
    return (
        keyed.join(F.broadcast(candidates), key_col)
        .groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") > F.lit(phi) * F.col("_n"))
        .select(
            key_col,
            "cnt",
            F.round(F.col("cnt") / F.col("_n"), 6).alias("share"),
        )
    )
