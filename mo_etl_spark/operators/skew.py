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
