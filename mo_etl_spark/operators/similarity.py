"""Similarity search over embedding columns (SURVEY.md §2.11).

Baseline: exact brute-force cosine top-k — blocked cross join with the
dot product in built-in higher-order functions (zip_with + aggregate:
sequential left-to-right summation, mirroring the oracle's formula so
doubles match bit-for-bit before rounding).

Scale path: random-hyperplane LSH bucketing (deterministic planes from
a fixed seed) — candidates only within matching buckets, turning the
O(N·Q) cross join into a bucket equi-join; brute force within bucket.
At 100 TB-class corpora you'd additionally IVF-partition (k-means
coarse quantizer) — the bucketing operator below is the same plumbing
with a different assignment function.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential Σ a_i·b_i (same op order as the DuckDB oracle).

    NOTE: an expanded ``a[0]*b[0] + … + a[63]*b[63]`` form was measured
    2-4× SLOWER than this higher-order form at dim=64 (the giant
    expression tree blows past codegen method limits and falls back to
    interpreted eval per node), so the fixed-dim unroll was abandoned."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def normalize(vec: Column) -> Column:
    """L2-normalize (÷0 -> Null elements under non-ANSI, like jx math)."""
    n = l2_norm(vec)
    return F.transform(vec, lambda x: x / n)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    c_id: str = "c_id",
    vec: str = "vec",
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Plan: broadcast the smaller side if it fits (Catalyst/AQE decides;
    corpus blocks of ~10k rows keep each task's pair count bounded),
    ordering by (rounded cosine DESC, c_id) — a total order, so results
    are deterministic and cross-engine comparable.
    """
    # norms precomputed per vector (not per pair) — sqrt(Σx²) is
    # deterministic, so dot/(qn·cn) is bitwise-identical to the
    # per-pair formula while doing 1/3 of the aggregate work
    q = queries.select(F.col(q_id), as_double(F.col(vec)).alias("qv")).withColumn(
        "qn", l2_norm(F.col("qv"))
    )
    c = corpus.select(F.col(c_id), as_double(F.col(vec)).alias("cv")).withColumn(
        "cn", l2_norm(F.col("cv"))
    )
    pairs = q.crossJoin(c).where(F.col(q_id) != F.col(c_id))
    scored = pairs.select(
        q_id,
        c_id,
        F.round(
            dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), round_digits
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(c_id))
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


def hyperplane_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection bucket id per vector (deterministic
    planes from ``seed``).  Vectors in the same bucket are cosine-close
    with high probability; join buckets to get candidates."""
    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
    v = as_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        # literal plane coefficients -> expanded codegen-able projection
        proj = sum((v[j] * F.lit(p[j]) for j in range(1, dim)), start=v[0] * F.lit(p[0]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(0)
    return df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def knn_classify(
    embeddings: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_filter: Column | None = None,
) -> DataFrame:
    """Majority label of the k nearest neighbors (self excluded); ties
    broken toward the smaller label — deterministic, oracle-matching.
    ``query_filter`` bounds the query side (corpus side stays full)."""
    q_src = embeddings.where(query_filter) if query_filter is not None else embeddings
    q = q_src.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("vec"))
    c = embeddings.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("vec"), F.col(label_col)
    )
    topk = brute_force_topk(
        q, c.select("c_id", "vec"), k=k, q_id="q_id", c_id="c_id", vec="vec"
    )
    labeled = topk.join(
        c.select("c_id", label_col), "c_id"
    )
    counts = labeled.groupBy("q_id", label_col).agg(F.count(F.lit(1)).alias("votes"))
    w = Window.partitionBy("q_id").orderBy(F.col("votes").desc(), F.col(label_col))
    return (
        counts.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select(F.col("q_id"), F.col(label_col).alias("pred_label"), "votes")
    )
