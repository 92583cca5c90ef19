"""Deduplication operators for large-scale training-data pipelines
(SURVEY.md §2.11; mandated by BASELINE.json beyond the reference's own
surface).

Scale design: every operator is shuffle-bounded and UDF-free —
- exact:   hash groupBy (one shuffle on the content hash)
- jaccard: inverted-index pair generation (shuffle on token), so the
  candidate set is Σ_token C(df_token, 2), not C(N, 2) — at 100 TB you
  additionally drop ultra-common tokens (document-frequency cap) to
  bound skew; the cap is a parameter here
- minhash: k independent hash functions via xxhash64(token, seed_i);
  banding -> bucket-join (shuffle on band hash) -> exact-jaccard verify
  on candidates only.  Fixed seeds -> deterministic reruns (SURVEY §4.2)
- simhash: 64-bit sign-sum fingerprint; hamming-ball candidates via
  4×16-bit chunk equi-join (one chunk must match exactly if distance<=3)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(c: Column) -> Column:
    """Canonical content key: casefold, trim, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the first (min id) document per normalized-content hash.
    Returns (content_hash, keeper_id, n_dups).  One hash-agg shuffle."""
    h = F.md5(normalize_text(F.col(text_col))).alias("content_hash")
    return df.select(h, F.col(id_col)).groupBy("content_hash").agg(
        F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_dups")
    )


def tokens(c: Column) -> Column:
    return F.split(normalize_text(c), " ")


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    df_cap: int | None = None,
) -> DataFrame:
    """Exact n-gram (token) Jaccard near-dup pairs via inverted index.

    Plan: explode distinct tokens -> (token, id); self-join on token
    (id_a < id_b) -> per-pair intersection counts; join doc sizes;
    jaccard = inter / (|A| + |B| - inter).  Jaccard is a ratio of two
    small integers -> cross-engine exact.  ``df_cap`` drops tokens
    appearing in more than that many docs (skew bound at scale).
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok")
    )
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    if df_cap is not None:
        rare = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df")).where(
            F.col("df") <= df_cap
        )
        toks = toks.join(rare.select("tok"), "tok")
    a = toks.select(F.col("id").alias("id_a"), "tok")
    b = toks.select(F.col("id").alias("id_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "sz_a", "sz_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 32
) -> DataFrame:
    """k-permutation MinHash signature per doc: sig_i = min over tokens
    of xxhash64(token, seed=i).  One explode + one groupBy with k
    min-aggregates (partial map-side combine -> tiny shuffle)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    )
    aggs = [F.min(F.xxhash64("tok", F.lit(i))).alias(f"h{i}") for i in range(k)]
    return toks.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 32,
    bands: int = 8,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH candidate pairs, exact-Jaccard verified.

    banding: k/bands rows per band; band key = xxhash64(band rows).
    Candidates = pairs sharing >=1 band bucket.  All bands join in ONE
    self-join keyed on (band_index, band_hash) — posexplode turns the
    signature row into `bands` keyed rows, so the whole candidate
    generation is a single shuffle of bands·N rows instead of `bands`
    separate join stages.  Bucket sizes are the only skew risk; at
    100 TB add a bucket-size cap.  Each candidate is then verified with
    exact Jaccard so the output is deterministic given seeds.
    """
    rows_per_band = k // bands
    sig = minhash_signatures(df, text_col, id_col, k)
    band_cols = [
        F.xxhash64(*[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
            f"b{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "id", F.posexplode(F.array(*band_cols)).alias("band", "bk")
    )
    left = banded.select(F.col("id").alias("id_a"), "band", "bk")
    right = banded.select(F.col("id").alias("id_b"), "band", "bk")
    candidates = (
        left.join(right, ["band", "bk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    exact = jaccard_pairs(df, text_col, id_col, threshold=verify_threshold)
    return candidates.join(exact, ["id_a", "id_b"]).select(
        "id_a", "id_b", "jaccard"
    )


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash: per token hash, each bit votes ±1; fingerprint
    bit = sign of the vote sum.  Pure DataFrame: explode tokens, one
    groupBy with 64 conditional sums (map-side combined)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    ).select("id", F.xxhash64("tok").alias("th"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(64)
    ]
    sums = toks.groupBy("id").agg(*votes)
    fp = None
    for i in range(64):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << i).cast("long") if i < 63 else F.when(
            F.col("v63") > 0, F.lit(-(1 << 63)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return sums.select("id", fp.alias("simhash"))


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components over near-dup candidate pairs — the last
    stage of a real dedup pipeline: pair lists become canonical dedup
    GROUPS (component = min reachable id, the keeper).

    Algorithm: iterative min-label propagation PLUS pointer jumping
    (comp <- comp(comp)) each round — the hash-to-min family, which
    converges in O(log n) rounds instead of O(diameter), so a
    100 TB-scale run with million-node components needs ~20 rounds,
    not a million.  Each round is two shuffles (neighbor min + jump
    join); ``localCheckpoint`` truncates the growing lineage so round
    N's plan does not replay rounds 1..N-1.  Convergence is detected
    by the monotonically decreasing sum of labels (one tiny agg per
    round).  Fully deterministic: min is order-insensitive.

    Returns (id, component, csize) for every node that appears in at
    least one pair (singletons are not dup candidates).
    """
    edges = (
        pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
        .unionByName(pairs.select(F.col(id_b).alias("s"), F.col(id_a).alias("d")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("s").alias("id")).distinct().withColumn("comp", F.col("id"))
    prev_sum = None
    for _ in range(max_iter):
        nbr = (
            edges.join(labels.withColumnRenamed("id", "s"), "s")
            .groupBy(F.col("d").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        merged = labels.join(nbr, "id", "left").select(
            "id", F.least("comp", F.coalesce("nbr_comp", F.col("comp"))).alias("comp")
        )
        hop = merged.select(F.col("id").alias("jid"), F.col("comp").alias("jcomp"))
        labels = (
            merged.join(hop, merged["comp"] == hop["jid"], "left")
            .select("id", F.least(F.col("comp"), F.coalesce("jcomp", F.col("comp"))).alias("comp"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("comp")).first()[0]
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    # component sizes: AQE picks broadcast when the component table is
    # small; at scale (billions of components) it stays a shuffle join
    sizes = labels.groupBy("comp").agg(F.count(F.lit(1)).alias("csize"))
    return labels.join(sizes, "comp").select(
        "id", F.col("comp").alias("component"), "csize"
    )


def top_k_rows(df: DataFrame, partition: list[str], order: list[Column], k: int) -> DataFrame:
    w = Window.partitionBy(*partition).orderBy(*order)
    return df.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


def embed_cosine_dups(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "v",
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection (SURVEY.md §2.11
    dedup family): pairs (a, b) with cosine >= threshold, reduced to a
    keep-min-id decision per duplicate — (dup_id, keep_id, cos_sim).

    Plan: blocked-GEMM threshold pairs (similarity.threshold_pairs —
    the exact baseline; at 100 TB the pair source swaps to
    hyperplane_lsh_buckets / IVF cells, same downstream).
    """
    from mo_etl_spark.operators.similarity import threshold_pairs

    pairs = threshold_pairs(
        df, threshold, id_col=id_col, vec_col=vec_col, round_digits=round_digits
    )
    return pairs.groupBy(F.col("id_b").alias("dup_id")).agg(
        F.min("id_a").alias("keep_id"), F.max("cos").alias("cos_sim")
    )
