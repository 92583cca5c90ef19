"""LLM-pipeline operator behavior tests (beyond oracle parity): the
sketch-based ops have no SQL oracle, so assert their statistical
contracts on planted duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from mo_etl_spark.tables import load_table

    return load_table(spark, sf_dir, "documents")


def test_dedup_exact_collapses_mangled_copies(spark, docs):
    from mo_etl_spark.operators.dedup import dedup_exact
    from mo_etl_spark.suites.llm import _with_exact_dups

    out = dedup_exact(_with_exact_dups(docs)).collect()
    dups = [r for r in out if r["n_dups"] > 1]
    assert len(dups) == 100  # the planted mangled copies
    assert all(r["keeper_id"] < 10000 for r in dups)  # keeper is the original


def test_minhash_recovers_planted_near_dups(spark, docs):
    from mo_etl_spark.operators.dedup import minhash_lsh_pairs
    from mo_etl_spark.suites.llm import _with_near_dups

    pairs = minhash_lsh_pairs(_with_near_dups(docs)).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {(i, i + 20000) for i in range(100)}
    recovered = planted & found
    # LSH at 32/8 bands has >99% recall at jaccard >= 0.8
    assert len(recovered) >= 95, f"only {len(recovered)}/100 planted pairs found"


def test_simhash_close_for_near_dups(spark, docs):
    from mo_etl_spark.operators.dedup import simhash64
    from mo_etl_spark.suites.llm import _with_near_dups

    fp = {r["id"]: r["simhash"] for r in simhash64(_with_near_dups(docs)).collect()}

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    planted = [hamming(fp[i], fp[i + 20000]) for i in range(100) if i in fp]
    assert sum(d <= 16 for d in planted) >= 90  # near-dups are hamming-close


def test_knn_classify_mechanics(spark, sf_dir):
    """The corpus embeddings are label-structureless random vectors
    (verified: same-label mean cosine == cross-label ~= 0), so accuracy
    is chance by design; assert the voting mechanics instead.
    Correctness of the full pipeline is the DuckDB oracle's job."""
    from mo_etl_spark.operators.similarity import knn_classify
    from mo_etl_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = knn_classify(emb, k=10).collect()
    assert len(rows) == emb.count()  # one prediction per vector
    assert all(1 <= r["votes"] <= 10 for r in rows)
    assert all(0 <= r["pred_label"] <= 9 for r in rows)
    # determinism across runs
    rows2 = knn_classify(emb, k=10).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_embed_normalize_unit_norm(spark, sf_dir):
    from mo_etl_spark.operators.similarity import as_double, l2_norm, normalize
    from mo_etl_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = emb.select(
        l2_norm(normalize(as_double(F.col("embedding")))).alias("n")
    ).collect()
    assert all(abs(r["n"] - 1.0) < 1e-9 for r in out)


def test_approx_cardinality_within_rsd(spark, sf_dir):
    from mo_etl_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_multimodal_decode_schema_and_determinism(spark, docs):
    from mo_etl_spark.operators.multimodal import decode_batch, with_binary_payload

    out = decode_batch(with_binary_payload(docs))
    rows1 = sorted(map(tuple, out.collect()))
    rows2 = sorted(map(tuple, out.collect()))
    assert rows1 == rows2  # deterministic stub
    assert out.columns == ["doc_id", "n_bytes", "content_md5", "width", "height"]
    assert all(1 <= r[3] <= 64 and 1 <= r[4] <= 64 for r in rows1)


def test_audio_features_plumbing(spark, docs):
    """Audio feature stub: deterministic MFCC-shaped output with the
    declared schema and one row per input doc."""
    from mo_etl_spark.operators.multimodal import audio_features_batch, with_binary_payload

    out = audio_features_batch(with_binary_payload(docs.limit(20))).collect()
    assert len(out) == 20
    for r in out:
        assert len(r["features"]) == 4
        assert all(0.0 <= f < 1.0 for f in r["features"])
        assert r["n_samples"] > 0
    # deterministic across runs
    again = audio_features_batch(with_binary_payload(docs.limit(20))).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
