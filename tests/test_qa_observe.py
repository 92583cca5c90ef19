"""df.observe in-flight QA: the metric values ride the query's own
execution pass and must equal independently-computed aggregates."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_observed_ingest_metrics_match_direct_aggregates(spark):
    from mo_etl_spark.operators import qa
    from mo_etl_spark.suites.analytics import qa_observed_ingest
    from mo_etl_spark.tables import load_table

    qa_observed_ingest(spark, SF).collect()  # action materializes metrics
    got = qa.LAST["qa_observed_ingest"].get

    e = load_table(spark, SF, "events")
    want = e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("n_null_user"),
        F.sum((F.col("value") <= 0).cast("long")).alias("n_nonpos_value"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    ).first()
    assert got["n_rows"] == want["n_rows"] > 0
    assert got["n_null_user"] == want["n_null_user"]
    assert got["n_nonpos_value"] == want["n_nonpos_value"]
    assert got["min_ts"] == want["min_ts"]
    assert got["max_ts"] == want["max_ts"]
