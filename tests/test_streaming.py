"""Actual Structured Streaming smoke tests: the batch-first window
functions run unchanged on readStream inputs; foreachBatch ETL moves
microbatches through a transform into a sink with checkpointing."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def tmpdir():
    os.makedirs("/root/repo/.cache", exist_ok=True)
    d = tempfile.mkdtemp(prefix="moetl_stream_", dir="/root/repo/.cache")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _feed_dir(spark, sf_dir, tmpdir):
    """Stage events parquet as a file-drop directory (the S3-block
    analog) and return (path, schema)."""
    from mo_etl_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    path = f"{tmpdir}/feed"
    events.write.mode("overwrite").parquet(path)
    return path, events.schema


def test_stream_tumbling_matches_batch(spark, sf_dir, tmpdir):
    from mo_etl_spark.streaming import file_stream_source, tumbling_agg
    from mo_etl_spark.tables import load_table

    path, schema = _feed_dir(spark, sf_dir, tmpdir)
    stream = file_stream_source(spark, path, schema).withWatermark("ts", "1 hour")
    out = tumbling_agg(
        stream, "ts", "1 hour", ["event_type"], [F.count(F.lit(1)).alias("n")]
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tumbling_smoke")
        .outputMode("complete")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win"]["start"], r["event_type"]): r["n"]
        for r in spark.sql("select * from tumbling_smoke").collect()
    }
    batch = tumbling_agg(
        load_table(spark, sf_dir, "events"),
        "ts",
        "1 hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("n")],
    )
    want = {(r["win"]["start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want  # stream (availableNow, complete) == batch


def test_foreach_batch_etl(spark, sf_dir, tmpdir):
    from mo_etl_spark.streaming import file_stream_source, foreach_batch_etl

    path, schema = _feed_dir(spark, sf_dir, tmpdir)
    stream = file_stream_source(spark, path, schema)
    out_path = f"{tmpdir}/out"

    def transform(df, batch_id):
        return df.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", F.lit(batch_id).alias("etl_batch")
        )

    def sink(df, batch_id):
        df.write.mode("append").parquet(out_path)

    q = foreach_batch_etl(stream, transform, sink, checkpoint=f"{tmpdir}/ckpt2")
    q.awaitTermination(120)
    got = spark.read.parquet(out_path)
    from mo_etl_spark.tables import load_table

    want = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    assert got.count() == want.count()
    assert set(got.columns) == {"event_id", "user_id", "etl_batch"}


def test_stateful_dedup_stream(spark, sf_dir, tmpdir):
    from mo_etl_spark.streaming import file_stream_source, stateful_dedup
    from mo_etl_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    # redeliver 20% of events (at-least-once queue shape)
    feed = events.unionByName(events.where(F.col("event_id") % 5 == 0))
    path = f"{tmpdir}/dupfeed"
    feed.write.mode("overwrite").parquet(path)
    stream = file_stream_source(spark, path, events.schema)
    deduped = stateful_dedup(stream, ["event_id"], watermark=("ts", "1 hour"))
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_smoke")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ckpt3")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("select count(*) n from dedup_smoke").collect()[0]["n"]
    assert n == events.count()


def test_incremental_feed_exactly_once(spark, sf_dir, tmpdir):
    """Two availableNow runs over ONE checkpoint: run 2 must process
    ONLY the files dropped after run 1 (incremental source discovery),
    and the union of both runs equals the full feed exactly once —
    the reference's queue-of-blocks consumption contract (u,
    ActiveData-ETL: each S3 block processed once, resume from cursor)."""
    from mo_etl_spark.streaming import file_stream_source, foreach_batch_etl
    from mo_etl_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    feed = f"{tmpdir}/incfeed"
    out = f"{tmpdir}/incout"
    ckpt = f"{tmpdir}/incckpt"
    first = events.where(F.col("event_id") % 2 == 0)
    second = events.where(F.col("event_id") % 2 == 1)
    first.write.mode("overwrite").parquet(feed)
    # drop the commit marker so the later append looks like new blocks
    # arriving in the same live directory
    os.remove(f"{feed}/_SUCCESS")

    def transform(df, batch_id):
        return df.select("event_id", F.lit(batch_id).alias("run_batch"))

    def sink(df, batch_id):
        df.write.mode("append").parquet(out)

    q1 = foreach_batch_etl(
        file_stream_source(spark, feed, events.schema), transform, sink, checkpoint=ckpt
    )
    q1.awaitTermination(120)
    n_after_run1 = spark.read.parquet(out).count()
    assert n_after_run1 == first.count()
    max_batch_run1 = spark.read.parquet(out).agg(F.max("run_batch")).collect()[0][0]

    second.write.mode("append").parquet(feed)
    q2 = foreach_batch_etl(
        file_stream_source(spark, feed, events.schema), transform, sink, checkpoint=ckpt
    )
    q2.awaitTermination(120)

    got = spark.read.parquet(out)
    # exactly-once: every event id exactly once across both runs
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()
    # run 2 really was incremental: its rows are only the new files'
    run2 = got.where(F.col("run_batch") > max_batch_run1)
    assert run2.count() == second.count()


def test_tws_user_stats_requires_protobuf_or_runs(spark):
    """transformWithStateInPandas needs python protobuf in the worker;
    absent here, the query is deliberately unregistered (capability
    gated, not silently broken).  When the dependency exists, the full
    backfill must match the batch aggregate."""
    import pytest

    from mo_etl_spark.registry import all_queries
    from mo_etl_spark.suites.streaming_real import _has_protobuf

    registered = "stream_real_tws_user_stats" in all_queries()
    assert registered == _has_protobuf()
    if not _has_protobuf():
        pytest.skip("python protobuf absent: transformWithState driver "
                    "worker cannot start in this container")
    from mo_etl_spark.suites.streaming_real import _tws_user_stats_impl
    from mo_etl_spark.tables import load_table
    from pyspark.sql import functions as F

    got = {r["user_id"]: r["n_events"]
           for r in _tws_user_stats_impl(spark, "/root/testdata/sf0.001").collect()}
    want = {r["user_id"]: r["n"]
            for r in load_table(spark, "/root/testdata/sf0.001", "events")
            .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want


def test_update_mode_emits_multiple_batches(spark, sf_dir):
    """The 4-file feed under maxFilesPerTrigger=1 must produce a
    GENUINE multi-batch run: some key is versioned across >= 2
    batch_ids, per-key n is non-decreasing in batch order, and the
    latest version equals the whole-feed truth."""
    import glob

    from pyspark.sql import functions as F

    from mo_etl_spark.suites.streaming_real import (
        _feed_multi,
        stream_real_update_mode_upsert,
    )

    final = {
        r["event_type"]: r["n"]
        for r in stream_real_update_mode_upsert(spark, sf_dir).collect()
    }
    out_dirs = glob.glob("/root/repo/.cache/stream_scratch/upd_out-*")
    versions = spark.read.parquet(out_dirs[0])
    per_key = (
        versions.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_versions"), F.max("batch_id").alias("mx"))
        .collect()
    )
    assert max(r["n_versions"] for r in per_key) >= 2
    hist = sorted(
        ((r["event_type"], r["batch_id"], r["n"]) for r in versions.collect()),
    )
    last: dict[str, int] = {}
    for k, _, n in hist:
        assert n >= last.get(k, 0)
        last[k] = n
    assert last == final
    assert len(glob.glob(_feed_multi(spark, sf_dir) + "/*.parquet")) == 4
