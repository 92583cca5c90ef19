"""Streaming operators (SURVEY.md §2.9).

Reference streaming is pipeline-level (u — ActiveData-ETL consumes
queues with mo-threads Thread/Queue/Signal and processes S3 blocks
incrementally; mo-streams gives pull pipelines).  Here the same
capabilities map to Structured Streaming: sources -> transformations
-> sinks with checkpointing; watermarks + event-time windows are
engine additions using Spark-native concepts.

Every windowing function below is BATCH-FIRST: it takes any DataFrame
(static or streaming) and returns the transformed DataFrame, so the
identical code path serves the DuckDB-oracle-checked batch queries and
the readStream smoke tests.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def batch_subdir(root: str, batch_id: int) -> str:
    """The per-micro-batch output directory ``root/b<batch_id>``."""
    return os.path.join(root, f"b{batch_id}")


def idempotent_batch_write(batch_df: DataFrame, root: str, batch_id: int) -> None:
    """REPLAY-IDEMPOTENT foreachBatch write (VERDICT r4 item #1).

    foreachBatch is at-least-once under failure: a micro-batch that
    crashes after a partial sink write is replayed from the checkpoint
    on restart, and a plain ``mode("append")`` sink would then
    double-append its rows.  Keying every write by batch_id — each
    batch OVERWRITES its own ``root/b<batch_id>`` subdirectory —
    makes replay a no-op: the rewrite replaces any partial files from
    the crashed attempt with the identical complete output (the batch
    content is deterministic given the checkpointed source offsets).
    Readers take the union of subdirectories (``read_batched``)."""
    batch_df.write.mode("overwrite").parquet(batch_subdir(root, batch_id))


def idempotent_batch_write_to(root: str) -> Callable[[DataFrame, int], None]:
    """Curried ``idempotent_batch_write`` — the sink callable shape
    ``foreach_batch_etl``/``foreachBatch`` consume."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        idempotent_batch_write(batch_df, root, batch_id)

    return sink


def read_batched(
    spark: SparkSession, root: str, exclude_batch: int | None = None
) -> DataFrame:
    """Union of every per-batch subdirectory under ``root`` (plus the
    ``base`` seed/snapshot dir).  ``exclude_batch`` omits that batch's
    own subdirectory — load-bearing for stateful sinks: when batch N
    REPLAYS after a mid-batch crash, its state reads (index so far,
    arrived docs so far) must not see the crashed attempt's partial
    (or even complete) ``bN`` output, or the replayed computation
    diverges from the original (e.g. the batch's own docs would appear
    twice in the corpus union)."""
    recover_compaction(root)
    skip = None if exclude_batch is None else f"b{exclude_batch}"
    paths = [
        os.path.join(root, d)
        for d in sorted(os.listdir(root))
        if os.path.isdir(os.path.join(root, d))
        and d != skip
        and not d.startswith(".")  # in-flight compaction build
    ]
    # recursive: a compacted ``base`` holds one subdir per binpack
    # group (compact_batched); flat per-batch dirs are unaffected
    return spark.read.option("recursiveFileLookup", "true").parquet(*paths)


#: compaction journal filenames (crash-safe swap, see compact_batched)
_COMPACT_NEW = ".compact_new"
_COMPACT_COMMIT = ".compact_commit"


def recover_compaction(root: str, reclaim_stale: bool = False) -> None:
    """Complete or discard an interrupted compact_batched swap.

    The swap is journaled so every crash window is recoverable:
    - ``.compact_commit`` present: the commit point was reached (the
      rewrite is complete and durable); finish it — delete the listed
      old subdirs that remain, promote ``.compact_new`` to its target,
      drop the marker.  Idempotent: safe to re-run at any point, BY
      ANYONE (readers included — rolling forward a committed swap is
      always correct).
    - ``.compact_new`` WITHOUT ``.compact_commit``: either a crashed
      mid-build OR a compaction currently running in another process —
      the two are indistinguishable from the filesystem, so only the
      COMPACTOR reclaims it (``reclaim_stale=True``, about to rebuild
      anyway); readers leave it alone and simply don't see it (dot-dir
      skip), never deleting a live build out from under its writer.
    """
    import shutil

    if not os.path.isdir(root):
        return
    new_dir = os.path.join(root, _COMPACT_NEW)
    marker = os.path.join(root, _COMPACT_COMMIT)
    if os.path.exists(marker):
        with open(marker) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        # first line: target=<generation-suffixed promote name>; the
        # target NEVER collides with a victim, so recovery after the
        # rename cannot mistake the promoted build for an old dir
        target = lines[0].split("=", 1)[1]
        for d in lines[1:]:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
        if os.path.isdir(new_dir):
            os.rename(new_dir, os.path.join(root, target))
        os.remove(marker)
    elif reclaim_stale and os.path.isdir(new_dir):
        shutil.rmtree(new_dir, ignore_errors=True)


def compact_batched(
    spark: SparkSession,
    root: str,
    target_bytes: int = 128 << 20,
    min_dirs: int = 8,
) -> int:
    """Index maintenance for streaming upserts (VERDICT r4 item #4):
    fold a ``read_batched`` table's accumulated per-batch
    subdirectories back into one consolidated ``base``.

    A band-index/arrived-docs sink gains one file set per trigger; at
    daily-crawl cadence that is unbounded small files — each probe
    pays the per-file open cost forever.  This helper plans compaction
    with the SAME exclusive-running-sum binpack rule as the batch
    planner (suites/analytics.etl_compaction_binpack: group =
    cumulative-size-before div target, over the file listing ordered
    by path), rewrites each group as ONE file, and atomically swaps
    the result in as the new ``base``.  Probe results are unchanged —
    the table's rows are identical, only the layout compacts (pinned
    by test: same band-probe output and hash before/after).

    Returns the number of output files (0 = below ``min_dirs``,
    nothing done).  Run it BETWEEN committed triggers (or with the
    stream stopped): batch-id bookkeeping is unaffected — future
    batches keep appending ``b<id>`` subdirs beside the new base — but
    compacting an uncommitted batch's output would defeat the
    replay-idempotence exclusion for that batch.  At scale the group
    rewrites are independent jobs (parallel per group); here they run
    sequentially.

    CRASH SAFETY: the swap is journaled.  The rewrite lands in a
    dot-prefixed build dir readers skip; a ``.compact_commit`` marker
    (listing the dirs to delete) is the commit point; only then are
    old subdirs removed and the build promoted to ``base``.  A crash
    in ANY window is repaired by recover_compaction (called by every
    read_batched): before the marker the old table is untouched and
    the partial build is discarded; after it, the completed build is
    promoted and the leftover victims deleted.  Unit-proven per
    window in tests/test_streaming.py."""
    import shutil

    recover_compaction(root, reclaim_stale=True)
    subs = sorted(
        d
        for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)) and not d.startswith(".")
    )
    if len(subs) < min_dirs:
        return 0
    # the file listing the binpack plans over (path-ordered, like the
    # batch planner's file_id order)
    files: list[tuple[str, int]] = []
    for d in subs:
        for dirpath, _, names in os.walk(os.path.join(root, d)):
            for n in sorted(names):
                if n.endswith(".parquet"):
                    p = os.path.join(dirpath, n)
                    files.append((p, os.path.getsize(p)))
    files.sort()
    groups: dict[int, list[str]] = {}
    cum_before = 0
    for p, sz in files:
        groups.setdefault(cum_before // target_bytes, []).append(p)
        cum_before += sz
    tmp = os.path.join(root, _COMPACT_NEW)
    shutil.rmtree(tmp, ignore_errors=True)
    for g, paths in groups.items():
        spark.read.parquet(*paths).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, f"g{g}")
        )
    # COMMIT POINT: the marker records the promote target (a fresh
    # generation-suffixed name, never equal to a victim) plus exactly
    # the dirs the new base replaces; from here recovery always rolls
    # FORWARD (recover_compaction is idempotent at every subsequent
    # crash point)
    gens = [
        int(d[4:] or 0)
        for d in subs
        if d.startswith("base") and (d == "base" or d[4:].isdigit())
    ]
    target = f"base{max(gens, default=0) + 1}"
    marker = os.path.join(root, _COMPACT_COMMIT)
    with open(marker + ".tmp", "w") as f:
        f.write("\n".join([f"target={target}", *subs]))
    os.rename(marker + ".tmp", marker)
    for d in subs:
        shutil.rmtree(os.path.join(root, d))
    os.rename(tmp, os.path.join(root, target))
    os.remove(marker)
    return len(groups)


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Non-overlapping event-time windows (epoch-aligned grid)."""
    return df.groupBy(F.window(ts_col, width).alias("win"), *keys).agg(*aggs)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Overlapping windows: each event lands in width/slide windows."""
    return df.groupBy(F.window(ts_col, width, slide).alias("win"), *keys).agg(*aggs)


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Gap-based session windows (merges events closer than ``gap``).
    Batch twin of the window-function sessionize (suites/windows.py)."""
    return df.groupBy(F.session_window(ts_col, gap).alias("win"), *keys).agg(*aggs)


def stateful_dedup(
    df: DataFrame, keys: Sequence[str], watermark: tuple[str, str] | None = None
) -> DataFrame:
    """Exactly-once by key: batch dropDuplicates; with ``watermark=
    (ts_col, delay)`` on a stream, state is bounded by the watermark
    (late duplicates beyond it age out — the 100 TB/unbounded path)."""
    if watermark is not None:
        df = df.withWatermark(*watermark)
    return df.dropDuplicates(list(keys))


def file_stream_source(
    spark: SparkSession, path: str, schema, fmt: str = "parquet"
) -> DataFrame:
    """Incremental file-drop source — the Spark-native analog of the
    reference's S3-block queue consumption (u, ActiveData-ETL
    s3_bucket + pulse: workers pick up new blocks as they appear)."""
    return spark.readStream.schema(schema).format(fmt).load(path)


def foreach_batch_etl(
    stream_df: DataFrame,
    transform: Callable[[DataFrame, int], DataFrame],
    sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Per-microbatch transform+sink — the ActiveData block-ETL shape
    (u: transform(source_key, source, dest) per S3 block) with
    exactly-once bookkeeping via the checkpoint dir."""

    def run(batch_df: DataFrame, batch_id: int) -> None:
        sink(transform(batch_df, batch_id), batch_id)

    writer = stream_df.writeStream.foreachBatch(run).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_count(
    stream_df: DataFrame,
    key_col: str,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): a per-key
    running event counter held in the state store — the
    arbitrary-stateful shape for operators the built-in windows can't
    express.  Each micro-batch updates the count and emits the key's
    new total; state survives across batches via the checkpoint."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    def update(key, pdfs, state: GroupState):
        n = sum(len(pdf) for pdf in pdfs)
        (total,) = state.get if state.exists else (0,)
        total += n
        state.update((total,))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [total]})

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} long, n_events long",
        stateStructType="n_events long",
        outputMode="update",
        timeoutConf=timeout,
    )


def tws_user_stats(stream_df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Next-generation arbitrary state (Spark 4 transformWithState):
    per-key running count/sum/max held in typed ValueState on the
    RocksDB state store.  Vs applyInPandasWithState above: named state
    variables (value/list/map), timers, TTL, and state-schema evolution
    — the API a long-lived 100 TB streaming deployment should target.
    Requires spark.sql.streaming.stateStore.providerClass =
    RocksDBStateStoreProvider (set by the caller before .start())."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", "n_events BIGINT, total_cents BIGINT, max_cents BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            prev = self._state.get() if self._state.exists() else None
            n, tot, mx = prev if prev is not None else (0, 0, None)
            for pdf in rows:
                if not len(pdf):
                    continue
                n += len(pdf)
                tot += int(pdf["value_cents"].sum())
                m = int(pdf["value_cents"].max())
                mx = m if mx is None else max(mx, m)
            self._state.update((n, tot, mx))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n_events": [n],
                    "total_cents": [tot],
                    "max_cents": [mx],
                }
            )

        def close(self) -> None:
            pass

    return stream_df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=UserStats(),
        outputStructType=(
            f"{key_col} long, n_events long, total_cents long, max_cents long"
        ),
        outputMode="Update",
        timeMode="None",
    )
