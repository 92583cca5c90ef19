"""M8 streaming contract queries — batch-equivalent forms with DuckDB
oracles (SURVEY.md §2.9).  The same functions run on readStream inputs
(tests/test_streaming.py proves it); the driver-checkable batch form
keeps them in the hash-matched set.

Window boundaries are epoch-aligned so Spark's F.window grid and
DuckDB's time_bucket agree; all emitted times are integer epoch-ms
(events.ts is ns in parquet, µs in Spark — ms truncation is identical
from both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mo_etl_spark.functions.numeric import cents
from mo_etl_spark.registry import query
from mo_etl_spark.session import prepare
from mo_etl_spark.streaming import session_agg, sliding_agg, stateful_dedup, tumbling_agg
from mo_etl_spark.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    return load_table(spark, sf_dir, "events")


def _win_start_ms(win_col: str = "win") -> F.Column:
    return (F.unix_micros(F.col(f"{win_col}.start")) / 1000).cast("long")


@query(
    "stream_tumbling_hourly",
    oracle="""
    SELECT epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)) AS win_start_ms,
           event_type,
           count(*) AS n,
           sum(CAST(round(value*100) AS BIGINT)) AS total_cents
    FROM events
    GROUP BY 1, 2
    """,
    tags=("tumbling_window",),
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling windows per event type (streaming twin:
    readStream + withWatermark + identical groupBy)."""
    out = tumbling_agg(
        _events(spark, sf_dir),
        "ts",
        "1 hour",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n"),
            F.sum(cents("value")).alias("total_cents"),
        ],
    )
    return out.select(
        _win_start_ms().alias("win_start_ms"), "event_type", "n", "total_cents"
    )


@query(
    "stream_sliding_1h_15m",
    oracle="""
    WITH grid AS (
      SELECT unnest(generate_series(TIMESTAMP '2023-12-31 23:15:00',
                                    TIMESTAMP '2024-01-31 00:00:00',
                                    INTERVAL 15 MINUTE)) AS win_start
    )
    SELECT epoch_ms(g.win_start) AS win_start_ms,
           count(e.event_id) AS n
    FROM grid g JOIN events e
      ON e.ts >= g.win_start AND e.ts < g.win_start + INTERVAL 1 HOUR
    GROUP BY 1
    """,
    tags=("sliding_window",),
)
def stream_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes (each event in 4
    windows).  Oracle generates the same epoch-aligned grid; empty
    windows are absent on both sides (inner join)."""
    out = sliding_agg(
        _events(spark, sf_dir),
        "ts",
        "1 hour",
        "15 minutes",
        [],
        [F.count(F.lit(1)).alias("n")],
    )
    return out.select(_win_start_ms().alias("win_start_ms"), "n")


@query(
    "stream_session_30m",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                      OVER (PARTITION BY user_id ORDER BY ts) > 1800000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      FROM flagged
    )
    SELECT user_id, epoch_ms(min(ts)) AS session_start_ms, count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_idx
    """,
    tags=("session_window",),
)
def stream_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap via F.session_window — the
    streaming-native sessionizer; the oracle reproduces it with the
    lag+cumsum construction (identical semantics for batch data)."""
    out = session_agg(
        _events(spark, sf_dir),
        "ts",
        "30 minutes",
        ["user_id"],
        [F.min("ts").alias("first_ts"), F.count(F.lit(1)).alias("n_events")],
    )
    return out.select(
        "user_id",
        (F.unix_micros("first_ts") / 1000).cast("long").alias("session_start_ms"),
        "n_events",
    )


@query(
    "stream_stateful_dedup",
    oracle="""
    WITH doubled AS (
      SELECT event_id, event_type FROM events
      UNION ALL
      SELECT event_id, event_type FROM events WHERE event_id % 5 = 0
    )
    SELECT count(*) AS n_with_dups,
           count(DISTINCT event_id) AS n_deduped
    FROM doubled
    """,
    tags=("stateful_dedup",),
)
def stream_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once by event_id: a fifth of events re-delivered (the
    at-least-once queue shape (u, ActiveData pulse)), then
    dropDuplicates.  Streaming twin adds a watermark to bound state."""
    events = _events(spark, sf_dir).select("event_id", "event_type", "ts")
    doubled = events.unionByName(events.where(F.col("event_id") % 5 == 0))
    deduped = stateful_dedup(doubled, ["event_id"])
    return doubled.agg(F.count(F.lit(1)).alias("n_with_dups")).crossJoin(
        deduped.agg(F.count(F.lit(1)).alias("n_deduped"))
    )


@query(
    "stream_session_dynamic_gap",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, ts,
               ts + CASE WHEN event_type = 'error' THEN INTERVAL 10 MINUTE
                         ELSE INTERVAL 30 MINUTE END AS reach
        FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, ts, reach,
               CASE WHEN max(reach) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) > ts
                    THEN 0 ELSE 1 END AS new_s
        FROM e
    ),
    sess AS (
        SELECT user_id, ts, reach,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           epoch_ms(min(ts)) AS start_ms,
           epoch_ms(max(reach)) AS end_ms,
           count(*) AS n
    FROM sess
    GROUP BY user_id, sid
    """,
    tags=("session_window", "dynamic_gap", "sessionize"),
)
def stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a PER-EVENT dynamic gap (Spark 3.2+
    session_window gap expressions): error events hold the session
    open only 10 minutes, everything else 30 — the
    urgency-differentiated timeout no fixed-gap sessionizer can
    express.  Merge semantics: an event joins the session while its
    ts is inside the running max of (ts + its gap), else a session
    closes at that max reach — exactly what the oracle replays with
    an exclusive-preceding running-max window.  Same operator works
    unmodified under readStream with a watermark (the session state
    is event-time-bounded)."""
    prepare(spark)
    e = load_table(spark, sf_dir, "events")
    gap = (
        F.when(F.col("event_type") == "error", F.lit("10 minutes"))
        .otherwise(F.lit("30 minutes"))
    )
    out = e.groupBy(
        F.session_window("ts", gap).alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    return out.select(
        "user_id",
        F.expr("unix_micros(w.start) div 1000").alias("start_ms"),
        F.expr("unix_micros(w.end) div 1000").alias("end_ms"),
        "n",
    )
