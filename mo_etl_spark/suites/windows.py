"""M4 window functions (SURVEY.md §2.5): the jx window clause surface
(u, jx_python/windows.py — name/value/edges/sort/aggregate/range) as
Spark Window specs, plus gap-based sessionization (engine addition).

All time arithmetic uses integer epoch-millis on both engines so the
events.ts µs-vs-ns difference cannot skew results; money uses integer
cents (functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mo_etl_spark.functions.numeric import cents
from mo_etl_spark.registry import query
from mo_etl_spark.session import prepare
from mo_etl_spark.tables import load_table

def _EMS():
    """Integer epoch milliseconds of events.ts (µs timestamp -> exact).
    A function, not a module constant: Column construction needs an
    active session, and executors re-import this package when
    deserializing pandas UDFs from sibling modules."""
    return (F.unix_micros(F.col("ts")) / F.lit(1000)).cast("long")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    return load_table(spark, sf_dir, "events")


@query(
    "win_running_total_per_user",
    oracle="""
    SELECT event_id, user_id,
           sum(CAST(round(value*100) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cents
    FROM events
    """,
    tags=("window_agg", "cumulative"),
)
def win_running_total_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx cumulative window: range {min: null, max: 0} (u)."""
    events = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id", "user_id", F.sum(cents("value")).over(w).alias("running_cents")
    )


@query(
    "win_moving_window_per_user",
    oracle="""
    SELECT event_id, user_id,
           sum(CAST(round(value*100) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS moving_cents,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS moving_n
    FROM events
    """,
    tags=("moving", "window_agg"),
)
def win_moving_window_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx moving window: range {min: -6, max: 0} (u)."""
    events = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.sum(cents("value")).over(w).alias("moving_cents"),
        F.count(F.lit(1)).over(w).alias("moving_n"),
    )


@query(
    "win_lead_lag_gaps",
    oracle="""
    SELECT event_id, user_id,
           lag(event_type)  OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS gap_ms
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window_lead_lag",),
)
def win_lead_lag_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx rows[offset] / lead-lag (u); gap as integer ms."""
    events = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ems = _EMS()
    return events.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (ems - F.lag(ems).over(w)).alias("gap_ms"),
    )


@query(
    "win_rank_suite",
    oracle="""
    SELECT event_id, event_type,
           rank()         OVER (PARTITION BY event_type ORDER BY CAST(round(value*100) AS BIGINT) DESC) AS rnk,
           dense_rank()   OVER (PARTITION BY event_type ORDER BY CAST(round(value*100) AS BIGINT) DESC) AS drnk,
           round(percent_rank() OVER (PARTITION BY event_type ORDER BY CAST(round(value*100) AS BIGINT) DESC), 6) AS prnk,
           ntile(4)       OVER (PARTITION BY event_type ORDER BY CAST(round(value*100) AS BIGINT) DESC, event_id) AS quartile
    FROM events
    """,
    tags=("window_rank", "window_percentile"),
)
def win_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/percent_rank/ntile — jx window rank shapes (u).
    rank() ties on equal cents are identical in both engines; ntile
    needs the event_id tiebreak for a total order."""
    events = _events(spark, sf_dir)
    c = cents("value")
    w = Window.partitionBy("event_type").orderBy(c.desc())
    wt = Window.partitionBy("event_type").orderBy(c.desc(), "event_id")
    return events.select(
        "event_id",
        "event_type",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.ntile(4).over(wt).alias("quartile"),
    )


@query(
    "win_first_last_frame",
    oracle="""
    SELECT event_id, user_id,
           first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_event,
           last_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
    FROM events
    """,
    tags=("window_first_last",),
)
def win_first_last_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return events.select(
        "event_id",
        "user_id",
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w).alias("last_event"),
    )


@query(
    "win_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT event_id, user_id, ts,
               CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    )
    SELECT event_id, user_id,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
    FROM flagged
    """,
    tags=("sessionize",),
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (engine addition, SURVEY.md §2.5): a
    30-minute silence starts a new session.  lag + cumulative sum —
    one shuffle on user_id, linear per-partition scan; the batch twin
    of F.session_window (streaming suite)."""
    events = _events(spark, sf_dir)
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ems = _EMS()
    gap = ems - F.lag(ems).over(order)
    new_session = F.when(gap > 30 * 60 * 1000, 1).otherwise(0)
    return (
        events.withColumn("__new", new_session)
        .select(
            "event_id",
            "user_id",
            F.sum("__new").over(cum).alias("session_idx"),
        )
    )


@query(
    "win_sessionize_skew",
    oracle="""
    WITH flagged AS (
        SELECT event_id, user_id, ts,
               CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    )
    SELECT event_id, user_id,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
    FROM flagged
    """,
    tags=("sessionize", "skew_salting", "two_phase"),
)
def win_sessionize_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe hot-key-routed sessionize (operators/timeseries.
    sessionize_skew): a cheap count routes keys above a row threshold
    through the two-phase split (local window per (key, hour bucket) +
    boundary stitch on the tiny per-bucket summary) while cold keys
    keep the plain single-window form.  SAME oracle as win_sessionize
    — the contract asserts the two plans are observationally
    identical; the low threshold here forces BOTH legs to execute.
    Stress-staged at 20M rows with a 2M-row hot user
    (tools/stress.py)."""
    from mo_etl_spark.operators.timeseries import sessionize_skew

    events = _events(spark, sf_dir)
    # hot_frac=0 so the row-count threshold alone routes: at sf0.01 no
    # user owns >25% of events, and the contract must execute BOTH legs
    return sessionize_skew(events, hot_threshold=60, hot_frac=0.0)


@query(
    "win_percentile_values",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           median(l_quantity)
             OVER (PARTITION BY l_returnflag, l_linestatus) AS med_qty,
           quantile_cont(l_quantity, 0.25)
             OVER (PARTITION BY l_returnflag, l_linestatus) AS p25_qty,
           quantile_cont(l_quantity, 0.75)
             OVER (PARTITION BY l_returnflag, l_linestatus) AS p75_qty,
           l_quantity > median(l_quantity)
             OVER (PARTITION BY l_returnflag, l_linestatus) AS above_med
    FROM lineitem
    """,
    tags=("window_percentile", "window_agg"),
)
def win_percentile_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx window percentile (u, jx_python/windows.py percentile
    aggregate): exact interpolated median/quartiles OVER a partition,
    plus each row's position relative to its group median.  l_quantity
    is integral, so the interpolated quantiles are exact doubles on
    both engines.

    Plan note: an unordered whole-partition window would drag every
    fact row into a handful of giant window partitions (the classic
    100 TB failure).  A partition-wide aggregate is re-broadcastable,
    so the engine computes the 6-row percentile table with one hash
    aggregate and broadcast-joins it back — identical output, one fact
    pass, no mega-partition sort (2.5x faster at sf0.1 too)."""
    prepare(spark)
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.median("l_quantity").alias("med_qty"),
        F.expr("percentile(l_quantity, 0.25)").alias("p25_qty"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75_qty"),
    )
    return li.join(
        F.broadcast(stats), ["l_returnflag", "l_linestatus"]
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "med_qty",
        "p25_qty",
        "p75_qty",
        (F.col("l_quantity") > F.col("med_qty")).alias("above_med"),
    )


@query(
    "win_range_trailing_hour",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS n_last_hour,
           sum(CAST(round(value*100) AS BIGINT)) OVER w AS cents_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
                 RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
    """,
    tags=("window_agg", "range_frame", "moving"),
)
def win_range_trailing_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-range window frame (jx window ``range`` over a sort VALUE
    rather than row offsets): per user, events and cents in the
    trailing hour.  rangeBetween on integer epoch-millis — unlike a
    rows frame the width adapts to event density, the realistic form
    for rate limits / rolling spend.  Ties in the order value share a
    frame, so no tiebreaker is needed for determinism."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(_EMS().alias("ems"))
        .rangeBetween(-3_600_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(cents("value")).over(w).alias("cents_last_hour"),
    )


@query(
    "ts_resample_ffill_hourly",
    oracle="""
    WITH obs AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket,
             count(*) AS n_events,
             arg_max(CAST(round(value*100) AS BIGINT),
                     epoch_ms(ts) * 1000000 + event_id % 1000000) AS last_v
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY 1),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM span
    )
    SELECT g.user_id, epoch_ms(g.bucket) AS bucket_ms,
           coalesce(o.n_events, 0) AS n_events,
           last_value(o.last_v IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
    FROM grid g LEFT JOIN obs o USING (user_id, bucket)
    """,
    tags=("resample", "gap_fill", "window_first_last", "time_domain"),
)
def ts_resample_ffill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization (operators/timeseries.resample_ffill):
    per user, a DENSE hourly grid over that user's own event span,
    carrying the last observed cents value across gap hours (count 0)
    — the metrics-backfill / state-as-of-H shape.  Grid fan-out is a
    narrow sequence+explode per key (no global span, no driver loop);
    the deterministic last-in-bucket uses an epoch-ms+event-id total
    order that the oracle reproduces with arg_max."""
    from mo_etl_spark.operators.timeseries import resample_ffill

    ev = _events(spark, sf_dir)
    tiebreak = (_EMS() * F.lit(1_000_000) + F.col("event_id") % F.lit(1_000_000)).alias("tb")
    out = resample_ffill(
        ev, "user_id", "ts", cents("value"), tiebreak, step="1 hour"
    )
    return out.select(
        "user_id",
        (F.unix_micros(F.col("bucket")) / 1000).cast("long").alias("bucket_ms"),
        "n_events",
        F.col("filled_v").alias("filled_cents"),
    )


@query(
    "ts_resample_linterp_hourly",
    oracle="""
    WITH obs AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket,
             count(*) AS n_events,
             arg_max(CAST(round(value*100) AS BIGINT),
                     epoch_ms(ts) * 1000000 + event_id % 1000000) AS last_v
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY 1),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM span
    ),
    j AS (
      SELECT g.user_id, g.bucket, o.n_events, o.last_v,
             epoch_ms(g.bucket) AS t,
             CASE WHEN o.last_v IS NOT NULL THEN epoch_ms(g.bucket) END AS ot
      FROM grid g LEFT JOIN obs o USING (user_id, bucket)
    ),
    w AS (
      SELECT user_id, bucket, t, coalesce(n_events, 0) AS n_events,
             CAST(last_value(last_v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS pv,
             CAST(last_value(ot IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS pt,
             CAST(first_value(last_v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE) AS nv,
             CAST(first_value(ot IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE) AS nt
      FROM j
    )
    SELECT user_id, epoch_ms(bucket) AS bucket_ms, n_events,
           round(CASE WHEN nv IS NULL THEN pv
                      WHEN nt = pt THEN pv
                      ELSE pv + (nv - pv) * (CAST(t AS DOUBLE) - pt) / (nt - pt)
                 END, 6) AS interp_cents
    FROM w
    """,
    tags=("resample", "gap_fill", "interpolation", "time_domain"),
)
def ts_resample_linterp_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR-interpolation resample (operators/timeseries.
    resample_linterp) — the continuous-signal sibling of
    ts_resample_ffill_hourly: gap hours take the straight line between
    the surrounding observations instead of a step.  All interpolation
    operands derive from integers (cents, epoch ms) and both engines
    evaluate the identical double expression in the same order, so the
    result is bit-identical and rounds safely."""
    from mo_etl_spark.operators.timeseries import resample_linterp

    ev = _events(spark, sf_dir)
    tiebreak = (_EMS() * F.lit(1_000_000) + F.col("event_id") % F.lit(1_000_000)).alias("tb")
    out = resample_linterp(ev, "user_id", "ts", cents("value"), tiebreak, step="1 hour")
    return out.select(
        "user_id",
        (F.unix_micros(F.col("bucket")) / 1000).cast("long").alias("bucket_ms"),
        "n_events",
        F.col("interp_v").alias("interp_cents"),
    )


@query(
    "win_value_functions",
    oracle="""
    SELECT event_id, user_id,
           nth_value(CAST(round(value*100) AS BIGINT), 2)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS second_cents,
           round(cume_dist() OVER (PARTITION BY user_id
                                   ORDER BY CAST(round(value*100) AS BIGINT), event_id), 6) AS cume,
           last_value(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value*100) AS BIGINT) END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_cents
    FROM events
    """,
    tags=("window_first_last", "window_percentile", "nth_value", "ignore_nulls"),
)
def win_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining window VALUE functions: nth_value (2nd value in
    the running frame — NULL until the partition's second row),
    cume_dist, and the carry-forward idiom last_value(... IGNORE
    NULLS) over a sparse column (each event sees the user's most
    recent purchase amount — the jx 'latest observation' shape that
    resample_ffill generalizes).  All per-user one-shuffle windows;
    total orders via event_id everywhere a frame edge could tie."""
    events = _events(spark, sf_dir)
    c = cents("value")
    w_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_val = Window.partitionBy("user_id").orderBy(c.asc(), F.col("event_id").asc())
    sparse = F.when(F.col("event_type") == "purchase", c)
    return events.select(
        "event_id",
        "user_id",
        F.nth_value(c, 2).over(w_ts).alias("second_cents"),
        F.round(F.cume_dist().over(w_val), 6).alias("cume"),
        F.last(sparse, ignorenulls=True)
        .over(w_ts.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("last_purchase_cents"),
    )


@query(
    "win_streaks_gaps_islands",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
        WHERE event_type = 'purchase' AND event_id % 5 = 0
    ),
    isl AS (
        SELECT user_id, day,
               date_diff('day', DATE '1970-01-01', day)
                 - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
        FROM act
    ),
    streaks AS (
        SELECT user_id, island, count(*) AS len,
               min(day) AS streak_start
        FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           count(*) AS n_streaks,
           sum(len) AS n_active_days,
           max(len) AS longest_streak,
           min(streak_start) AS first_day
    FROM streaks
    GROUP BY user_id
    """,
    tags=("gaps_islands", "streaks", "window_rank", "sessionize", "time_domain"),
)
def win_streaks_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-DAY activity streaks per user
    (the engagement metric sessionize can't express — sessionize
    bounds gaps between event timestamps, this detects runs on the
    calendar-day grid).  The classic trick: within a user, day_number
    − row_number is CONSTANT across a consecutive run, so one window
    plus two aggregates finds every island with no self-join and no
    iteration.  Sparse activity (every 5th purchase event) makes
    streaks non-trivial.  Two key shuffles (distinct days, window);
    both partition by user_id — uniform at 100 TB."""
    e = _events(spark, sf_dir)
    act = (
        e.where((F.col("event_type") == "purchase") & (F.col("event_id") % 5 == 0))
        .select("user_id", F.date_trunc("day", "ts").cast("date").alias("day"))
        .distinct()
    )
    isl = act.select(
        "user_id",
        "day",
        (
            F.datediff("day", F.lit("1970-01-01").cast("date"))
            - F.row_number().over(Window.partitionBy("user_id").orderBy("day"))
        ).alias("island"),
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count("*").alias("len"), F.min("day").alias("streak_start")
    )
    # first_day surfaces as timestamp: pandas maps DuckDB DATE to
    # datetime64 but Spark DateType to datetime.date objects — the
    # driver's representation-exact hash would see those differ
    return streaks.groupBy("user_id").agg(
        F.count("*").alias("n_streaks"),
        F.sum("len").alias("n_active_days"),
        F.max("len").alias("longest_streak"),
        F.min("streak_start").cast("timestamp").alias("first_day"),
    )
