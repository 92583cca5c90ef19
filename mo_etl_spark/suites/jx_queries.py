"""Driver-contract queries expressed in the jx query language itself —
proving the jx dict -> DataFrame compiler (jx/expressions.py,
jx/query.py) end-to-end against the DuckDB oracle.

Each query here is the exact shape a reference user would send to
jx_python.jx.run / ActiveData (u); the oracle encodes the SAME jx
semantics in SQL (null-safe eq, decisive boolean, 0-based rownum...)
per SURVEY.md §7.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mo_etl_spark.jx import jx_run
from mo_etl_spark.registry import query
from mo_etl_spark.session import prepare
from mo_etl_spark.tables import load_table


def _tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    prepare(spark)
    return {n: load_table(spark, sf_dir, n) for n in names}


@query(
    "jx_filter_select",
    oracle="""
    SELECT event_id,
           upper(event_type) AS loud_type,
           CAST(round(value * 100) AS BIGINT) AS value_cents
    FROM events
    WHERE event_type IN ('click', 'purchase') AND value > 100.0
    """,
    tags=("jx", "filter", "select"),
)
def jx_filter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx projection+filter: where/in/gt + computed selects (u, jx_python jx.filter)."""
    return jx_run(
        {
            "from": "events",
            "where": {"and": [{"in": {"event_type": ["click", "purchase"]}}, {"gt": ["value", 100.0]}]},
            "select": [
                "event_id",
                {"name": "loud_type", "value": {"upper": "event_type"}},
                {
                    "name": "value_cents",
                    "value": {"integer": {"round": [{"mult": ["value", 100]}, 0]}},
                },
            ],
        },
        spark=spark,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "jx_groupby_aggs",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           count(DISTINCT user_id) AS users,
           sum(CAST(round(value * 100) AS BIGINT)) AS total_cents,
           min(value) AS min_value,
           max(value) AS max_value,
           median(value) AS med_value
    FROM events
    GROUP BY event_type
    """,
    tags=("jx", "groupby"),
)
def jx_groupby_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx groupby with count/cardinality/sum/min/max/median aggregates
    (u, jx_python jx.groupby + ActiveData aggs); sum lifted to exact
    integer cents for oracle stability."""
    return jx_run(
        {
            "from": "events",
            "groupby": ["event_type"],
            "select": [
                {"name": "n", "aggregate": "count"},
                {"name": "users", "value": "user_id", "aggregate": "cardinality"},
                {
                    "name": "total_cents",
                    "value": {"integer": {"round": [{"mult": ["value", 100]}, 0]}},
                    "aggregate": "sum",
                },
                {"name": "min_value", "value": "value", "aggregate": "minimum"},
                {"name": "max_value", "value": "value", "aggregate": "maximum"},
                {"name": "med_value", "value": "value", "aggregate": "median"},
            ],
        },
        spark=spark,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "jx_edges_day_cube",
    oracle="""
    WITH dom AS (
        SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                      TIMESTAMP '2024-02-01',
                                      INTERVAL 1 DAY)) AS day
    ), agg AS (
        SELECT date_trunc('day', ts) AS day, count(*) AS n,
               sum(CAST(round(value*100) AS BIGINT)) AS total_cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    )
    SELECT dom.day, coalesce(agg.n, 0) AS n, agg.total_cents
    FROM dom LEFT JOIN agg USING (day)
    WHERE dom.day < TIMESTAMP '2024-02-01'
    """,
    tags=("jx", "edges", "cube"),
)
def jx_edges_day_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx edges with a complete time domain — every day in January gets
    a row even with zero events (u, jx_base/domains.py time domain;
    SURVEY.md §2.4 edges).  Spark: groupBy + generated-domain left join."""
    return jx_run(
        {
            "from": "events",
            "where": {"eq": {"event_type": "purchase"}},
            "edges": [
                {
                    "name": "day",
                    "value": "ts",
                    "domain": {
                        "type": "time",
                        "min": "2024-01-01",
                        "max": "2024-02-01",
                        "interval": "day",
                    },
                }
            ],
            "select": [
                {"name": "n", "aggregate": "count"},
                {
                    "name": "total_cents",
                    "value": {"integer": {"round": [{"mult": ["value", 100]}, 0]}},
                    "aggregate": "sum",
                },
            ],
        },
        spark=spark,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "jx_window_rownum",
    oracle="""
    SELECT event_id, user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS seq
    FROM events
    """,
    tags=("jx", "window"),
)
def jx_window_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx window clause: 0-based per-user rownum ordered by time (u,
    jx_python/windows.py), tie-broken by event_id for determinism."""
    return jx_run(
        {
            "from": "events",
            "select": ["event_id", "user_id"],
            "window": [
                {
                    "name": "seq",
                    "aggregate": "rownum",
                    "edges": ["user_id"],
                    "sort": ["ts", "event_id"],
                }
            ],
        },
        spark=spark,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "jx_json_extract",
    oracle="""
    SELECT event_id, json_extract_string(props, '$.k') AS k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
    tags=("jx", "json"),
)
def jx_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a JSON-string column (u, mo_json;
    events.props is a JSON doc) — stays JVM-side via get_json_object."""
    return jx_run(
        {
            "from": "events",
            "where": {"exists": {"get_json": ["props", {"literal": "$.k"}]}},
            "select": [
                "event_id",
                {"name": "k", "value": {"get_json": ["props", {"literal": "$.k"}]}},
            ],
        },
        spark=spark,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "jx_deep_from_nested",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus, l.l_linenumber,
           CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_cents
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey <= 1000
    """,
    tags=("jx", "nested", "deep_from"),
)
def jx_deep_from_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-array round trip: build the jx 'snowflake' document shape
    (orders with an embedded lines array — how jx-sqlite/mo-dots store
    one-to-many (u)), then query it with a deep ``from`` path that
    unnests back to rows.  Spark: collect_list(struct) + explode_outer,
    all Catalyst-visible."""
    t = _tables(spark, sf_dir, "orders", "lineitem")
    orders = t["orders"].where(F.col("o_orderkey") <= 1000)
    nested = (
        orders.join(
            t["lineitem"].where(F.col("l_orderkey") <= 1000),
            orders.o_orderkey == F.col("l_orderkey"),
            "inner",
        )
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber"),
                    F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
                )
            ).alias("lines")
        )
    )
    return jx_run(
        {
            "from": "order_docs.lines",
            "select": ["o_orderkey", "o_orderstatus", "l_linenumber", "price_cents"],
        },
        spark=spark,
        tables={"order_docs": nested},
    )


@query(
    "jx_select_leaves",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus   AS "status.o_orderstatus",
           o_orderpriority AS "status.o_orderpriority",
           CAST(round(o_totalprice * 100) AS BIGINT) AS "money.price_cents"
    FROM orders WHERE o_orderkey <= 500
    """,
    tags=("jx", "select_leaves"),
)
def jx_select_leaves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``{"select": {"value": {"leaves": "."}}}`` — flatten every nested
    leaf to a dotted top-level name (u, mo_dots.leaves; SURVEY.md §2.2
    select_leaves).  Builds a nested order document first, then the jx
    leaves projection recovers the dotted flat view — a pure schema walk,
    no shuffle, no UDF."""
    t = _tables(spark, sf_dir, "orders")
    docs = t["orders"].where(F.col("o_orderkey") <= 500).select(
        "o_orderkey",
        F.struct("o_orderstatus", "o_orderpriority").alias("status"),
        F.struct(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents")
        ).alias("money"),
    )
    return jx_run(
        {"from": "order_docs", "select": {"value": {"leaves": "."}}},
        spark=spark,
        tables={"order_docs": docs},
    )


@query(
    "jx_edges_set_range_cube",
    oracle="""
    WITH dom AS (
        SELECT p.priority, CAST(i.i * 100000 AS DOUBLE) AS bucket
        FROM (SELECT unnest(['1-URGENT','2-HIGH','3-MEDIUM',
                             '4-NOT SPECIFIED','5-LOW']) AS priority) p
        CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS i) i
    ), agg AS (
        SELECT o_orderpriority AS priority,
               floor(o_totalprice / 100000) * 100000 AS bucket,
               count(*) AS n,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
        FROM orders
        WHERE o_totalprice >= 0 AND o_totalprice < 500000
        GROUP BY 1, 2
    )
    SELECT dom.priority, dom.bucket, coalesce(agg.n, 0) AS n, agg.total_cents
    FROM dom LEFT JOIN agg USING (priority, bucket)
    """,
    tags=("jx", "edges", "set_domain", "range_domain"),
)
def jx_edges_set_range_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-edge cube crossing a SET domain (explicit partitions) with a
    RANGE domain (numeric buckets) — the complete 5x5 domain product
    materializes even for empty parts (u, jx_base/domains.py set+range
    domains; SURVEY.md §2.4 edges).  Spark: one hash agg + a left join
    against the generated domain product (25 rows -> broadcast)."""
    return jx_run(
        {
            "from": "orders",
            "edges": [
                {
                    "name": "priority",
                    "value": "o_orderpriority",
                    "domain": {
                        "type": "set",
                        "partitions": [
                            "1-URGENT", "2-HIGH", "3-MEDIUM",
                            "4-NOT SPECIFIED", "5-LOW",
                        ],
                    },
                },
                {
                    "name": "bucket",
                    "value": "o_totalprice",
                    "domain": {"type": "range", "min": 0, "max": 500000, "interval": 100000},
                },
            ],
            "select": [
                {"name": "n", "aggregate": "count"},
                {
                    "name": "total_cents",
                    "value": {"integer": {"round": [{"mult": ["o_totalprice", 100]}, 0]}},
                    "aggregate": "sum",
                },
            ],
        },
        spark=spark,
        tables=_tables(spark, sf_dir, "orders"),
    )


@query(
    "jx_edges_boolean_cube",
    oracle="""
    WITH dom AS (SELECT unnest([true, false]) AS is_purchase),
    agg AS (
        SELECT event_type IS NOT DISTINCT FROM 'purchase' AS is_purchase,
               count(*) AS n,
               sum(CAST(round(value*100) AS BIGINT)) AS total_cents
        FROM events
        GROUP BY 1
    )
    SELECT dom.is_purchase, coalesce(agg.n, 0) AS n, agg.total_cents
    FROM dom LEFT JOIN agg USING (is_purchase)
    """,
    tags=("jx", "edges", "boolean_domain"),
)
def jx_edges_boolean_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean edge domain — exactly two parts, both present even when
    empty (u, jx_base/domains.py boolean domain; SURVEY.md §2.4)."""
    return jx_run(
        {
            "from": "events",
            "edges": [
                {
                    "name": "is_purchase",
                    "value": {"eq": {"event_type": "purchase"}},
                    "domain": {"type": "boolean"},
                }
            ],
            "select": [
                {"name": "n", "aggregate": "count"},
                {
                    "name": "total_cents",
                    "value": {"integer": {"round": [{"mult": ["value", 100]}, 0]}},
                    "aggregate": "sum",
                },
            ],
        },
        spark=spark,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "jx_edges_range_null_part",
    oracle="""
    WITH dom AS (
        SELECT CAST(i * 100000 AS DOUBLE) AS bucket
        FROM (SELECT unnest(generate_series(0, 3)) AS i)
        UNION ALL SELECT NULL
    ), agg AS (
        SELECT CASE WHEN o_totalprice >= 0 AND o_totalprice < 400000
                    THEN floor(o_totalprice / 100000) * 100000 END AS bucket,
               count(*) AS n,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
        FROM orders
        GROUP BY 1
    )
    SELECT dom.bucket, coalesce(agg.n, 0) AS n, agg.total_cents
    FROM dom LEFT JOIN agg ON dom.bucket IS NOT DISTINCT FROM agg.bucket
    """,
    tags=("jx", "edges", "range_domain", "null_part"),
)
def jx_edges_range_null_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-domain cube WITH the explicit null part (u, jx cube
    semantics: allowNulls routes missing / out-of-domain values to a
    NULL-keyed part instead of dropping them).  Orders above the 400k
    domain ceiling land on the NULL row; the oracle's null-safe join
    (IS NOT DISTINCT FROM) mirrors the engine's eqNullSafe domain
    join."""
    return jx_run(
        {
            "from": "orders",
            "edges": [
                {
                    "name": "bucket",
                    "value": "o_totalprice",
                    "allowNulls": True,
                    "domain": {"type": "range", "min": 0, "max": 400000, "interval": 100000},
                }
            ],
            "select": [
                {"name": "n", "aggregate": "count"},
                {
                    "name": "total_cents",
                    "value": {"integer": {"round": [{"mult": ["o_totalprice", 100]}, 0]}},
                    "aggregate": "sum",
                },
            ],
        },
        spark=spark,
        tables=_tables(spark, sf_dir, "orders"),
    )


@query(
    "jx_implicit_array_map",
    oracle="""
    SELECT vec_id,
           len(embedding) AS n_dims,
           round(CAST(embedding[1] AS DOUBLE) * 2, 6) AS e1_x2,
           round(CAST(embedding[64] AS DOUBLE) * 2, 6) AS e64_x2
    FROM embeddings
    """,
    tags=("jx", "implicit_array_map"),
)
def jx_implicit_array_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mo-dots implicit array mapping (u, FlatList; SURVEY.md §1.4
    item 6): the scalar expression {"mult": ["embedding", 2]} applied
    to an array column maps per element (compiled to F.transform —
    stays JVM-side).  x*2 is exact in float, so the widen-after vs
    widen-before orders agree with the oracle bit-for-bit."""
    return jx_run(
        {
            "from": "embeddings",
            "select": [
                "vec_id",
                {"name": "n_dims", "value": {"count_array": "embedding"}},
                {
                    "name": "e1_x2",
                    "value": {
                        "round": [
                            {"number": {"first_array": {"mult": ["embedding", 2]}}},
                            6,
                        ]
                    },
                },
                {
                    "name": "e64_x2",
                    "value": {
                        "round": [
                            {"number": {"last_array": {"mult": ["embedding", 2]}}},
                            6,
                        ]
                    },
                },
            ],
        },
        spark=spark,
        tables=_tables(spark, sf_dir, "embeddings"),
    )


@query(
    "jx_dynamic_shred_props",
    oracle="""
    WITH evolved AS (
      SELECT event_id, user_id,
             CASE WHEN event_id % 3 = 0
                  THEN regexp_replace(props, '}$', ', "extra": "u' || CAST(user_id AS VARCHAR) || '"}')
                  ELSE props END AS props
      FROM events
    )
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.extra') AS extra
    FROM evolved
    """,
    tags=("jx", "dynamic_schema", "shred"),
)
def jx_dynamic_shred_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic snowflake-schema evolution (u, jx_sqlite: new key ->
    new column; operators/shred.py).  A third of the rows gain an
    'extra' key (same textual construction in the oracle); key
    DISCOVERY then finds {extra, k} and the shred projects both, null
    where absent.  Discovery is the one driver-side schema decision —
    its result is the key list, not data."""
    from mo_etl_spark.operators.shred import shred_json

    prepare(spark)
    events = _tables(spark, sf_dir, "events")["events"]
    evolved = events.select(
        "event_id",
        "user_id",
        F.when(
            F.col("event_id") % 3 == 0,
            F.regexp_replace(
                "props", r"\}$",
                F.concat(F.lit(', "extra": "u'), F.col("user_id").cast("string"), F.lit('"}')),
            ),
        ).otherwise(F.col("props")).alias("props"),
    )
    shredded = shred_json(evolved, "props")  # discovers [extra, k]
    return shredded.select(
        "event_id",
        F.col("props_k").cast("long").alias("k"),
        F.col("props_extra").alias("extra"),
    )


@query(
    "jx_edges_quarter_cube",
    oracle="""
    WITH dom AS (
        SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
                                      TIMESTAMP '2001-10-01',
                                      INTERVAL 3 MONTH)) AS quarter
    ), agg AS (
        SELECT date_trunc('quarter', o_orderdate) AS quarter,
               count(*) AS n,
               sum(CAST(round(o_totalprice*100) AS BIGINT)) AS total_cents
        FROM orders GROUP BY 1
    )
    SELECT dom.quarter, coalesce(agg.n, 0) AS n, agg.total_cents
    FROM dom LEFT JOIN agg USING (quarter)
    WHERE dom.quarter < TIMESTAMP '2001-10-01'
    """,
    tags=("jx", "edges", "time_domain", "quarter"),
)
def jx_edges_quarter_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-unit time domain (u, mo_times quarter Duration —
    calendar-aware like month).  Spark's interval literal has no
    QUARTER unit, so the domain generator steps 3 months while the
    bucket key uses date_trunc('quarter'); DuckDB agrees on quarter
    boundaries.  Money summed in integer cents for float stability."""
    from mo_etl_spark.jx import jx_run

    return jx_run(
        {
            "from": "orders",
            "edges": [
                {
                    "name": "quarter",
                    "value": "o_orderdate",
                    "domain": {
                        "type": "time",
                        "min": "1995-01-01",
                        "max": "2001-10-01",
                        "interval": "quarter",
                    },
                }
            ],
            "select": [
                {"name": "n", "aggregate": "count"},
                {
                    "name": "total_cents",
                    "value": {"integer": {"round": [{"mult": ["o_totalprice", 100]}, 0]}},
                    "aggregate": "sum",
                },
            ],
        },
        spark=spark,
        tables=_tables(spark, sf_dir, "orders"),
    )


@query(
    "jx_edges_week_cube",
    oracle="""
    WITH dom AS (
        SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                      TIMESTAMP '2024-02-05',
                                      INTERVAL 7 DAY)) AS week
    ), agg AS (
        SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
               count(*) AS n,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1
    )
    SELECT dom.week, coalesce(agg.n, 0) AS n, agg.n_users
    FROM dom LEFT JOIN agg USING (week)
    WHERE dom.week < TIMESTAMP '2024-02-05'
    """,
    tags=("jx", "edges", "time_domain", "week"),
)
def jx_edges_week_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-unit time domain (u, mo_times week Duration): calendar
    weeks align to Monday identically in Spark date_trunc('week') and
    DuckDB — verified 2024-01-01 (a Monday) and mid-week stamps.
    Complete domain: every week in the window, empty ones at 0."""
    return jx_run(
        {
            "from": "events",
            "edges": [
                {
                    "name": "week",
                    "value": "ts",
                    "domain": {
                        "type": "time",
                        "min": "2024-01-01",
                        "max": "2024-02-05",
                        "interval": "week",
                    },
                }
            ],
            "select": [
                {"name": "n", "aggregate": "count"},
                {"name": "n_users", "value": "user_id", "aggregate": "cardinality"},
            ],
        },
        spark=spark,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "jx_edges_duration_cube",
    oracle="""
    WITH gaps AS (
      SELECT (epoch_ms(ts) - lag(epoch_ms(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id)) / 1000.0 AS gap_s
      FROM events
    ),
    dom AS (
      SELECT CAST(i * 300 AS DOUBLE) AS gap_bucket
      FROM (SELECT unnest(generate_series(0, 11)) AS i)
      UNION ALL SELECT NULL
    ),
    agg AS (
      SELECT CASE WHEN gap_s >= 0 AND gap_s < 3600
                  THEN floor(gap_s / 300) * 300 END AS gap_bucket,
             count(*) AS n
      FROM gaps
      GROUP BY 1
    )
    SELECT dom.gap_bucket, coalesce(agg.n, 0) AS n
    FROM dom LEFT JOIN agg ON dom.gap_bucket IS NOT DISTINCT FROM agg.gap_bucket
    """,
    tags=("jx", "edges", "duration_domain", "null_part"),
)
def jx_edges_duration_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-domain edges (u, mo_times Duration / jx_base duration
    domain): per-user inter-event gaps in seconds bucketed into
    complete 5-minute parts over [0, 1h), with the null part taking
    first-events (no gap) and gaps beyond the domain — the jx cube
    shape over a DERIVED duration value (the table fed to the edges
    query is itself an engine windowed DataFrame)."""
    from pyspark.sql import Window

    prepare(spark)
    events = _tables(spark, sf_dir, "events")["events"]
    ems = (F.unix_micros(F.col("ts")) / 1000).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = events.select(((ems - F.lag(ems).over(w)) / F.lit(1000.0)).alias("gap_s"))
    return jx_run(
        {
            "from": "gaps",
            "edges": [
                {
                    "name": "gap_bucket",
                    "value": "gap_s",
                    "allowNulls": True,
                    "domain": {"type": "duration", "min": 0, "max": 3600, "interval": 300},
                }
            ],
            "select": [{"name": "n", "aggregate": "count"}],
        },
        spark=spark,
        tables={"gaps": gaps},
    )


@query(
    "jx_fluent_pipeline",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
             AS revenue_cents,
           max(l_quantity) AS max_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_quantity > 10
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("jx", "fluent", "filter", "groupby", "sort"),
)
def jx_fluent_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User surface 1 (SURVEY.md §3.2): the fluent Python builder —
    Q(df).where(...).groupby(...).select(...).sort(...) — compiled
    through the SAME jx_run path as the dict surface (the builder IS
    a jx dict underneath), so decisive-null semantics, integer-cents
    lifting, and Catalyst optimization all apply identically.  The
    chained .where calls AND-merge, mirroring mo-streams pipeline
    composition (u)."""
    from mo_etl_spark.jx.fluent import Q

    prepare(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        Q(li)
        .where({"gte": ["l_shipdate", {"date": "1997-01-01"}]})
        .where({"gt": ["l_quantity", 10]})
        .groupby("l_returnflag")
        .select(
            {"name": "n", "aggregate": "count"},
            {
                "name": "revenue_cents",
                "value": {
                    "integer": {
                        "round": [
                            {"mult": ["l_extendedprice", {"sub": [1, "l_discount"]}, 100]},
                            0,
                        ]
                    }
                },
                "aggregate": "sum",
            },
            {"name": "max_qty", "value": "l_quantity", "aggregate": "maximum"},
        )
        .sort("l_returnflag")
        .df()
    )


@query(
    "jx_window_user_seq",
    oracle="""
    SELECT event_id,
           user_id,
           value,
           CAST(row_number() OVER w - 1 AS INTEGER) AS seq,
           lag(value, 1) OVER w AS prev_value
    FROM events
    WHERE user_id < 40
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST)
    """,
    tags=("jx", "window"),
)
def jx_window_user_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx window clause on the SELECT path (u, jx_python/windows.py):
    0-based per-user rownum + lag, sorted by (ts, event_id) with jx
    nulls-least ordering. Contract-level twin of the round-4 golden
    conformance grid (tests/test_jx_golden_corpus.py window_* cases) —
    proves the same compiler path against the DuckDB oracle on a real
    table in both session modes."""
    return jx_run(
        {
            "from": "events",
            "where": {"lt": ["user_id", 40]},
            "select": ["event_id", "user_id", "value"],
            "window": [
                {
                    "name": "seq",
                    "aggregate": "rownum",
                    "edges": "user_id",
                    "sort": ["ts", "event_id"],
                },
                {
                    "name": "prev_value",
                    "value": "value",
                    "aggregate": "lag",
                    "edges": "user_id",
                    "sort": ["ts", "event_id"],
                },
            ],
        },
        spark=spark,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "jx_window_over_groupby",
    oracle="""
    SELECT event_type,
           n,
           total_cents,
           CAST(rank() OVER (ORDER BY total_cents DESC NULLS LAST) AS INTEGER) AS rk
    FROM (
        SELECT event_type,
               count(*) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) AS total_cents
        FROM events
        GROUP BY event_type
    )
    """,
    tags=("jx", "window", "groupby"),
)
def jx_window_over_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx window clause on the AGGREGATE path: rank computed over the
    grouped rows (u, jx windows compose after groupby), descending with
    jx nulls-last-on-desc ordering. The rank window is partition-less
    by construction but runs over <= n_event_types rows (a handful at
    ANY scale factor) — the bounded-domain exception documented in
    BASELINE.md's global-window section."""
    return jx_run(
        {
            "from": "events",
            "groupby": ["event_type"],
            "select": [
                {"name": "n", "aggregate": "count"},
                {
                    "name": "total_cents",
                    "value": {"integer": {"round": [{"mult": ["value", 100]}, 0]}},
                    "aggregate": "sum",
                },
            ],
            "window": [
                {
                    "name": "rk",
                    "aggregate": "rank",
                    "sort": {"value": "total_cents", "sort": -1},
                }
            ],
        },
        spark=spark,
        tables=_tables(spark, sf_dir, "events"),
    )


@query(
    "jx_fluent_window_limit",
    oracle="""
    SELECT event_type, n, CAST(total_cents AS BIGINT) AS total_cents, rk
    FROM (
        SELECT event_type,
               count(*) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) AS total_cents,
               CAST(rank() OVER (
                   ORDER BY sum(CAST(round(value * 100) AS BIGINT))
                            DESC NULLS LAST) AS INTEGER) AS rk
        FROM events
        WHERE user_id < 120
        GROUP BY event_type
    )
    ORDER BY rk, event_type
    LIMIT 3
    """,
    tags=("jx", "fluent", "window", "groupby", "top_k"),
)
def jx_fluent_window_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fluent builder's OTHER clauses driver-gated (r11, VERDICT
    r10 item #6 — jx_fluent_pipeline covers where/groupby/select/sort;
    this one proves ``.window()`` / ``.limit()`` builder->IR->compile
    parity): per-type revenue ranked by a builder-attached window,
    then top-3 via the builder's sort+limit.  Identical jx dict
    underneath, same decisive-null and integer-cents semantics."""
    from mo_etl_spark.jx.fluent import Q

    prepare(spark)
    return (
        Q("events", spark=spark, tables=_tables(spark, sf_dir, "events"))
        .where({"lt": ["user_id", 120]})
        .groupby("event_type")
        .select(
            {"name": "n", "aggregate": "count"},
            {
                "name": "total_cents",
                "value": {"integer": {"round": [{"mult": ["value", 100]}, 0]}},
                "aggregate": "sum",
            },
        )
        .window(
            name="rk",
            aggregate="rank",
            sort={"value": "total_cents", "sort": -1},
        )
        .sort("rk", "event_type")
        .limit(3)
        .df()
    )
