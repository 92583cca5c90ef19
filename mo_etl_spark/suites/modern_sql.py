"""Modern-SQL surface queries (engine additions; Spark 4 features).

The reference delegates SQL parsing to ``mo-sql-parsing`` (u — SQL text
-> JSON tree; execution is whoever consumes the tree) and has no
recursive-query or lateral-join surface at all.  This engine's SQL
surface IS Spark SQL (SURVEY.md §7.4), so the capabilities below come
from Catalyst directly:

- ``WITH RECURSIVE`` (Spark 4.0+, SPARK-24497): iterative hierarchy
  walks — the jx-sqlite "snowflake" parent/child traversal shape (u)
  generalized to unbounded depth.
- ``LATERAL`` correlated subqueries (Spark 3.2+): per-row dependent
  subqueries — decorrelated by Catalyst into joins, so no
  nested-loop-per-row at 100 TB.

Both have exact DuckDB twins, so they are fully hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mo_etl_spark.registry import query
from mo_etl_spark.session import prepare
from mo_etl_spark.tables import load_table


@query(
    "sql_recursive_cte_tree",
    oracle="""
    WITH RECURSIVE tree AS (
      SELECT n_nationkey AS nationkey, 0 AS depth, n_name AS path
      FROM nation WHERE n_nationkey = 0
      UNION ALL
      SELECT n.n_nationkey AS nationkey, t.depth + 1 AS depth,
             concat(t.path, '/', n.n_name) AS path
      FROM nation n JOIN tree t
        ON t.nationkey = CAST(floor((n.n_nationkey - 1) / 2.0) AS INT)
       AND n.n_nationkey > 0
    )
    SELECT nationkey, depth, path FROM tree
    """,
    tags=("recursive_cte", "sql_surface", "hierarchy"),
)
def sql_recursive_cte_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE hierarchy walk: nations arranged as an implicit
    binary tree (parent(k) = floor((k-1)/2)), walked from the root with
    depth and root->node path accumulation.  Each iteration is one
    broadcast-size join; Spark materializes the frontier per step (the
    same loop-over-join shape as operators/graph.py PageRank, but
    expressed declaratively).  Identical SQL runs on DuckDB."""
    prepare(spark)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        WITH RECURSIVE tree AS (
          SELECT n_nationkey AS nationkey, 0 AS depth, n_name AS path
          FROM nation WHERE n_nationkey = 0
          UNION ALL
          SELECT n.n_nationkey AS nationkey, t.depth + 1 AS depth,
                 concat(t.path, '/', n.n_name) AS path
          FROM nation n JOIN tree t
            ON t.nationkey = CAST(floor((n.n_nationkey - 1) / 2.0) AS INT)
           AND n.n_nationkey > 0
        )
        SELECT nationkey, depth, path FROM tree
        """
    )


@query(
    "sql_recursive_running_restart",
    oracle="""
    WITH RECURSIVE
    seq AS (
      SELECT o_custkey, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      FROM orders WHERE o_custkey < 200
    ),
    walk AS (
      SELECT o_custkey, o_orderkey, price_cents, rn,
             price_cents AS bucket_total
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.o_custkey, s.o_orderkey, s.price_cents, s.rn,
             CASE WHEN w.bucket_total >= 10000000 THEN s.price_cents
                  ELSE w.bucket_total + s.price_cents END AS bucket_total
      FROM seq s JOIN walk w
        ON s.o_custkey = w.o_custkey AND s.rn = w.rn + 1
    )
    SELECT o_custkey, o_orderkey, bucket_total FROM walk
    """,
    tags=("recursive_cte", "sql_surface", "iterative", "stateful_scan"),
)
def sql_recursive_running_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A genuinely non-window-expressible recursion: a running total
    that RESETS after crossing a threshold (batch/bin accumulation —
    the 'fill the truck, start a new one' shape).  The reset makes each
    row's value depend on the post-reset state of the previous row, so
    no single window frame computes it; WITH RECURSIVE walks each
    customer's order sequence carrying the accumulator.  Per-iteration
    work is one equi join on (custkey, rn) — co-partitioned, bounded by
    the longest per-key chain."""
    prepare(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH RECURSIVE
        seq AS (
          SELECT o_custkey, o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
                 row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
          FROM orders WHERE o_custkey < 200
        ),
        walk AS (
          SELECT o_custkey, o_orderkey, price_cents, rn,
                 price_cents AS bucket_total
          FROM seq WHERE rn = 1
          UNION ALL
          SELECT s.o_custkey, s.o_orderkey, s.price_cents, s.rn,
                 CASE WHEN w.bucket_total >= 10000000 THEN s.price_cents
                      ELSE w.bucket_total + s.price_cents END AS bucket_total
          FROM seq s JOIN walk w
            ON s.o_custkey = w.o_custkey AND s.rn = w.rn + 1
        )
        SELECT o_custkey, o_orderkey, bucket_total FROM walk
        """
    )


@query(
    "join_lateral_topk_suppliers",
    oracle="""
    SELECT n.n_name, s.s_name,
           CAST(round(s.s_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM nation n, LATERAL (
      SELECT s_name, s_acctbal
      FROM supplier
      WHERE s_nationkey = n.n_nationkey
      ORDER BY s_acctbal DESC, s_name
      LIMIT 2
    ) s
    """,
    tags=("join_lateral", "sql_surface", "top_k_per_group"),
)
def join_lateral_topk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with ORDER BY + LIMIT: the top-2
    suppliers by account balance for every nation.  Catalyst
    decorrelates the lateral into a window-rank join (no per-row
    re-execution), which is exactly the distributed top-k-per-group
    plan — the SQL spelling of win_top_k_per_group.  Nations with no
    suppliers drop out (inner lateral), matching DuckDB."""
    prepare(spark)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT n.n_name, s.s_name,
               CAST(round(s.s_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM nation n, LATERAL (
          SELECT s_name, s_acctbal
          FROM supplier
          WHERE s_nationkey = n.n_nationkey
          ORDER BY s_acctbal DESC, s_name
          LIMIT 2
        ) s
        """
    )


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS price_cents,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
             AS disc_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("sql_surface", "pipe_syntax", "groupby"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0, SPARK-49555 — the |> operator
    chain): the linear FROM -> WHERE -> EXTEND -> AGGREGATE flow that
    reads like the engine's own fluent API (and like the reference's
    mo-streams pipelines (u)), compiled by Catalyst to exactly the
    same plan as the nested SELECT.  EXTEND adds the integer-cents
    columns mid-pipe; AGGREGATE ... GROUP BY closes the flow."""
    prepare(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |> EXTEND CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
                  CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS dc
        |> AGGREGATE count(*) AS n, sum(pc) AS price_cents, sum(dc) AS disc_cents
           GROUP BY l_returnflag, l_linestatus
        """
    ).select("l_returnflag", "l_linestatus", "n", "price_cents", "disc_cents")


@query(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    tags=("sql_surface", "parameterized_sql", "groupby"),
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (spark.sql(..., args={...}), Spark 3.4+):
    the injection-safe query-template surface an ETL service exposes —
    parameters bind as typed literals in the PLAN (visible to
    predicate pushdown and partition pruning, unlike string
    concatenation which risks both injection and cache-key blowup).
    The oracle inlines the same literals."""
    prepare(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
        FROM orders
        WHERE o_orderdate >= :lo AND o_orderdate < :hi
          AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={
            "lo": "1997-01-01 00:00:00",
            "hi": "1998-01-01 00:00:00",
            "status": "F",
        },
    )


@query(
    "agg_transpose_metrics",
    oracle="""
    WITH per AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS n_events,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE) AS total_cents,
               CAST(count(DISTINCT user_id) AS DOUBLE) AS n_users
        FROM events GROUP BY event_type
    )
    SELECT m.key,
           max(CASE WHEN event_type = 'click' THEN m.v END) AS click,
           max(CASE WHEN event_type = 'error' THEN m.v END) AS error,
           max(CASE WHEN event_type = 'purchase' THEN m.v END) AS purchase,
           max(CASE WHEN event_type = 'signup' THEN m.v END) AS signup,
           max(CASE WHEN event_type = 'view' THEN m.v END) AS view
    FROM per,
         LATERAL (VALUES ('n_events', n_events), ('total_cents', total_cents),
                         ('n_users', n_users)) AS m(key, v)
    GROUP BY m.key
    """,
    tags=("transpose", "pivot", "unpivot", "sql_surface"),
)
def agg_transpose_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.transpose (Spark 4.0): flip a per-event-type metric
    table so metrics become rows and event types become columns — the
    cube-formatter reshaping (u, jx cube axes swap) as a first-class
    DataFrame op.  transpose() keys columns off the first column's
    values and requires a common value type, so metrics are cast to
    double and the frame is sorted for a deterministic column order.
    The oracle reproduces it as unpivot-then-pivot."""
    prepare(spark)
    e = load_table(spark, sf_dir, "events")
    per = (
        e.groupBy("event_type")
        .agg(
            F.count("*").cast("double").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("double")
            .alias("total_cents"),
            F.countDistinct("user_id").cast("double").alias("n_users"),
        )
        .orderBy("event_type")
    )
    return per.transpose()


@query(
    "sql_identifier_clause",
    oracle="""
    SELECT o_orderpriority AS grp,
           count(*) AS n,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("sql_surface", "identifier_clause", "parameterized_sql"),
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER() clause (Spark 3.4, SQL:2023-adjacent): table and
    COLUMN names supplied as parameters — the safe form of the
    string-built DDL/reporting templates every ETL service grows
    ('group tonight's rollup by whichever dimension the config
    says').  Unlike f-string SQL, the name binds as an identifier
    token: injection is impossible and Catalyst resolves it like any
    other reference.  Paired with sql_parameterized (value
    parameters), this completes the template surface."""
    prepare(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp_col) AS grp,
               count(*) AS n,
               sum(CAST(round(IDENTIFIER(:val_col) * 100) AS BIGINT)) AS total_cents
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:grp_col)
        """,
        args={"grp_col": "o_orderpriority", "val_col": "o_totalprice", "tbl": "orders"},
    )


@query(
    "sql_approx_top_k",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY n DESC
    LIMIT 3
    """,
    tags=("sql_surface", "approx", "top_k", "heavy_hitters", "sketch"),
)
def sql_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k (Spark 4.1): single-pass bounded-memory top-k
    frequent items.  With maxItemsTracked (default 10000) above the
    true distinct count the sketch is EXACT — the case here (5 event
    types), so the exact top-3 oracle hash-matches; beyond that bound
    it degrades to Space-Saving-style estimates, the 100 TB path where
    an exact groupBy over billions of keys is the thing being avoided.
    The count boundary at this data (2006 vs 1982) is strict, so the
    top-3 cut is deterministic."""
    prepare(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT t.item AS event_type, t.count AS n
        FROM (SELECT explode(approx_top_k(event_type, 3)) AS t FROM events)
        """
    )


@query(
    "sql_scripting_threshold_search",
    oracle="""
    WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS pc FROM orders),
    tot AS (SELECT count(*) AS n_total FROM c),
    ks AS (SELECT CAST(power(2, g) AS BIGINT) AS t FROM generate_series(10, 40) s(g)),
    cnt AS (SELECT t, (SELECT count(*) FROM c WHERE pc <= t) AS n_below FROM ks),
    pick AS (
        SELECT t, n_below FROM cnt, tot
        WHERE n_below * 2 >= n_total
        ORDER BY t LIMIT 1
    )
    SELECT t AS threshold_cents, n_below, n_total FROM pick, tot
    """,
    tags=("sql_surface", "sql_scripting", "iterative", "parameterized_sql"),
)
def sql_scripting_threshold_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4.0, SQL/PSM BEGIN..END): a procedural
    WHILE loop doubling a power-of-two price threshold until it covers
    at least half the orders — the galloping-search control flow that
    previously forced a driver-side Python loop around spark.sql.
    Each iteration is still a declarative scan (Catalyst optimizes
    every statement; the script only sequences them).  The oracle
    finds the same fixed point declaratively: smallest power of two
    >= 2^10 whose cumulative count clears half."""
    prepare(spark)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        BEGIN
          DECLARE n_total BIGINT DEFAULT 0;
          DECLARE t BIGINT DEFAULT 1024;
          SET n_total = (SELECT count(*) FROM orders);
          WHILE (SELECT count(*) FROM orders
                 WHERE CAST(round(o_totalprice * 100) AS BIGINT) <= t) * 2 < n_total DO
            SET t = t * 2;
          END WHILE;
          SELECT t AS threshold_cents,
                 (SELECT count(*) FROM orders
                  WHERE CAST(round(o_totalprice * 100) AS BIGINT) <= t) AS n_below,
                 n_total AS n_total;
        END
        """
    )


@query(
    "sql_tvf_family",
    oracle="""
    WITH months AS (SELECT g AS m FROM generate_series(1, 12) s(g)),
    prios AS (SELECT * FROM (VALUES ('1-URGENT'), ('5-LOW')) t(prio)),
    actual AS (
        SELECT month(o_orderdate) AS m, o_orderpriority AS prio, count(*) AS n
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1, 2
    )
    SELECT months.m, prios.prio, coalesce(actual.n, 0) AS n
    FROM months
    CROSS JOIN prios
    LEFT JOIN actual ON actual.m = months.m AND actual.prio = prios.prio
    """,
    tags=("sql_surface", "table_valued_function", "time_domain", "join_left",
          "edges"),
)
def sql_tvf_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-valued functions as DIMENSION GENERATORS — the SQL-native
    way to build the complete domains jx 'edges' guarantees (u: every
    part present even at zero): a range() month spine crossed with a
    VALUES literal table, LEFT-joined to the sparse actuals so empty
    (month, priority) cells surface as explicit zeros.  Both
    generators run engine-side (no driver-materialized DataFrame), so
    the same shape works when the spine is a billion-cell time grid —
    range() is a lazy, splittable source."""
    prepare(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH months AS (SELECT id AS m FROM range(1, 13)),
        prios AS (SELECT prio FROM VALUES ('1-URGENT'), ('5-LOW') AS t(prio)),
        actual AS (
            SELECT month(o_orderdate) AS m, o_orderpriority AS prio, count(*) AS n
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
            GROUP BY 1, 2
        )
        SELECT months.m, prios.prio, coalesce(actual.n, 0) AS n
        FROM months
        CROSS JOIN prios
        LEFT JOIN actual ON actual.m = months.m AND actual.prio = prios.prio
        """
    )


_HIER_ROLLUP_SQL = """
    WITH RECURSIVE anc AS (
      SELECT n_nationkey AS node, n_nationkey AS anc
      FROM nation
      UNION ALL
      SELECT a.node, CAST(floor((a.anc - 1) / 2.0) AS INT) AS anc
      FROM anc a WHERE a.anc > 0
    ),
    tot AS (
      SELECT c.c_nationkey AS node,
             sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS t,
             count(*) AS n_orders
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey
    )
    SELECT anc.anc AS nationkey,
           sum(tot.t) AS subtree_cents,
           sum(tot.n_orders) AS subtree_orders,
           count(*) AS n_contributing_nodes
    FROM anc JOIN tot ON tot.node = anc.node
    GROUP BY anc.anc
"""


@query(
    "sql_hierarchy_rollup",
    oracle=_HIER_ROLLUP_SQL,
    tags=("hierarchy", "recursive_cte", "rollup", "sql_surface", "groupby"),
)
def sql_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup UP a parent-child hierarchy — the org-chart /
    category-tree aggregation GROUP BY ROLLUP cannot express (ROLLUP
    needs the levels as columns; here the tree is edges): a recursive
    CTE materializes the ancestor closure (every node paired with each
    of its ancestors, itself included), and one join+groupBy charges
    every nation's order revenue to its whole ancestor chain in the
    implicit binary tree.  Closure size is nodes x depth (log-bounded
    here), the standard flatten-then-aggregate trade for DAG rollups
    at scale — each recursion step is one broadcast-size join."""
    prepare(spark)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_HIER_ROLLUP_SQL)


_BOM_SQL = """
    WITH RECURSIVE walk AS (
      SELECT n_nationkey AS node, 0 AS depth,
             CAST(1 AS BIGINT) AS path_qty
      FROM nation WHERE n_nationkey = 0
      UNION ALL
      SELECT n.n_nationkey, w.depth + 1,
             w.path_qty * (1 + n.n_nationkey % 3)
      FROM nation n JOIN walk w
        ON w.node = CAST(floor((n.n_nationkey - 1) / 2.0) AS INT)
       AND n.n_nationkey > 0
    )
    SELECT node, depth, path_qty FROM walk
"""


@query(
    "sql_bom_explosion",
    oracle=_BOM_SQL,
    tags=("bom_explosion", "recursive_cte", "hierarchy", "sql_surface"),
)
def sql_bom_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOM EXPLOSION — the bill-of-materials walk whose accumulator is
    MULTIPLICATIVE (effective quantity = product of per-edge usage
    counts along the path), the manufacturing twin of the additive
    hierarchy rollup: 'one root assembly needs path_qty units of each
    descendant part'.  Per-edge multiplier 1 + key%3 over the implicit
    binary tree keeps everything integer-exact; products compound down
    the recursion, which no GROUP BY ROLLUP or window frame can
    express — WITH RECURSIVE carries the running product per path."""
    prepare(spark)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(_BOM_SQL)
