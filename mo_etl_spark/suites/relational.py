"""M2 relational spine: the SQL join surface + sorts/limits/set ops
(SURVEY.md §2.3/2.6/2.7).

Reference provenance: the SQL join/set-op surface enters the mo-*
ecosystem through mo-sql-parsing (u) and jx-sqlite's snowflake joins
(u); pagination/sort/limit are jx query clauses (u, jx_python/jx.py).
Spark-first execution notes per query; all dimension joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mo_etl_spark.functions.numeric import cents
from mo_etl_spark.operators.joins import asof_join, range_join, top_k_per_group
from mo_etl_spark.registry import query
from mo_etl_spark.session import prepare
from mo_etl_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, *names: str):
    prepare(spark)
    dfs = [load_table(spark, sf_dir, n) for n in names]
    return dfs[0] if len(dfs) == 1 else dfs


@query(
    "join_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           sum(CAST(round(l.l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS revenue_c4,
           o.o_orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
    tags=("join_inner", "groupby"),
)
def join_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped 3-way inner join. Plan: customer is dimension-side
    (broadcast), orders⋈lineitem shuffles on orderkey; revenue in exact
    cents⁴ integers (sum of cents*(100-disc_cents))."""
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    ep, disc = cents("l_extendedprice"), cents("l_discount")
    return (
        lineitem.where(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
        .join(
            orders.where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(ep * (100 - disc)).alias("revenue_c4"))
    )


@query(
    "join_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           sum(CAST(round(l.l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS revenue_c4
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    tags=("join_inner", "join_broadcast", "groupby"),
)
def join_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 6-way join, revenue by nation for one region/year.
    supplier/nation/region broadcast (BROADCAST_DIMS); the only big
    shuffle is orders⋈lineitem on orderkey."""
    customer, orders, lineitem, supplier, nation, region = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    ep, disc = cents("l_extendedprice"), cents("l_discount")
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        lineitem.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(F.sum(ep * (100 - disc)).alias("revenue_c4"))
    )


@query(
    "join_left_customer_order_counts",
    oracle="""
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
           sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS total_cents
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    tags=("join_left", "groupby"),
)
def join_left_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers (count 0, sum NULL —
    decisive aggregates skip missing (u, mo_math))."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("total_cents"),
        )
    )


@query(
    "join_semi_customers_with_urgent",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
    tags=("join_semi",),
)
def join_semi_customers_with_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence join (jx 'in'-subquery shape via mo-sql-parsing (u)) ->
    left_semi: no row duplication, right side never materialized wide."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti_customers_no_open_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
    tags=("join_anti",),
)
def join_anti_customers_no_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no open ('P') orders (non-empty at
    every sf, unlike parts-never-ordered)."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    open_orders = orders.where(F.col("o_orderstatus") == "P")
    return customer.join(
        open_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_theta_supplier_pairs",
    oracle="""
    SELECT s1.s_nationkey AS nationkey, count(*) AS n_pairs
    FROM supplier s1 JOIN supplier s2
      ON s1.s_nationkey = s2.s_nationkey AND s1.s_acctbal < s2.s_acctbal
    GROUP BY s1.s_nationkey
    """,
    tags=("join_theta",),
)
def join_theta_supplier_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi predicate join. The equi part (nationkey) keys the hash
    join; only the residual inequality is post-filtered — Catalyst does
    exactly this given the mixed condition."""
    supplier = _t(spark, sf_dir, "supplier")
    s1 = supplier.alias("s1")
    s2 = supplier.alias("s2")
    return (
        s1.join(
            s2,
            (F.col("s1.s_nationkey") == F.col("s2.s_nationkey"))
            & (F.col("s1.s_acctbal") < F.col("s2.s_acctbal")),
        )
        .groupBy(F.col("s1.s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "join_cross_region_nation",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
    tags=("join_cross",),
)
def join_cross_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (both sides tiny -> broadcast NL join is fine)."""
    region, nation = _t(spark, sf_dir, "region", "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


@query(
    "join_asof_purchase_last_click",
    oracle="""
    SELECT p.event_id, c.event_id AS click_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    tags=("join_asof",),
)
def join_asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (engine addition, SURVEY.md §2.3): for every purchase,
    the user's most recent click at-or-before it.  Union+window — one
    shuffle on user_id (operators/joins.py asof_join)."""
    events = _t(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase")
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    out = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts", right_prefix="m_"
    )
    return out.select("event_id", F.col("m_click_event_id").alias("click_event_id"))


@query(
    "join_range_clicks_before_purchase",
    oracle="""
    SELECT p.event_id, count(c.event_id) AS n_clicks
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND epoch_ms(c.ts) - epoch_ms(p.ts) BETWEEN -600000 AND 0
    GROUP BY p.event_id
    """,
    tags=("join_range",),
)
def join_range_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/band join (engine addition): clicks within the 10 minutes
    before each purchase, counted.  Bucketed equi-join (600s buckets)
    instead of a nested-loop theta join (operators/joins.py range_join).
    Point values are integer epoch-millis on BOTH engines so µs-vs-ns
    precision cannot skew the band edges."""
    events = _t(spark, sf_dir, "events")
    ems = F.unix_micros(F.col("ts")) / 1000  # epoch ms (float mid-step ok: /1000 exact for µs)
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.floor(ems).cast("long").alias("pms")
    )
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.floor(ems).cast("long").alias("cms")
    )
    matched = range_join(
        purchases,
        clicks,
        on=["user_id"],
        left_point="pms",
        right_point="cms",
        lower=F.lit(-600000),
        upper=F.lit(0),
        bucket_width=600000,
    )
    counts = matched.groupBy("event_id").agg(F.count(F.lit(1)).alias("n_clicks"))
    # left-outer semantics: purchases with zero clicks keep a 0 row
    return (
        purchases.select("event_id")
        .join(counts, "event_id", "left")
        .select("event_id", F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"))
    )


@query(
    "top_k_orders",
    oracle="""
    SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
    FROM orders
    ORDER BY price_cents DESC, o_orderkey
    LIMIT 10
    """,
    tags=("top_k", "sort", "limit"),
)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort+limit fused: Catalyst plans TakeOrderedAndProject — no full
    sort at any scale.  Tie-broken by orderkey for determinism."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", cents("o_totalprice").alias("price_cents"))
        .orderBy(F.col("price_cents").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "top_k_per_group_orders",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey) AS rnk
      FROM orders)
    WHERE rnk <= 3
    """,
    tags=("top_k_per_group", "window"),
)
def top_k_per_group_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (engine addition, SURVEY.md §2.6)."""
    orders = _t(spark, sf_dir, "orders")
    df = orders.select(
        "o_custkey", "o_orderkey", cents("o_totalprice").alias("price_cents")
    )
    return top_k_per_group(
        df,
        partition=["o_custkey"],
        order=[F.col("price_cents").desc(), F.col("o_orderkey")],
        k=3,
        rank_name="rnk",
    )


@query(
    "pagination_offset_limit",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders
    ORDER BY o_orderkey LIMIT 25 OFFSET 1000
    """,
    tags=("skip", "limit", "sort"),
)
def pagination_offset_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination (jx skip+limit (u, ActiveData)); Spark 3.4+ offset."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
        .offset(1000)
        .limit(25)
    )


@query(
    "distinct_order_status_priority",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    tags=("distinct",),
)
def distinct_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct == jx groupby-with-no-aggregates (u, jx_python)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "setop_union_all_keys",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
    tags=("union_all",),
)
def setop_union_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    return customer.select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    ).unionByName(
        supplier.select(
            F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
        )
    )


@query(
    "setop_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("intersect",),
)
def setop_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "setop_except_brand_sizes",
    oracle="""
    SELECT p_size FROM part WHERE p_brand = 'Brand#11'
    EXCEPT
    SELECT p_size FROM part WHERE p_brand = 'Brand#12'
    """,
    tags=("except",),
)
def setop_except_brand_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    # subtract == EXCEPT DISTINCT (SQL semantics; exceptAll would keep
    # surplus duplicates of values that DO appear on the right)
    return part.where(F.col("p_brand") == "Brand#11").select("p_size").subtract(
        part.where(F.col("p_brand") == "Brand#12").select("p_size")
    )


@query(
    "join_full_customer_status",
    oracle="""
    WITH f AS (SELECT o_custkey, count(*) AS f_orders
               FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey),
         o AS (SELECT o_custkey, count(*) AS o_orders
               FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey)
    SELECT coalesce(f.o_custkey, o.o_custkey) AS o_custkey,
           f.f_orders, o.o_orders
    FROM f FULL JOIN o ON f.o_custkey = o.o_custkey
    """,
    tags=("join_full",),
)
def join_full_customer_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates sharing a key (u,
    mo_sql_parsing ``full join``; SURVEY.md §2.3 join_left/right/full).
    Customers with only finished orders, only open orders, or both —
    genuinely asymmetric sides, nulls preserved (no fillna).  Spark
    USING-join coalesces the key column; sort-merge on o_custkey (both
    sides pre-aggregated so the shuffle is on already-reduced rows)."""
    orders = _t(spark, sf_dir, "orders")
    f = (
        orders.where(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("f_orders"))
    )
    o = (
        orders.where(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("o_orders"))
    )
    return f.join(o, on=["o_custkey"], how="full")


@query(
    "join_right_part_sales",
    oracle="""
    SELECT p.p_partkey, p.p_brand,
           coalesce(s.lines_sold, 0) AS lines_sold,
           coalesce(s.qty_sum, 0) AS qty_sum
    FROM (SELECT l_partkey, count(*) AS lines_sold,
                 sum(CAST(round(l_quantity) AS BIGINT)) AS qty_sum
          FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-06-01'
          GROUP BY l_partkey) s
    RIGHT JOIN part p ON s.l_partkey = p.p_partkey
    """,
    tags=("join_right",),
)
def join_right_part_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join keeping every part, including the ~350 with no
    sales in the window (u, mo_sql_parsing ``right join``).  The right
    side (part) is dimension-sized -> at scale this flips to a left
    join with the fact side pre-aggregated; Catalyst plans the same."""
    part, lineitem = _t(spark, sf_dir, "part", "lineitem")
    sold = (
        lineitem.where(F.col("l_shipdate") < "1995-06-01")
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("lines_sold"),
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty_sum"),
        )
    )
    return (
        sold.join(part, sold.l_partkey == part.p_partkey, "right")
        .select(
            "p_partkey",
            "p_brand",
            F.coalesce("lines_sold", F.lit(0)).alias("lines_sold"),
            F.coalesce("qty_sum", F.lit(0)).alias("qty_sum"),
        )
    )


@query(
    "setop_union_distinct_priorities",
    oracle="""
    SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("union_distinct",),
)
def setop_union_distinct_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — jx 'union' / parser ``union`` (u,
    mo_sql_parsing).  unionByName + distinct; Catalyst plans a single
    hash-aggregate over the concatenation (one shuffle)."""
    orders = _t(spark, sf_dir, "orders")
    f = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority")
    )
    o = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("priority")
    )
    return f.unionByName(o).distinct()


@query(
    "join_broadcast_region_suppliers",
    oracle="""
    SELECT r.r_name, n.n_name, count(*) AS n_suppliers,
           sum(CAST(round(s.s_acctbal*100) AS BIGINT)) AS acctbal_cents
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    tags=("join_broadcast",),
)
def join_broadcast_region_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hint joins (SURVEY §2.3 join_broadcast): both
    dims are marked F.broadcast, so the fact side never shuffles for
    the join — the plan is scan(supplier) -> BroadcastHashJoin x2 ->
    partial agg -> one shuffle on the group keys.  At 100 TB this is
    the difference between a map-side pipeline and a 3-way sort-merge."""
    supplier, nation, region = _t(spark, sf_dir, "supplier", "nation", "region")
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(cents("s_acctbal")).alias("acctbal_cents"),
        )
    )


@query(
    "setop_union_heterogeneous_docs",
    oracle="""
    SELECT c_custkey AS entity_id, c_mktsegment AS segment,
           CAST(NULL AS DOUBLE) AS acctbal, 'customer' AS side
    FROM customer
    UNION ALL
    SELECT s_suppkey, CAST(NULL AS VARCHAR), s_acctbal, 'supplier'
    FROM supplier
    """,
    tags=("union_all", "heterogeneous_schema"),
)
def setop_union_heterogeneous_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous-document union (u, mo_dots list concat: docs with
    DIFFERENT key sets coexist; missing keys read as Null).  Spark:
    unionByName(allowMissingColumns=True) — each side's absent columns
    materialize as nulls, no manual padding."""
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    c = customer.select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("customer").alias("side"),
    )
    s = supplier.select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("side"),
    )
    return c.unionByName(s, allowMissingColumns=True)


@query(
    "join_q7_nation_trade",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS revenue_c4
    FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    """,
    tags=("join_inner", "join_broadcast", "groupby"),
)
def join_q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped nation-pair trade volume by ship year.  Both
    nation copies broadcast; the directional pair filter applies AFTER
    the joins (a pre-filter on either nation alone would also prune the
    opposite direction).  Big shuffles: lineitem⋈orders on orderkey
    only — supplier and customer ride broadcast joins."""
    supplier, lineitem, orders, customer, nation = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    ep, disc = cents("l_extendedprice"), cents("l_discount")
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(ep * (100 - disc)).alias("revenue_c4"))
    )


@query(
    "join_q17_small_quantity_revenue",
    oracle="""
    WITH thresh AS (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS lim
      FROM lineitem GROUP BY l_partkey
    )
    SELECT count(*) AS n_small,
           round(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)) / 7.0, 2) AS avg_yearly_cents
    FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN thresh t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < t.lim
    """,
    tags=("join_inner", "join_broadcast", "correlated_subquery", "groupby"),
)
def join_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped correlated-subquery decorrelation: the
    per-part average-quantity threshold is an aggregate of the SAME
    fact table, joined back — the standard rewrite Spark's optimizer
    produces for correlated scalar subqueries, written explicitly so
    the plan is visible.  l_quantity is integral and counts are small,
    so avg (exact int sum / count) and the 0.2× threshold are
    bit-deterministic across engines.  Part is dimension-side
    (broadcast) and ALSO pre-filters the threshold aggregate — at
    100 TB the per-part average is only computed for the brand's ~3%
    of parts, not the whole fact table (the oracle aggregates all
    parts; unused thresholds don't change the result)."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    brand_parts = part.where(F.col("p_brand") == "Brand#13")
    thresh = (
        lineitem.join(
            F.broadcast(brand_parts.select(F.col("p_partkey").alias("t_partkey"))),
            F.col("t_partkey") == F.col("l_partkey"),
        )
        .groupBy("t_partkey")
        .agg((F.avg("l_quantity") * 0.2).alias("lim"))
    )
    return (
        lineitem.join(
            F.broadcast(brand_parts),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(thresh, F.col("t_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("lim"))
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.round(F.sum(cents("l_extendedprice")) / 7.0, 2).alias("avg_yearly_cents"),
        )
    )


@query(
    "join_asof_forward_tolerance",
    oracle="""
    SELECT p.event_id,
           CASE WHEN epoch_ms(c.ts) - epoch_ms(p.ts) <= 600000
                THEN c.event_id END AS next_click_id,
           CASE WHEN epoch_ms(c.ts) - epoch_ms(p.ts) <= 600000
                THEN epoch_ms(c.ts) - epoch_ms(p.ts) END AS wait_ms
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts >= p.ts
    """,
    tags=("join_asof", "asof_forward", "asof_tolerance"),
)
def join_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of with tolerance (merge_asof parity, engine
    addition): for every purchase, the user's NEXT click — nulled when
    it comes more than 10 minutes later (nearest-then-bound, not
    any-within-bound).  Same union+one-window plan as backward, frame
    flipped to unbounded-following.  The oracle takes DuckDB's forward
    ASOF (c.ts >= p.ts) and applies the identical tolerance mask."""
    events = _t(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase")
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("next_click_id")
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_prefix="m_",
        direction="forward",
        tolerance_ms=600_000,
    )
    ems = lambda c: (F.unix_micros(F.col(c)) / 1000).cast("long")  # noqa: E731
    return out.select(
        "event_id",
        F.col("m_next_click_id").alias("next_click_id"),
        (ems("m_ts") - ems("ts")).alias("wait_ms"),
    )


@query(
    "join_fuzzy_blocked_linkage",
    oracle="""
    WITH registry AS (
      SELECT p_partkey + 100000 AS reg_id,
             CASE WHEN p_partkey % 3 = 0
                  THEN concat(substr(p_name, 1, 4), 'x', substr(p_name, 6))
                  ELSE p_name END AS reg_name
      FROM part WHERE p_partkey < 300
    )
    SELECT p.p_partkey, r.reg_id,
           levenshtein(lower(trim(p.p_name)), lower(trim(r.reg_name))) AS edit_distance
    FROM (SELECT p_partkey, p_name FROM part WHERE p_partkey < 300) p
    JOIN registry r
      ON substr(lower(trim(p.p_name)), 1, 3) = substr(lower(trim(r.reg_name)), 1, 3)
    WHERE levenshtein(lower(trim(p.p_name)), lower(trim(r.reg_name))) <= 1
    """,
    tags=("join_fuzzy", "blocking", "record_linkage", "levenshtein"),
)
def join_fuzzy_blocked_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (entity resolution) as blocking + verify
    (operators/joins.fuzzy_blocked_join): a 'registry' with planted
    single-character corruptions (every third name, at position 5 —
    outside the block prefix) links back to the clean parts by
    3-char-block equi-join + levenshtein <= 1.  The quadratic
    edit-distance work runs only inside blocks; the one shuffle is the
    block-key hash join.  Both engines compute the identical integer
    distances, so the pair set hash-matches exactly."""
    from mo_etl_spark.operators.joins import fuzzy_blocked_join

    part = _t(spark, sf_dir, "part").where(F.col("p_partkey") < 300)
    registry = part.select(
        (F.col("p_partkey") + 100000).alias("reg_id"),
        F.when(
            F.col("p_partkey") % 3 == 0,
            F.concat(
                F.substring("p_name", 1, 4), F.lit("x"), F.expr("substring(p_name, 6)")
            ),
        ).otherwise(F.col("p_name")).alias("reg_name"),
    )
    out = fuzzy_blocked_join(
        part.select("p_partkey", "p_name"),
        registry,
        left_key="p_name",
        right_key="reg_name",
        block_chars=3,
        max_distance=1,
    )
    return out.select("p_partkey", "reg_id", "edit_distance")


@query(
    "join_salted_skew_cohorts",
    oracle="""
    WITH profile AS (
      SELECT DISTINCT user_id, user_id % 5 AS cohort FROM events
    )
    SELECT p.cohort, count(*) AS n_events,
           sum(CAST(round(e.value*100) AS BIGINT)) AS total_cents
    FROM events e JOIN profile p ON e.user_id = p.user_id
    GROUP BY p.cohort
    """,
    tags=("join_inner", "skew_salting", "join_salted"),
)
def join_salted_skew_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicated join (operators/skew.salted_join): events'
    user_id histogram is spiky, so a plain shuffle join puts every hot
    user in one task.  The big side gets a deterministic row-hash salt,
    the profile side is replicated once per salt, and the join runs on
    (user_id, salt) — the hot key's rows land in 8 tasks instead of 1.
    The oracle is the UNSALTED join, so the hash match proves salting
    is result-invariant (the point of the rewrite).  With a truly
    dimension-sized small side, F.broadcast alone is the better plan;
    salting is for the small-but-not-broadcastable case."""
    prepare(spark)
    from mo_etl_spark.operators.skew import salted_join

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", cents("value").alias("value_cents")
    )
    profile = (
        e.select("user_id")
        .distinct()
        .withColumn("cohort", F.col("user_id") % 5)
    )
    joined = salted_join(e, profile, on=["user_id"], n_salts=8, how="inner")
    return joined.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value_cents").alias("total_cents"),
    )


@query(
    "etl_golden_record",
    oracle="""
    WITH RECURSIVE
    registry AS (
      SELECT p_partkey + 100000 AS rec_id,
             CASE WHEN p_partkey % 3 = 0
                  THEN concat(substr(p_name, 1, 4), 'x', substr(p_name, 6))
                  ELSE p_name END AS name,
             'registry' AS src,
             CAST(round(p_retailprice * 100) AS BIGINT) - 7 AS price_cents
      FROM part WHERE p_partkey < 300
    ),
    master AS (
      SELECT p_partkey AS rec_id, p_name AS name, 'master' AS src,
             CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
      FROM part WHERE p_partkey < 300
    ),
    universe AS (SELECT * FROM master UNION ALL SELECT * FROM registry),
    pairs AS (
      SELECT m.rec_id AS id_a, r.rec_id AS id_b
      FROM master m JOIN registry r
        ON substr(lower(trim(m.name)), 1, 3) = substr(lower(trim(r.name)), 1, 3)
      WHERE levenshtein(lower(trim(m.name)), lower(trim(r.name))) <= 1
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT s AS id, s AS peer FROM edges
      UNION
      SELECT r.id, e.d AS peer FROM reach r JOIN edges e ON e.s = r.peer
    ),
    comp AS (SELECT id, min(peer) AS golden_id FROM reach GROUP BY id)
    SELECT c.golden_id,
           count(*) AS n_members,
           count(DISTINCT u.src) AS n_sources,
           min(u.name) AS canonical_name,
           max(u.price_cents) AS best_price_cents
    FROM comp c JOIN universe u ON u.rec_id = c.id
    GROUP BY c.golden_id
    """,
    tags=("golden_record", "survivorship", "record_linkage", "connected_components",
          "cdc_merge", "join_fuzzy"),
)
def etl_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record SURVIVORSHIP — the stage entity resolution runs
    AFTER linkage: matched records collapse into one canonical row per
    entity.  Universe = clean master ∪ planted-corruption registry
    (same construction as join_fuzzy_blocked_linkage, plus a -7-cent
    price skew on the registry side); pairs from the blocked
    levenshtein join feed connected components (operators/
    dedup.connected_components — min-label + pointer jumping), and
    survivorship rules are all order-insensitive aggregates: golden id
    = min member id, canonical name = lexicographic min (corruption
    'x' sorts above the original lowercase letters it replaces —
    deterministic either way), best price = max across sources.  The
    oracle replays linkage + closure + survivorship declaratively
    (recursive CTE)."""
    from mo_etl_spark.operators.dedup import connected_components
    from mo_etl_spark.operators.joins import fuzzy_blocked_join

    part = _t(spark, sf_dir, "part").where(F.col("p_partkey") < 300)
    master = part.select(
        F.col("p_partkey").alias("rec_id"),
        F.col("p_name").alias("name"),
        F.lit("master").alias("src"),
        cents("p_retailprice").alias("price_cents"),
    )
    registry = part.select(
        (F.col("p_partkey") + 100000).alias("rec_id"),
        F.when(
            F.col("p_partkey") % 3 == 0,
            F.concat(
                F.substring("p_name", 1, 4), F.lit("x"), F.expr("substring(p_name, 6)")
            ),
        ).otherwise(F.col("p_name")).alias("name"),
        F.lit("registry").alias("src"),
        (cents("p_retailprice") - 7).alias("price_cents"),
    )
    universe = master.unionByName(registry)
    pairs = fuzzy_blocked_join(
        master.select("rec_id", "name"),
        registry.select(F.col("rec_id").alias("reg_id"), F.col("name").alias("reg_name")),
        left_key="name",
        right_key="reg_name",
        block_chars=3,
        max_distance=1,
    ).select(F.col("rec_id").alias("id_a"), F.col("reg_id").alias("id_b"))
    comp = connected_components(pairs)
    return (
        comp.join(universe, comp.id == universe.rec_id)
        .groupBy(F.col("component").alias("golden_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.countDistinct("src").alias("n_sources"),
            F.min("name").alias("canonical_name"),
            F.max("price_cents").alias("best_price_cents"),
        )
    )


@query(
    "setop_except_all_multiset",
    oracle="""
    SELECT p_size FROM part WHERE p_brand = 'Brand#11'
    EXCEPT ALL
    SELECT p_size FROM part WHERE p_brand = 'Brand#12'
    """,
    tags=("except_all", "except", "multiset"),
)
def setop_except_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — MULTISET difference (bag semantics): a value
    occurring 5 times left and 2 times right survives 3 times, where
    EXCEPT DISTINCT (setop_except_brand_sizes) would drop it entirely.
    Catalyst plans df.exceptAll as a count-annotated join+generate
    (no row-identity tracking needed) — the semantics mo-dots list
    subtraction implies for repeated elements (u)."""
    part = _t(spark, sf_dir, "part")
    return part.where(F.col("p_brand") == "Brand#11").select("p_size").exceptAll(
        part.where(F.col("p_brand") == "Brand#12").select("p_size")
    )


@query(
    "setop_intersect_all_multiset",
    oracle="""
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("intersect_all", "intersect", "multiset"),
)
def setop_intersect_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection: each priority value
    survives min(left_count, right_count) times, so the result SIZE
    carries frequency information the DISTINCT variant erases."""
    o = _t(spark, sf_dir, "orders")
    return o.where(F.col("o_orderstatus") == "F").select("o_orderpriority").intersectAll(
        o.where(F.col("o_orderstatus") == "O").select("o_orderpriority")
    )


@query(
    "qa_k_anonymity",
    oracle="""
    WITH quasi AS (
        SELECT c_nationkey,
               c_mktsegment,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
               count(*) AS group_size
        FROM customer
        GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, c_mktsegment, bal_band, group_size,
           (group_size < 5) AS reidentification_risk
    FROM quasi
    """,
    tags=("k_anonymity", "privacy", "data_qa", "groupby"),
)
def qa_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-ANONYMITY audit (Sweeney '02) — the privacy gate a dataset
    passes before leaving the trust boundary: group sizes over the
    quasi-identifier tuple (nation, market segment, $1000 balance
    band); any group smaller than k=5 is a re-identification risk the
    release process must suppress or generalize.  One hash-agg
    shuffle; at 100 TB the quasi-identifier cube stays
    cardinality-bounded (product of attribute domains), not
    fact-bounded.  floor() on the band keeps the banding integer-exact
    for negative balances (truncation would round toward zero and
    disagree between engines)."""
    c = _t(spark, sf_dir, "customer")
    quasi = (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).alias("group_size"))
    )
    return quasi.select(
        "c_nationkey",
        "c_mktsegment",
        "bal_band",
        "group_size",
        (F.col("group_size") < 5).alias("reidentification_risk"),
    )


@query(
    "join_null_safe_eq",
    oracle="""
    WITH l AS (
        SELECT event_id,
               CASE WHEN user_id % 10 = 0 THEN NULL ELSE user_id % 7 END AS grp
        FROM events
    ),
    r AS (
        SELECT g AS grp, concat('seg_', coalesce(CAST(g AS VARCHAR), 'null')) AS label
        FROM (SELECT DISTINCT CASE WHEN user_id % 10 = 0 THEN NULL
                                   ELSE user_id % 7 END AS g FROM events)
    )
    SELECT r.label, count(*) AS n
    FROM l JOIN r ON l.grp IS NOT DISTINCT FROM r.grp
    GROUP BY r.label
    """,
    tags=("join_null_safe", "join_inner", "null", "groupby"),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-SAFE equi join (<=> / IS NOT DISTINCT FROM): rows whose
    join key is NULL still match the NULL dimension row — the jx
    semantics for missing values in a groupby-join (u, mo-dots: Null
    is a VALUE, not contagion), and the SQL footgun where a plain `=`
    silently drops a tenth of the fact table.  Catalyst plans <=> as
    a hash join on a null-safe key (EqualNullSafe), NOT a nested
    loop — same shuffle shape as the plain join."""
    ev = _t(spark, sf_dir, "events")
    grp = F.when(F.col("user_id") % 10 == 0, None).otherwise(F.col("user_id") % 7)
    left = ev.select("event_id", grp.alias("grp"))
    right = (
        ev.select(grp.alias("grp"))
        .distinct()
        .select(
            "grp",
            F.concat(
                F.lit("seg_"), F.coalesce(F.col("grp").cast("string"), F.lit("null"))
            ).alias("label"),
        )
    )
    return (
        left.join(right, left.grp.eqNullSafe(right.grp))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
