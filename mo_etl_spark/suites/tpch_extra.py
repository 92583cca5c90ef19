"""TPC-H-shaped analog queries, second batch (SURVEY.md §2.3/§2.4).

Capability parity: the SQL surface entering the mo-* ecosystem through
mo-sql-parsing (u) — EXISTS / NOT EXISTS subqueries, scalar-subquery
thresholds, HAVING, disjunctive multi-column predicates, two-level
aggregation — adapted to the testdata's TPC-H-subset columns
(FIXTURES.md: no l_commitdate/l_receiptdate/l_shipmode/partsupp, so
Q4/Q12's late-delivery predicate is re-expressed on
``l_shipdate − o_orderdate`` and Q9's supplycost on ``p_retailprice``).

Spark-first notes per query; all money aggregates use the exact
integer-cents convention from functions/numeric.py so double rounding
can never diverge between Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mo_etl_spark.functions.numeric import cents
from mo_etl_spark.registry import query
from mo_etl_spark.session import prepare
from mo_etl_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, *names: str):
    prepare(spark)
    dfs = [load_table(spark, sf_dir, n) for n in names]
    return dfs[0] if len(dfs) == 1 else dfs


@query(
    "join_q4_priority_late_ship",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tags=("join_semi", "groupby", "exists_subquery"),
)
def join_q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped order-priority check: orders in a half-year
    window having at least one line shipped >60 days after the order
    date (the subset schema has no commit/receipt dates — FIXTURES.md).

    EXISTS compiles to a LEFT SEMI join on orderkey.  The correlated
    inequality references the outer column, so it rides the join
    condition itself (mixed equi+theta semi join) — Spark executes the
    equi part as the shuffle key and the date comparison as a
    post-probe filter; at 100 TB both sides prune: the orders window
    filter pushes to its scan, and only matching orderkeys shuffle."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    return (
        o.join(
            lineitem,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "join_q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           year(l.l_shipdate) AS o_year,
           sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount*100) AS BIGINT))
               - 10 * CAST(round(p.p_retailprice*100) AS BIGINT)
                    * CAST(l.l_quantity AS BIGINT)) AS profit_c4
    FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    tags=("join_inner", "join_broadcast", "groupby"),
)
def join_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped profit by supplier nation and ship year.  The
    subset schema has no partsupp.ps_supplycost, so unit cost is
    modeled as p_retailprice/10 (FIXTURES.md) — the join/agg shape is
    identical.  All three dimensions (part after its LIKE filter,
    supplier, nation) broadcast; the only shuffle is the final 2-key
    hash aggregate.  Integer-cents arithmetic throughout: revenue is
    dollars×1e4 (cents × percent-cents) and unit cost retailprice/10
    is retail_cents×10×qty at the same 1e4 scale — the profit sum
    stays an exact BIGINT in both engines, never a float."""
    lineitem, part, supplier, nation = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    ep, disc = cents("l_extendedprice"), cents("l_discount")
    red = part.where(F.col("p_name").like("%red%"))
    profit = ep * (100 - disc) - (
        10 * cents("p_retailprice") * F.col("l_quantity").cast("bigint")
    )
    return (
        lineitem.join(F.broadcast(red), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.sum(profit).alias("profit_c4"))
    )


@query(
    "join_q10_returned_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS revenue_c4
    FROM customer c
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue_c4 DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("join_inner", "join_broadcast", "groupby", "top_k"),
)
def join_q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped top-20 customers by returned-item revenue in
    one order year.  The returnflag filter applies at the lineitem
    scan (pushed to parquet), the orderdate filter at the orders scan;
    nation broadcasts.  Sort is TakeOrderedAndProject (top-k, no full
    sort), with the custkey tie-break making the LIMIT deterministic —
    exact-integer revenue means ties are real and must be broken for
    cross-engine hash parity."""
    customer, orders, lineitem, nation = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    ep, disc = cents("l_extendedprice"), cents("l_discount")
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = lineitem.where(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(ep * (100 - disc)).alias("revenue_c4"))
        .orderBy(F.desc("revenue_c4"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "join_q12_late_ship_by_status",
    oracle="""
    SELECT l.l_linestatus,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    tags=("join_inner", "groupby", "conditional_agg"),
)
def join_q12_late_ship_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped priority split of late shipments (the subset
    schema has no l_shipmode/l_commitdate — grouped by l_linestatus
    with the >60-day ship delay standing in for the receipt/commit
    comparison).  The conditional counts are map-side CASE sums inside
    one hash aggregate — one shuffle on orderkey for the join, one on
    the single group key."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "join_q13_order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join_left", "groupby", "two_level_agg"),
)
def join_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped customer order-count distribution (the join
    predicate filters urgent orders INSIDE the left join, preserving
    zero-order customers — the classic outer-join-with-ON-filter
    shape the subset schema can express without o_comment).
    count(o_orderkey) counts only matched rows, so no-order customers
    land in the c_count=0 bucket.  Two-level aggregation: the first
    groupBy shuffles on custkey, the second on the tiny c_count
    domain — AQE coalesces the second exchange to a handful of
    partitions."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders.where(F.col("o_orderpriority") != "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "join_q14_conditional_share",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN CAST(round(l.l_extendedprice*100) AS BIGINT)
                                   * (100 - CAST(round(l.l_discount*100) AS BIGINT))
                              ELSE 0 END)
                   / sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount*100) AS BIGINT))),
             6) AS promo_share_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    tags=("join_inner", "join_broadcast", "conditional_agg"),
)
def join_q14_conditional_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promo revenue share for one ship month.  Both
    sums are exact BIGINTs (integer-cents), so the final division is
    one double op on identical operands in both engines — the round(6)
    then matches bit-for-bit.  Part broadcasts; the month filter
    pushes to the lineitem scan, and the whole query is a single
    global aggregate (no group key → one-row partial+final agg, no
    data shuffle beyond 32 partial rows)."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    ep, disc = cents("l_extendedprice"), cents("l_discount")
    rev = ep * (100 - disc)
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
                / F.sum(rev),
                6,
            ).alias("promo_share_pct")
        )
    )


@query(
    "join_q18_large_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(round(o.o_totalprice*100) AS BIGINT) AS total_c2,
           sum(l.l_quantity) AS sum_qty
    FROM customer c
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250
    )
    GROUP BY 1, 2, 3, 4
    """,
    tags=("join_inner", "join_semi", "groupby", "having"),
)
def join_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped large-volume orders: orders whose total line
    quantity exceeds 250 (99th percentile of this data), joined back
    to customer.  The IN-subquery (HAVING over the fact table)
    compiles to a semi join of lineitem against its own aggregate —
    Spark shares the shuffle key (orderkey) between the aggregate,
    the semi join, and the final join, so the fact table partitioning
    is reused rather than re-shuffled.  sum(l_quantity) is a sum of
    small integral doubles — exact in IEEE754, safe to hash-compare."""
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .where(F.col("s") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        lineitem.join(big, F.col("l_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            cents("o_totalprice").alias("total_c2"),
        )
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )


@query(
    "join_q19_disjunctive_revenue",
    oracle="""
    SELECT sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS revenue_c4,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
    tags=("join_inner", "join_broadcast", "disjunctive_filter"),
)
def join_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped disjunctive-predicate revenue (three
    brand/size/quantity arms OR-ed together, columns from BOTH join
    sides in every arm).  Catalyst extracts the common l_quantity
    bounds (1..50 — vacuous here) and the per-side conjuncts it can:
    the brand∈{...} ∪ size∈{...} envelope pushes to the part scan
    while the full disjunction evaluates post-join.  Part broadcasts,
    so the disjunction never forces a shuffle."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    ep, disc = cents("l_extendedprice"), cents("l_discount")
    arm = lambda b, s0, s1, q0, q1: (  # noqa: E731
        (F.col("p_brand") == b)
        & F.col("p_size").between(s0, s1)
        & F.col("l_quantity").between(q0, q1)
    )
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(
            arm("Brand#1", 1, 15, 1, 20)
            | arm("Brand#2", 10, 30, 10, 40)
            | arm("Brand#3", 20, 50, 20, 50)
        )
        .agg(
            F.sum(ep * (100 - disc)).alias("revenue_c4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "join_q22_idle_rich_customers",
    oracle="""
    WITH threshold AS (
      SELECT avg(c_acctbal) AS lim FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name AS nation,
           count(*) AS numcust,
           sum(CAST(round(c.c_acctbal*100) AS BIGINT)) AS totacctbal_c2
    FROM customer c
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      CROSS JOIN threshold t
    WHERE c.c_acctbal > t.lim
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY n.n_name
    """,
    tags=("join_anti", "join_broadcast", "scalar_subquery", "groupby"),
)
def join_q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped dormant high-balance accounts: customers above
    the positive-balance average with no order since 2001, summed per
    nation (the subset schema has no c_phone, so the country-code
    grouping becomes the nation dimension — FIXTURES.md).

    The scalar-subquery threshold is computed once and broadcast as a
    single-row cross join (Spark literally broadcasts one row — no
    collect() on the driver, so the plan stays fully lazy and
    cluster-side at 100 TB).  NOT EXISTS with its date filter pushed
    into the subquery scan compiles to a LEFT ANTI join on custkey.
    avg() divides the same exact integer-cent sum by the same count in
    both engines → bit-identical IEEE double threshold."""
    customer, nation, orders = _t(spark, sf_dir, "customer", "nation", "orders")
    lim = (
        customer.where(F.col("c_acctbal") > 0)
        .agg((F.avg("c_acctbal")).alias("lim"))
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return (
        customer.crossJoin(F.broadcast(lim))
        .where(F.col("c_acctbal") > F.col("lim"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(cents("c_acctbal")).alias("totacctbal_c2"),
        )
    )


@query(
    "join_q2_min_balance_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT ps.l_partkey AS p_key, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM ps
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT c.p_key AS p_partkey, c.s_suppkey, c.s_name, c.n_name,
           CAST(round(c.s_acctbal*100) AS BIGINT) AS acctbal_c2
    FROM cand c
      JOIN (SELECT p_key, min(s_acctbal) AS m FROM cand GROUP BY p_key) t
        ON c.p_key = t.p_key AND c.s_acctbal = t.m
    """,
    tags=("join_inner", "join_broadcast", "correlated_subquery", "argmin"),
)
def join_q2_min_balance_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped argmin: for every part, the EUROPE supplier with
    the minimum account balance among suppliers that actually shipped
    it (the subset schema has no partsupp/ps_supplycost — the
    lineitem-derived part↔supplier association stands in, FIXTURES.md).

    The correlated MIN subquery decorrelates to a self-join of the
    candidate set against its own per-part aggregate — both branches
    share the part-key shuffle, and supplier/nation/region ride
    broadcasts into the candidate build.  The equality rejoin is on the
    raw stored double (no arithmetic), so cross-engine equality is
    exact; ties (two suppliers at the same min balance) are all kept,
    same as the reference query."""
    lineitem, supplier, nation, region = _t(
        spark, sf_dir, "lineitem", "supplier", "nation", "region"
    )
    ps = lineitem.select("l_partkey", "l_suppkey").distinct()
    eu = (
        supplier.join(
            F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .where(F.col("r_name") == "EUROPE")
    )
    cand = ps.join(F.broadcast(eu), F.col("s_suppkey") == F.col("l_suppkey")).select(
        F.col("l_partkey").alias("p_key"), "s_suppkey", "s_name", "s_acctbal", "n_name"
    )
    mins = cand.groupBy(F.col("p_key").alias("m_key")).agg(F.min("s_acctbal").alias("m"))
    return (
        cand.join(
            mins,
            (F.col("p_key") == F.col("m_key")) & (F.col("s_acctbal") == F.col("m")),
        )
        .select(
            F.col("p_key").alias("p_partkey"),
            "s_suppkey",
            "s_name",
            "n_name",
            cents("s_acctbal").alias("acctbal_c2"),
        )
    )


@query(
    "join_q8_market_share",
    oracle="""
    SELECT year(o.o_orderdate) AS o_year,
           round(CAST(sum(CASE WHEN ns.n_name = 'NATION_1'
                          THEN CAST(round(l.l_extendedprice*100) AS BIGINT)
                               * (100 - CAST(round(l.l_discount*100) AS BIGINT))
                          ELSE 0 END) AS DOUBLE)
                 / sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount*100) AS BIGINT))),
                 6) AS mkt_share
    FROM lineitem l
      JOIN orders o    ON o.o_orderkey = l.l_orderkey
      JOIN customer c  ON c.c_custkey = o.o_custkey
      JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
      JOIN region r    ON r.r_regionkey = nc.n_regionkey
      JOIN supplier s  ON s.s_suppkey = l.l_suppkey
      JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'EUROPE'
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("join_inner", "join_broadcast", "conditional_agg"),
)
def join_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped market share: NATION_1 suppliers' slice of all
    revenue flowing to EUROPE customers, per order year.  Six-table
    join where only lineitem⋈orders shuffles — customer rides a
    broadcast too at this scale (at 100 TB customer would be the
    second shuffle; the plan degrades gracefully because nothing here
    forces it).  Numerator and denominator are exact integer-cent
    sums aggregated in ONE pass (conditional CASE inside the same
    hash aggregate — not two scans), so the final per-year division
    is one double op on identical operands in both engines."""
    lineitem, orders, customer, nation, region, supplier = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region", "supplier"
    )
    ep, disc = cents("l_extendedprice"), cents("l_discount")
    rev = ep * (100 - disc)
    nc = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    ns = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    return (
        lineitem.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nc), F.col("c_nk") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("c_rk"))
        .where(F.col("r_name") == "EUROPE")
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("s_nk") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(F.lit(0))
                ).cast("double")
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "join_q11_important_part_value",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             sum(CAST(round(l_extendedprice*100) AS BIGINT)
                 * CAST(l_quantity AS BIGINT)) AS value_c2
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, value_c2
    FROM v
    WHERE value_c2 > (SELECT 0.0007 * sum(value_c2) FROM v)
    """,
    tags=("groupby", "scalar_subquery", "having"),
)
def join_q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped 'important stock' filter: parts whose shipped
    value exceeds 0.07% of the total shipped value (partsupp's
    availqty×supplycost becomes lineitem's quantity×price —
    FIXTURES.md).  The HAVING-against-global-scalar decorrelates to
    the per-part aggregate cross-joined with its own one-row grand
    total — Spark computes the grand total as a second aggregation of
    the ALREADY-GROUPED 2000-row result (re-aggregation, not a second
    fact-table scan) and broadcasts the single row.  Both sums are
    exact BIGINTs; the 0.0007× threshold is one double multiply of
    identical operands in either engine."""
    lineitem = _t(spark, sf_dir, "lineitem")
    v = lineitem.groupBy("l_partkey").agg(
        F.sum(
            cents("l_extendedprice") * F.col("l_quantity").cast("bigint")
        ).alias("value_c2")
    )
    total = v.agg((F.lit(0.0007) * F.sum("value_c2")).alias("lim"))
    return (
        v.crossJoin(F.broadcast(total))
        .where(F.col("value_c2") > F.col("lim"))
        .select("l_partkey", "value_c2")
    )


@query(
    "join_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(round(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l_discount*100) AS BIGINT))) AS total_rev_c4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev_c4
    FROM supplier s JOIN rev r ON r.l_suppkey = s.s_suppkey
    WHERE r.total_rev_c4 = (SELECT max(total_rev_c4) FROM rev)
    """,
    tags=("groupby", "scalar_subquery", "join_broadcast"),
)
def join_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped top supplier: the supplier(s) with maximum
    revenue in one ship quarter, via the revenue 'view' compared
    against its own max (all qualifying ties kept — with exact
    integer-cent revenue, equality is well-defined cross-engine,
    which is exactly why Q15 is dangerous with float sums).

    Referencing the revenue view twice (once for max, once to filter)
    would make Catalyst duplicate the subtree and scan lineitem twice;
    instead the global max is an unpartitioned window over the ALREADY
    AGGREGATED relation, so the single-partition exchange only ever
    carries one row per supplier (a few KB even at 100 TB fact scale)
    and lineitem is scanned exactly once.  Supplier attaches by
    broadcast."""
    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    from pyspark.sql import Window

    ep, disc = cents("l_extendedprice"), cents("l_discount")
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(ep * (100 - disc)).alias("total_rev_c4"))
    )
    return (
        rev.withColumn("mx", F.max("total_rev_c4").over(Window.partitionBy()))
        .where(F.col("total_rev_c4") == F.col("mx"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev_c4")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT sum(CAST(round(l_extendedprice*100) AS BIGINT)
               * CAST(round(l_discount*100) AS BIGINT)) AS revenue_c4,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
    tags=("filter", "global_agg", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped forecast revenue change: a pure scan-filter-sum
    with no join at all.  All three predicates (ship year, discount
    band, quantity cap) push to the parquet scan as row-group filters,
    so at 100 TB this reads only the row groups whose min/max stats
    overlap one ship year — the canonical pushdown showcase.  The
    discount band compares integer cents (round(disc*100)) on BOTH
    sides so no 0.05000001-style float edge can diverge between
    engines; revenue is the exact cents×cents BIGINT sum."""
    lineitem = _t(spark, sf_dir, "lineitem")
    disc = cents("l_discount")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & disc.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(cents("l_extendedprice") * disc).alias("revenue_c4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "join_q16_supplier_count",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                               WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    tags=("join_anti", "join_broadcast", "count_distinct", "groupby"),
)
def join_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped supplier diversity count per part attribute
    triple (the subset schema has no partsupp — the part↔supplier
    association is derived from lineitem; no s_comment, so the
    complaint exclusion becomes negative-balance suppliers,
    FIXTURES.md).

    NOT IN over a non-null key column compiles to a LEFT ANTI join
    against the (tiny, broadcast) exclusion set — safe here because
    s_suppkey is never null; with nullable keys NOT IN would need the
    null-aware anti-join form.  The DISTINCT (partkey, suppkey)
    projection collapses the fact table BEFORE the dimension join, so
    the expensive count-distinct aggregates ~1 row per association
    rather than ~4 lineitems per association; part broadcasts after
    its selective brand/type/size filter."""
    lineitem, part, supplier = _t(spark, sf_dir, "lineitem", "part", "supplier")
    ps = lineitem.select("l_partkey", "l_suppkey").distinct()
    bad = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    p = part.where(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    return (
        ps.join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "join_q20_excess_shippers",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             sum(l_quantity) AS qty_all,
             sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                       AND l_shipdate <  TIMESTAMP '1998-01-01'
                      THEN l_quantity ELSE 0 END) AS qty_1997
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE 'red%')
      GROUP BY 1, 2
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM shipped
                          WHERE qty_1997 > 0.5 * qty_all)
    """,
    tags=("join_semi", "join_broadcast", "correlated_subquery", "conditional_agg"),
)
def join_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-shaped correlated-threshold semi join: suppliers for
    whom some 'red' part's 1997 shipments exceed half of ALL their
    shipments of that part (no partsupp.ps_availqty in the subset
    schema, so the 0.5×sum(l_quantity) correlated subquery compares
    against the supplier's own all-time quantity — same decorrelation
    shape, FIXTURES.md).

    The correlated scalar subquery decorrelates into ONE conditional
    aggregate per (part, supplier) — both the year slice and the
    all-time total come out of a single grouped pass over the
    red-part lineitems (no second scan, no re-shuffle).  The IN
    becomes a LEFT SEMI join to supplier; nation broadcasts.
    l_quantity values are small integral doubles and 0.5 is a power
    of two, so qty_1997 > 0.5*qty_all is exact in IEEE754 in both
    engines."""
    lineitem, part, supplier, nation = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    red = part.where(F.col("p_name").like("red%")).select("p_partkey")
    in_1997 = (
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = (
        lineitem.join(F.broadcast(red), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("l_quantity").alias("qty_all"),
            F.sum(F.when(in_1997, F.col("l_quantity")).otherwise(F.lit(0.0))).alias(
                "qty_1997"
            ),
        )
    )
    excess = (
        shipped.where(F.col("qty_1997") > 0.5 * F.col("qty_all"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(excess, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


@query(
    "join_q21_waiting_suppliers",
    oracle="""
    WITH flags AS (
      SELECT l.l_orderkey, l.l_suppkey,
             max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY 1, 2
    ),
    w AS (
      SELECT l_orderkey, l_suppkey, late,
             count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
             sum(late) OVER (PARTITION BY l_orderkey) AS n_late
      FROM flags
    )
    SELECT s.s_name, count(*) AS numwait
    FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey
    WHERE w.late = 1 AND w.n_supp > 1 AND w.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 25
    """,
    tags=("join_inner", "window_agg", "groupby", "top_k"),
)
def join_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped 'suppliers who kept orders waiting': on
    finalized multi-supplier orders, the supplier who was the ONLY
    late one (ship >90 days after order date stands in for the
    receipt-vs-commit comparison the subset schema lacks).

    Classic Q21 is EXISTS + NOT EXISTS self-joins — three passes over
    the fact table.  Spark-first it collapses to ONE pass: a grouped
    late-flag per (order, supplier), then per-order supplier/late
    counts as window aggregates OVER THE SAME orderkey partitioning
    (the window exchange reuses the groupBy shuffle — .explain shows
    a single Exchange), then the only-late-supplier filter.  Supplier
    attaches by broadcast and the final top-25 is
    TakeOrderedAndProject with s_name tie-break for determinism."""
    lineitem, orders, supplier = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    from pyspark.sql import Window

    flags = (
        lineitem.join(
            orders.where(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    return (
        flags.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .where((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )
