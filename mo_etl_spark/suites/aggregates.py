"""M3 aggregation surface (SURVEY.md §2.4): every jx aggregate plus
the SQL cube/rollup/grouping-sets surface from mo-sql-parsing (u).

Float-parity strategy per query noted inline; variance is computed by
explicit integer-cents formula so both engines do the identical double
ops (var_samp built-ins use different online algorithms — SURVEY §7.3).
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
    "agg_global_lineitem",
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS price_cents
    FROM lineitem
    """,
    tags=("groupby", "cardinality"),
)
def agg_global_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-groupby) aggregation — jx select-with-aggregate and no
    edges (u, jx_python jx.run)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.sum(cents("l_extendedprice")).alias("price_cents"),
    )


@query(
    "agg_stats_per_nation",
    oracle="""
    SELECT s_nationkey,
           count(s_acctbal) AS n,
           sum(CAST(round(s_acctbal*100) AS BIGINT)) AS sum_cents,
           round(CAST(sum(CAST(round(s_acctbal*100) AS BIGINT)) AS DOUBLE)/100.0/count(s_acctbal), 6) AS avg_bal,
           min(s_acctbal) AS min_bal,
           max(s_acctbal) AS max_bal,
           round((CAST(sum(CAST(round(s_acctbal*100) AS BIGINT) * CAST(round(s_acctbal*100) AS BIGINT)) AS DOUBLE)
                  - CAST(sum(CAST(round(s_acctbal*100) AS BIGINT)) AS DOUBLE)
                    * CAST(sum(CAST(round(s_acctbal*100) AS BIGINT)) AS DOUBLE) / count(s_acctbal))
                 / (count(s_acctbal) - 1) / 10000.0, 4) AS var_bal
    FROM supplier
    GROUP BY s_nationkey
    HAVING count(s_acctbal) > 1
    """,
    tags=("stats", "variance"),
)
def agg_stats_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx 'stats' aggregate expanded to columns (u, mo_math.stats.Stats
    z-moment accumulation: n, Σx, Σx² — reproduced here as exact
    integer sums; sample variance from the moments)."""
    supplier = _t(spark, sf_dir, "supplier")
    c = cents("s_acctbal")
    n = F.count("s_acctbal")
    sum_c = F.sum(c)
    sum_sq = F.sum(c * c)
    var = F.round(
        (sum_sq.cast("double") - sum_c.cast("double") * sum_c.cast("double") / n)
        / (n - 1)
        / 10000.0,
        4,
    )
    return (
        supplier.groupBy("s_nationkey")
        .agg(
            n.alias("n"),
            sum_c.alias("sum_cents"),
            F.round(sum_c.cast("double") / 100.0 / n, 6).alias("avg_bal"),
            F.min("s_acctbal").alias("min_bal"),
            F.max("s_acctbal").alias("max_bal"),
            var.alias("var_bal"),
        )
        .where(F.col("n") > 1)
    )


@query(
    "agg_percentiles_by_type",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75,
           round(median(value), 6) AS med
    FROM events
    GROUP BY event_type
    """,
    tags=("percentile", "median"),
)
def agg_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (jx 'percentile' aggregate (u,
    ActiveData aggs)); both engines use linear interpolation, rounded
    to absorb last-ulp interpolation differences."""
    events = _t(spark, sf_dir, "events")
    v = F.col("value")
    return events.groupBy("event_type").agg(
        F.round(F.percentile(v, F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile(v, F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile(v, F.lit(0.75)), 6).alias("p75"),
        F.round(F.median(v), 6).alias("med"),
    )


@query(
    "agg_union_set_per_user",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), '|') AS types,
           count(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    """,
    tags=("union", "list", "cardinality"),
)
def agg_union_set_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx 'union' aggregate — set of values seen (u, ActiveData) —
    array_sort(collect_set) for deterministic output (SURVEY §4.3).
    Serialized with array_join so the driver's pandas canonicalizer
    (which cannot sort ndarray cells) sees a plain string column."""
    events = _t(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), "|").alias("types"),
        F.countDistinct("event_type").alias("n_types"),
    )


@query(
    "agg_first_last_per_user",
    oracle="""
    SELECT user_id,
           arg_min(event_type, ts) AS first_type,
           arg_max(event_type, ts) AS last_type,
           count(*) AS n
    FROM events
    GROUP BY user_id
    """,
    tags=("first", "last"),
)
def agg_first_last_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx first/last aggregates under an explicit time order (u, jx
    aggs; nondeterministic without order — SURVEY §7.3): min_by/max_by,
    a single hash-agg pass, no window shuffle."""
    events = _t(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.min_by("event_type", "ts").alias("first_type"),
        F.max_by("event_type", "ts").alias("last_type"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_rollup_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus) AS g_status,
           grouping(o_orderpriority) AS g_priority,
           count(*) AS n,
           sum(CAST(round(o_totalprice*100) AS BIGINT)) AS total_cents
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("rollup", "grouping"),
)
def agg_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping indicators (SQL surface via mo-sql-parsing
    (u); Spark df.rollup)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("o_totalprice")).alias("total_cents"),
    )


@query(
    "agg_cube_lineitem_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_flag,
           grouping(l_linestatus) AS g_status,
           count(*) AS n,
           sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("cube", "grouping"),
)
def agg_cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the two flag columns (df.cube); sum_qty is integral
    doubles -> exact."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("sum_qty"),
    )


@query(
    "agg_grouping_sets_sql",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("grouping_sets", "sql"),
)
def agg_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS through the engine's SQL surface (spark.sql is the
    engine's SQL entry point — SURVEY.md §7.4: Spark IS the parser)."""
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_edges_month_cube",
    oracle="""
    WITH dom AS (
        SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
                                      TIMESTAMP '2001-09-01',
                                      INTERVAL 1 MONTH)) AS month
    ), agg AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               count(*) AS n,
               sum(CAST(round(o_totalprice*100) AS BIGINT)) AS total_cents
        FROM orders GROUP BY 1
    )
    SELECT dom.month, coalesce(agg.n, 0) AS n, agg.total_cents
    FROM dom LEFT JOIN agg USING (month)
    WHERE dom.month < TIMESTAMP '2001-09-01'
    """,
    tags=("edges", "cube", "time_domain"),
)
def agg_edges_month_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete calendar-month domain over the full o_orderdate span —
    the jx edges time domain (u, jx_base/domains.py) via the jx query
    runner; empty months still get n=0 rows."""
    from mo_etl_spark.jx import jx_run

    orders = _t(spark, sf_dir, "orders")
    return jx_run(
        {
            "from": "orders",
            "edges": [
                {
                    "name": "month",
                    "value": "o_orderdate",
                    "domain": {
                        "type": "time",
                        "min": "1995-01-01",
                        "max": "2001-09-01",
                        "interval": "month",
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
        tables={"orders": orders},
    )


@query(
    "agg_count_values_props",
    oracle="""
    SELECT json_extract_string(props, '$.k') AS k, count(*) AS n
    FROM events
    GROUP BY 1
    """,
    tags=("count_values", "json"),
)
def agg_count_values_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx count_values — per-value frequency (u, ActiveData), over a
    JSON-extracted key."""
    events = _t(spark, sf_dir, "events")
    return events.groupBy(
        F.get_json_object("props", "$.k").alias("k")
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "agg_approx_cardinality",
    oracle="""
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           true AS parts_ok,
           true AS orders_ok
    FROM lineitem
    """,
    tags=("cardinality", "approx"),
)
def agg_approx_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ cardinality — the scale path for jx 'cardinality'
    (the reference's ES-backed cardinality is approximate too (u)).
    DuckDB runs a different sketch, so the contract is the
    deterministic-assertion form: Spark computes BOTH the HLL++
    estimate and the exact count and emits ``within 5%`` booleans plus
    the exact counts; the oracle computes the exact side and the
    booleans as literals.  The estimate itself stays unit-tested."""
    li = _t(spark, sf_dir, "lineitem")

    def side(col: str, exact_name: str, ok_name: str) -> DataFrame:
        # dedup-then-count: a single-column distinct is a map-side
        # partial dedup (shuffles only uniques), and the HLL++ sketch
        # over the distinct set estimates the same cardinality — vs.
        # one agg with TWO countDistinct columns, which plans an
        # Expand (3x the input) and cost 9 s at sf0.1
        d = li.select(col).distinct()
        ex = F.count(F.lit(1))
        ap = F.approx_count_distinct(col, rsd=0.02)
        return d.agg(
            ex.alias(exact_name),
            (F.abs(ap - ex).cast("double") / ex.cast("double") <= 0.05).alias(ok_name),
        )

    parts = side("l_partkey", "exact_parts", "parts_ok")
    orders = side("l_orderkey", "exact_orders", "orders_ok")
    return parts.crossJoin(orders)


@query(
    "agg_salted_skew_sum",
    oracle="""
    SELECT event_type,
           sum(CAST(round(value*100) AS BIGINT)) AS total_cents,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("groupby", "skew_salting"),
)
def agg_salted_skew_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage aggregation (operators/skew.py): events has
    ~5 event types over 100k+ rows — the pathological hot-key shape at
    scale.  Stage 1 spreads each key over 16 salts; stage 2 carries 16
    rows per key.  Integer-cents sums make the result bit-identical to
    the direct groupBy oracle."""
    from mo_etl_spark.operators.skew import salted_sum_count

    events = _t(spark, sf_dir, "events")
    return salted_sum_count(
        events.select("event_type", cents("value").alias("vc")),
        keys=["event_type"],
        sums={"total_cents": F.sum("vc")},
        count_alias="n",
    )


@query(
    "agg_pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (o_orderstatus = 'F') AS f_n,
           count(*) FILTER (o_orderstatus = 'O') AS o_n,
           count(*) FILTER (o_orderstatus = 'P') AS p_n,
           coalesce(sum(CAST(round(o_totalprice*100) AS BIGINT))
                    FILTER (o_orderstatus = 'F'), 0) AS f_cents,
           coalesce(sum(CAST(round(o_totalprice*100) AS BIGINT))
                    FILTER (o_orderstatus = 'O'), 0) AS o_cents,
           coalesce(sum(CAST(round(o_totalprice*100) AS BIGINT))
                    FILTER (o_orderstatus = 'P'), 0) AS p_cents
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("pivot", "groupby", "conditional_agg"),
)
def agg_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — the cube/crosstab reshaping surface (jx cube results
    reshape a dimension into columns; SURVEY §1.3 cube formatter).
    ``pivot(col, values)`` with PINNED values: one fact scan, a
    map-side-combined aggregate on (group, pivot) keys, then a tiny
    pivotfirst reshape — no values-discovery scan of the fact table
    (at 100 TB pinning values is the difference between one pass and
    two)."""
    orders = _t(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(cents("o_totalprice")), F.lit(0)).alias("cents"),
        )
    )
    return piv.select(
        "o_orderpriority",
        F.col("F_n").alias("f_n"),
        F.col("O_n").alias("o_n"),
        F.col("P_n").alias("p_n"),
        F.col("F_cents").alias("f_cents"),
        F.col("O_cents").alias("o_cents"),
        F.col("P_cents").alias("p_cents"),
    )


@query(
    "agg_unpivot_part_measures",
    oracle="""
    WITH long AS (
        SELECT p_brand, 'retail_cents' AS metric,
               CAST(round(p_retailprice*100) AS BIGINT) AS val
        FROM part
        UNION ALL
        SELECT p_brand, 'size' AS metric, CAST(p_size AS BIGINT) AS val
        FROM part
    )
    SELECT p_brand, metric, count(*) AS n, sum(val) AS total,
           min(val) AS vmin, max(val) AS vmax
    FROM long
    GROUP BY p_brand, metric
    """,
    tags=("unpivot", "melt", "groupby"),
)
def agg_unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — wide measures to long (metric, value) rows, the
    inverse reshaping of pivot, then a tall aggregate.  ``unpivot`` is
    a narrow transformation (row fan-out, NO shuffle); the only
    exchange is the final groupBy."""
    part = _t(spark, sf_dir, "part")
    long = part.select(
        "p_brand",
        cents("p_retailprice").alias("retail_cents"),
        F.col("p_size").cast("long").alias("size"),
    ).unpivot(["p_brand"], ["retail_cents", "size"], "metric", "val")
    return long.groupBy("p_brand", "metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("val").alias("total"),
        F.min("val").alias("vmin"),
        F.max("val").alias("vmax"),
    )


@query(
    "agg_mode_per_flag",
    oracle="""
    SELECT l_returnflag, qty AS mode_qty, n
    FROM (
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
               count(*) AS n,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY count(*) DESC, qty) AS rnk
        FROM lineitem
        GROUP BY l_returnflag, qty
    )
    WHERE rnk = 1
    """,
    tags=("mode", "groupby", "top_k_per_group"),
)
def agg_mode_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent value; ties -> smallest) per
    group.  Built-in F.mode is tie-nondeterministic, so the engine form
    is count-then-rank: groupBy (map-side combined) + a tiny window
    over one row per distinct value — never a per-row window."""
    li = _t(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    counts = li.groupBy("l_returnflag", F.col("l_quantity").cast("long").alias("qty")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("n"), F.asc("qty"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select("l_returnflag", F.col("qty").alias("mode_qty"), "n")
    )


@query(
    "agg_corr_covar_exact",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               count(*) AS n,
               sum(CAST(l_quantity AS BIGINT)) AS sx,
               sum(CAST(round(l_extendedprice) AS BIGINT)) AS sy,
               sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
               sum(CAST(round(l_extendedprice) AS BIGINT)
                   * CAST(round(l_extendedprice) AS BIGINT)) AS syy,
               sum(CAST(l_quantity AS BIGINT)
                   * CAST(round(l_extendedprice) AS BIGINT)) AS sxy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr_qty_price,
           round((CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0), 6) AS covar_samp_qty_price
    FROM m
    """,
    tags=("corr", "covariance", "stats", "groupby"),
)
def agg_corr_covar_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance from EXACT integer
    moments (n, Σx, Σy, Σx², Σy², Σxy as int64 — order-independent),
    then one identical double-precision formula on both engines.
    Built-in corr/covar_samp use engine-specific online update orders
    whose float results drift in the last ulp; the moments form is the
    cross-engine-stable way (same trick as the variance queries).
    Prices enter as whole dollars so Σy² stays far from int64 range
    even at 100 TB row counts."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round("l_extendedprice").cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    return m.select(
        "l_returnflag",
        "n",
        F.round(
            (nd * sxy - sx * sy)
            / (F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
        F.round((sxy - sx * sy / nd) / (nd - F.lit(1.0)), 6).alias(
            "covar_samp_qty_price"
        ),
    )


@query(
    "agg_partial_merge",
    oracle="""
    WITH part1 AS (
      SELECT o_orderstatus, count(*) AS n,
             sum(CAST(round(o_totalprice*100) AS BIGINT)) AS cents,
             min(o_orderdate) AS first_dt, max(o_orderdate) AS last_dt
      FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1
    ),
    part2 AS (
      SELECT o_orderstatus, count(*) AS n,
             sum(CAST(round(o_totalprice*100) AS BIGINT)) AS cents,
             min(o_orderdate) AS first_dt, max(o_orderdate) AS last_dt
      FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1
    ),
    merged AS (SELECT * FROM part1 UNION ALL SELECT * FROM part2)
    SELECT o_orderstatus, sum(n) AS n, sum(cents) AS cents,
           min(first_dt) AS first_dt, max(last_dt) AS last_dt
    FROM merged GROUP BY o_orderstatus
    """,
    tags=("groupby", "partial_merge", "incremental_etl"),
)
def agg_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-aggregate MERGE — the incremental-ETL staple (the
    reference's block ETL (u, ActiveData-ETL) aggregates per S3 block
    and re-aggregates downstream; at 100 TB you never re-scan history,
    you merge partials): two disjoint half-corpus aggregates unioned
    and re-aggregated with the merge functions (sum of counts/sums,
    min of mins, max of maxes) must equal the direct aggregate — which
    is what the oracle reproduces.  count/sum/min/max are the
    re-aggregable family; avg derives as sum/count at read time."""
    orders = _t(spark, sf_dir, "orders")

    def partial(pred):
        return orders.where(pred).groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents("o_totalprice")).alias("cents"),
            F.min("o_orderdate").alias("first_dt"),
            F.max("o_orderdate").alias("last_dt"),
        )

    both = partial(F.col("o_orderkey") % 2 == 0).unionByName(
        partial(F.col("o_orderkey") % 2 == 1)
    )
    return both.groupBy("o_orderstatus").agg(
        F.sum("n").alias("n"),
        F.sum("cents").alias("cents"),
        F.min("first_dt").alias("first_dt"),
        F.max("last_dt").alias("last_dt"),
    )


@query(
    "agg_bitwise_family",
    oracle="""
    SELECT l_returnflag,
           bit_and(l_partkey) AS all_and,
           bit_or(l_partkey)  AS any_or,
           bit_xor(l_partkey) AS parity_xor,
           bit_xor(xor(l_partkey, l_suppkey << 2)) AS mixed_xor
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("groupby", "bitwise", "scalar", "checksum"),
)
def agg_bitwise_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family (bit_and / bit_or / bit_xor) plus
    scalar xor/shift — the order-insensitive checksum shapes ETL uses
    for partition-level integrity (xor of keys survives any
    re-partitioning, which is exactly why it works at 100 TB: partials
    combine on any split).  jx has no bitwise surface (u); engine
    addition."""
    prepare(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_partkey").alias("all_and"),
        F.bit_or("l_partkey").alias("any_or"),
        F.bit_xor("l_partkey").alias("parity_xor"),
        F.bit_xor(
            F.col("l_partkey").bitwiseXOR(F.shiftleft("l_suppkey", 2))
        ).alias("mixed_xor"),
    )


@query(
    "agg_heavy_hitters_mg",
    oracle="""
    WITH stream AS (
        SELECT CASE WHEN event_id % 5 < 2 THEN 'hot' || CAST(event_id % 2 AS VARCHAR)
                    ELSE 'cold' || CAST(event_id % 997 AS VARCHAR) END AS k
        FROM events
    ),
    total AS (SELECT count(*) AS _n FROM stream)
    SELECT s.k, count(*) AS cnt,
           round(CAST(count(*) AS DOUBLE) / any_value(t._n), 6) AS share
    FROM stream s CROSS JOIN total t
    GROUP BY s.k
    HAVING count(*) > 0.05 * any_value(t._n)
    """,
    tags=("heavy_hitters", "misra_gries", "sketch", "skew_detection", "udf_mapinpandas"),
)
def agg_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phi=5% heavy hitters via two-phase Misra-Gries
    (operators/skew.misra_gries_heavy_hitters): per-partition
    32-counter summaries (bounded memory, mapInPandas) nominate
    candidates, an exact recount over the broadcast candidate set
    culls false positives.  The stream is events skewed on purpose —
    two 'hot' keys own 40% while ~997 cold keys share the rest — so
    the sketch has real work to do; the oracle is the plain
    GROUP BY/HAVING on the same stream, which is exactly what the
    operator avoids at 100 TB (a shuffle row per distinct key)."""
    from mo_etl_spark.operators.skew import misra_gries_heavy_hitters

    e = _t(spark, sf_dir, "events").select(
        F.when(
            F.col("event_id") % 5 < 2,
            F.concat(F.lit("hot"), (F.col("event_id") % 2).cast("string")),
        )
        .otherwise(F.concat(F.lit("cold"), (F.col("event_id") % 997).cast("string")))
        .alias("k")
    )
    return misra_gries_heavy_hitters(e, "k", k=32, phi=0.05)


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT CASE WHEN value > 50 THEN user_id END) AS n_big_spenders
    FROM events
    GROUP BY event_type
    """,
    tags=("cardinality", "bitmap", "distinct_rollup", "partial_merge"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counts via roaring-style bitmaps (Spark 3.5
    bitmap_* functions) — the warehouse pattern between naive
    count(DISTINCT) and approximate HLL: integer ids map to
    (bucket, bit position), per-(group, bucket) bitmaps OR together,
    and popcounts sum — every stage is mergeable/re-aggregatable like
    a sketch but the answer is EXACT, which is why the oracle is a
    plain count(DISTINCT).  The shuffle carries one 4 KB bitmap per
    (group, bucket of 32768 ids) instead of one row per distinct id —
    at 100 TB that is the difference between shuffling user-count rows
    and shuffling ceil(id_space/32768) fixed-size buckets."""
    prepare(spark)
    e = load_table(spark, sf_dir, "events")
    per_bucket = (
        e.select(
            "event_type",
            "user_id",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.col("value"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"),
            F.expr(
                "bitmap_construct_agg(bitmap_bit_position("
                "CASE WHEN value > 50 THEN user_id END))"
            ).alias("bm_big"),
        )
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_users"),
        F.sum(F.expr("bitmap_count(bm_big)")).alias("n_big_spenders"),
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH vals AS (
        SELECT l_returnflag AS flag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
               CAST(l_quantity AS BIGINT) AS w
        FROM lineitem
    ),
    cum AS (
        SELECT flag, price_c, w,
               sum(w) OVER (PARTITION BY flag ORDER BY price_c, w
                            ROWS UNBOUNDED PRECEDING) AS cw,
               sum(w) OVER (PARTITION BY flag) AS tw
        FROM vals
    )
    SELECT flag,
           min(price_c) FILTER (WHERE 2 * cw >= tw) AS wmedian_cents,
           min(tw) AS total_weight
    FROM cum
    GROUP BY flag
    """,
    tags=("percentile", "median", "weighted", "window_agg", "robust_stats"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median (lower): quantity-weighted median line price
    per return flag — the inventory-weighted center that plain median
    can't express.  Pure integer discipline end to end: cents values,
    integer weights, cumulative-weight window, threshold
    2·cum >= total (no interpolation, no float comparison), so both
    engines agree exactly.  One window per group partition plus one
    aggregate; the 100 TB path replaces the per-row window with the
    mergeable histogram sketch when groups are huge."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    vals = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_c"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    cum = vals.select(
        "flag",
        "price_c",
        F.sum("w")
        .over(
            Window.partitionBy("flag")
            .orderBy("price_c", "w")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cw"),
        F.sum("w").over(Window.partitionBy("flag")).alias("tw"),
    )
    return cum.groupBy("flag").agg(
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("price_c"))).alias(
            "wmedian_cents"
        ),
        F.min("tw").alias("total_weight"),
    )


@query(
    "agg_pareto_8020",
    oracle="""
    WITH rev AS (
        SELECT c.c_nationkey, c.c_custkey,
               CAST(round(sum(o.o_totalprice) * 100) AS BIGINT) AS rc
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT c_nationkey, rc,
               sum(rc) OVER (PARTITION BY c_nationkey
                             ORDER BY rc DESC, c_custkey
                             ROWS UNBOUNDED PRECEDING) AS crc,
               sum(rc) OVER (PARTITION BY c_nationkey) AS trc,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY rc DESC, c_custkey) AS rn,
               count(*) OVER (PARTITION BY c_nationkey) AS nc
        FROM rev
    )
    SELECT c_nationkey,
           min(nc) AS n_customers,
           min(rn) FILTER (WHERE 5 * crc >= 4 * trc) AS n_top80,
           round(CAST(min(rn) FILTER (WHERE 5 * crc >= 4 * trc) AS DOUBLE)
                 / min(nc), 6) AS top80_customer_share
    FROM cum
    GROUP BY c_nationkey
    """,
    tags=("pareto", "concentration", "window_agg", "window_rank", "top_k"),
)
def agg_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) concentration per nation: how many of the
    nation's customers, richest-first, it takes to cover 80% of
    revenue — the operational twin of the Gini query (same ranked
    cumulative machinery, answers 'whom do I call first').  Integer
    threshold 5·cum >= 4·total avoids any float boundary; ties broken
    by custkey.  One customer-level aggregate then two windows on the
    nation partition."""
    from pyspark.sql import Window

    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    rev = (
        customer.join(orders, orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.round(F.sum("o_totalprice") * 100).cast("bigint").alias("rc"))
    )
    wp = Window.partitionBy("c_nationkey")
    wo = wp.orderBy(F.col("rc").desc(), "c_custkey")
    cum = rev.select(
        "c_nationkey",
        F.sum("rc").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("crc"),
        F.sum("rc").over(wp).alias("trc"),
        F.row_number().over(wo).alias("rn"),
        F.count("*").over(wp).alias("nc"),
    )
    hit = F.min(F.when(5 * F.col("crc") >= 4 * F.col("trc"), F.col("rn")))
    return cum.groupBy("c_nationkey").agg(
        F.min("nc").alias("n_customers"),
        hit.alias("n_top80"),
        F.round(hit.cast("double") / F.min("nc"), 6).alias("top80_customer_share"),
    )


# -- count-min sketch (Cormode & Muthukrishnan '05, public) ---------------

_CMS_DEPTH, _CMS_WIDTH = 4, 256


def _cms_cell_sql(r: int, key: str, find_fn: str) -> str:
    """Cell index for hash row ``r``: value of the first 4 hex chars of
    md5('r:'||key) mod width.  ``find_fn`` is the engine's
    position-of-substring function (Spark ``instr``, DuckDB
    ``strpos``) — md5 hex is identical lowercase in both engines, so
    the cell layout is bit-identical cross-engine."""
    h = f"md5(concat('{r}:', {key}))"
    terms = " + ".join(
        f"({find_fn}('0123456789abcdef', substring({h}, {j + 1}, 1)) - 1) * {16 ** (3 - j)}"
        for j in range(4)
    )
    return f"(({terms}) % {_CMS_WIDTH})"


def _cms_oracle_sql() -> str:
    builds = "\n        UNION ALL ".join(
        f"SELECT {r} AS r, {_cms_cell_sql(r, 'k', 'strpos')} AS cell FROM base"
        for r in range(_CMS_DEPTH)
    )
    probes = "\n        UNION ALL ".join(
        f"SELECT k, n_true, {r} AS r, {_cms_cell_sql(r, 'k', 'strpos')} AS cell FROM truth"
        for r in range(_CMS_DEPTH)
    )
    return f"""
    WITH base AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
    cells AS (
        SELECT r, cell, count(*) AS cn FROM (
        {builds}
        ) GROUP BY r, cell
    ),
    truth AS (SELECT k, count(*) AS n_true FROM base GROUP BY k),
    probes AS (
        {probes}
    )
    SELECT p.k AS user_key, p.n_true,
           min(c.cn) AS n_est,
           min(c.cn) - p.n_true AS overcount
    FROM probes p JOIN cells c USING (r, cell)
    GROUP BY p.k, p.n_true
    """


@query(
    "agg_count_min_freq",
    oracle=_cms_oracle_sql(),
    tags=("count_min", "sketch", "approx", "partial_merge", "heavy_hitters"),
)
def agg_count_min_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation with an
    oracle-reproducible md5 hash family (depth 4 × width 256; cell =
    first-16-bits of md5('r:'||key) mod width).  Build side is the
    100 TB story: each partition contributes AT MOST depth×width
    cells to the shuffle regardless of key cardinality (map-side
    partial count behind groupBy(r, cell)) — the bounded-memory
    alternative to an exact key groupBy when keys explode.  Estimate =
    min over the depth rows (one-sided error: n_est >= n_true always,
    overcount column shows the collision inflation).  The exact truth
    side here exists only to exhibit the error; the unit test asserts
    the one-sided bound."""
    ev = _t(spark, sf_dir, "events")
    base = ev.selectExpr("CAST(user_id AS STRING) AS k")
    cell_arr = F.array(
        *[F.expr(_cms_cell_sql(r, "k", "instr")) for r in range(_CMS_DEPTH)]
    )
    cells = (
        base.select(F.posexplode(cell_arr).alias("r", "cell"))
        .groupBy("r", "cell")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    truth = base.groupBy("k").agg(F.count(F.lit(1)).alias("n_true"))
    probes = truth.select("k", "n_true", F.posexplode(cell_arr).alias("r", "cell"))
    return (
        probes.join(cells, ["r", "cell"])
        .groupBy("k", "n_true")
        .agg(F.min("cn").alias("n_est"))
        .select(
            F.col("k").alias("user_key"),
            "n_true",
            "n_est",
            (F.col("n_est") - F.col("n_true")).alias("overcount"),
        )
    )


@query(
    "agg_time_grain_rollup",
    oracle="""
    SELECT CASE WHEN GROUPING(d) = 0 THEN 'day'
                WHEN GROUPING(m) = 0 THEN 'month'
                ELSE 'total' END AS grain,
           epoch_ms(coalesce(d, m)) AS bucket_ms,
           count(*) AS n,
           sum(CAST(round(value*100) AS BIGINT)) AS total_cents
    FROM (SELECT date_trunc('day', ts) AS d, date_trunc('month', ts) AS m, value
          FROM events)
    GROUP BY GROUPING SETS ((d), (m), ())
    """,
    tags=("time_grain", "grouping_sets", "time_domain", "rollup", "incremental_etl"),
)
def agg_time_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain time rollup in ONE scan — the warehouse pattern that
    replaces three separate day/month/total aggregation jobs with a
    single GROUPING SETS pass (Catalyst expands to one Expand + one
    hash aggregate; the fact table is read once).  Exercises the
    Spark-4 DataFrame-native groupingSets API (the non-SQL twin of
    agg_grouping_sets_sql) with grain labels derived from
    grouping()."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("month", "ts").alias("m"),
        cents("value").alias("vc"),
    )
    return (
        base.groupingSets([["d"], ["m"], []], "d", "m")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vc").alias("total_cents"),
            F.grouping("d").alias("gd"),
            F.grouping("m").alias("gm"),
        )
        .select(
            F.when(F.col("gd") == 0, F.lit("day"))
            .when(F.col("gm") == 0, F.lit("month"))
            .otherwise(F.lit("total"))
            .alias("grain"),
            (F.unix_micros(F.coalesce("d", "m")) / 1000).cast("long").alias("bucket_ms"),
            "n",
            "total_cents",
        )
    )
