"""Relational spine queries over the TPC-H-ish star schema
(SURVEY.md §7.1 M0 flagship + §2.2/2.3/2.4 coverage).

Capability parity: jx groupby+aggregate queries (u, jx_python/jx.py
``run()``/``groupby()``) and the SQL join surface accepted by
mo-sql-parsing (u) — executed Spark-first: declarative DataFrame plans,
broadcast hints on dimension joins, exact integer-cents arithmetic for
oracle-stable money aggregates (see functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mo_etl_spark.functions.numeric import cents, money
from mo_etl_spark.registry import query
from mo_etl_spark.session import prepare
from mo_etl_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare(spark)
    return load_table(spark, sf_dir, name)


# SQL fragment twins of the integer-cents helpers (keep in sync with
# functions/numeric.py docstrings)
def _sql_cents(x: str) -> str:
    return f"CAST(round(({x}) * 100) AS BIGINT)"


def _sql_sum_money(x: str) -> str:
    return f"CAST(sum({_sql_cents(x)}) AS DOUBLE) / 100.0"


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           sum(l_quantity)                                   AS sum_qty,
           {_sql_sum_money('l_extendedprice')}               AS sum_base_price,
           CAST(sum({_sql_cents('l_extendedprice')} * (100 - {_sql_cents('l_discount')})) AS DOUBLE) / 10000.0
                                                             AS sum_disc_price,
           CAST(sum({_sql_cents('l_extendedprice')} * (100 - {_sql_cents('l_discount')}) * (100 + {_sql_cents('l_tax')})) AS DOUBLE) / 1000000.0
                                                             AS sum_charge,
           round(sum(l_quantity) / count(*), 6)              AS avg_qty,
           round({_sql_sum_money('l_extendedprice')} / count(*), 6) AS avg_price,
           round(CAST(sum({_sql_cents('l_discount')}) AS DOUBLE) / 100.0 / count(*), 6) AS avg_disc,
           count(*)                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("groupby", "filter", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship TPC-H-Q1-shaped pricing summary (SURVEY.md §7.1).

    jx form: ``{"from": "lineitem", "where": {"lte": ["l_shipdate", ...]},
    "groupby": ["l_returnflag", "l_linestatus"], "select": [...aggs]}``
    (u, jx_python/jx.py run()).  Plan: single parquet scan with the
    shipdate predicate pushed down, partial+final hash aggregation (no
    extra shuffle beyond the groupBy), top-level sort on 2 tiny groups.
    """
    li = _t(spark, sf_dir, "lineitem")
    ep, disc, tax = cents("l_extendedprice"), cents("l_discount"), cents("l_tax")
    n = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            money(F.sum(ep)).alias("sum_base_price"),
            (F.sum(ep * (100 - disc)).cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(ep * (100 - disc) * (100 + tax)).cast("double") / 1000000.0).alias(
                "sum_charge"
            ),
            F.round(F.sum("l_quantity") / n, 6).alias("avg_qty"),
            F.round(money(F.sum(ep)) / n, 6).alias("avg_price"),
            F.round(F.sum(disc).cast("double") / 100.0 / n, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
