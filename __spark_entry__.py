"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``mo_etl_spark.suites.*`` and register themselves
into ``mo_etl_spark.registry``; this module just re-exports them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mo_etl_spark.registry import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mo_etl_spark.suites.tpch import q1_pricing_summary

    return q1_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (same column names).

    Oracles whose integer aggregates DuckDB widens to HUGEINT (int128)
    are wrapped with ``SELECT * REPLACE (CAST(col AS BIGINT) AS col)``
    so the driver's pandas canonicalizer sees int64 on both engines —
    see mo_etl_spark/oracle_fixups.py (auto-generated, test-guarded by
    tests/test_oracle_types.py).
    """
    from mo_etl_spark.oracle_fixups import BIGINT_CASTS

    out = {}
    for name, spec in all_queries().items():
        if spec.oracle is None:
            continue
        sql = spec.oracle
        casts = BIGINT_CASTS.get(name)
        if casts:
            repl = ", ".join(f'CAST("{c}" AS BIGINT) AS "{c}"' for c in casts)
            sql = f"SELECT * REPLACE ({repl}) FROM ({sql}) AS __orig"
        out[name] = sql
    return out
