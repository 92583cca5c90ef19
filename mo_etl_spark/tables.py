"""Canonical test-corpus tables (TESTDATA.md / FIXTURES.md).

The reference's notion of a "container" (u, jx_base containers; docs
queried `from` a named collection) maps to named DataFrames / temp
views here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to broadcast at EVERY scale factor
#: (region/nation are fixed-size; supplier/part grow ~linearly but stay
#: dimension-scale — at 100 TB fact scale these remain << the 64 MB
#: broadcast threshold relative to lineitem/orders/events)
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: per-session PLAN memo (r12 optimization; guide §1.2 per-task→driver
#: work, §7.3 driver-side planning cost): ``spark.read.parquet`` pays a
#: driver-side file listing + parquet footer schema inference on EVERY
#: call — measured 140-250 ms per table — and a 361-query bench session
#: calls load_table 1000+ times.  The memo returns the SAME unresolved
#: scan plan for repeat calls; every execution still reads the parquet
#: from disk (this caches a plan object, never data or results).  Keyed
#: by the exact JVM session (different sessions may carry different
#: reader confs), path, and source mtime (a rewritten snapshot
#: invalidates).
_PLAN_MEMO: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan: Catalyst pushes predicates and prunes
    columns into the scan (verify via .explain → PushedFilters/ReadSchema).

    events.ts has shipped as TIMESTAMP(NANOS) (Spark reads it as long
    under the nanosAsLong conf in session.py) and as naive
    TIMESTAMP(MICROS) (Spark reads TIMESTAMP_NTZ).  Both are normalized
    here to a UTC TIMESTAMP_LTZ so every downstream epoch/window
    expression (unix_micros, F.window) sees one type; with
    spark.sql.session.timeZone=UTC the NTZ->LTZ cast is exact.
    """
    from pyspark.sql import functions as F

    path = f"{sf_dir}/{name}.parquet"
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = -1.0
    key = (id(spark._jsparkSession), path, mtime)
    memo = _PLAN_MEMO.get(key)
    if memo is not None:
        return memo
    df = spark.read.parquet(path)
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _PLAN_MEMO[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the corpus as temp views so ``spark.sql`` works directly
    (the engine's SQL surface — SURVEY.md §2.1 register_views)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
