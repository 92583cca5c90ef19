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

    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the corpus as temp views so ``spark.sql`` works directly
    (the engine's SQL surface — SURVEY.md §2.1 register_views)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
