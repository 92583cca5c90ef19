"""Source/sink connectors (SURVEY.md §2.1).

Reference shapes (u): ActiveData-ETL reads S3 buckets of gzipped
JSON-lines blocks and writes S3 + Elasticsearch; mo_files/mo-streams
handle local files.  Spark-native mapping: DataFrameReader/Writer with
codec auto-detection; S3 is the same `spark.read.json("s3a://…")` call
(no S3 endpoint in this environment — the local path exercises the
identical code path).  Elasticsearch bulk-index is out of scope here
(no service); represented by the generic sink interface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def scan_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def scan_jsonlines(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """NDJSON (optionally .gz — codec inferred from extension).  An
    explicit schema avoids the inference scan at 100 TB."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def scan_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def sink_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def sink_jsonlines(df: DataFrame, path: str, mode: str = "overwrite", gzip: bool = True) -> None:
    w = df.write.mode(mode)
    if gzip:
        w = w.option("compression", "gzip")
    w.json(path)


def sink_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)
