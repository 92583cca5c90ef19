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


def scan_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — Spark's second columnar native format (vectorized
    reader, predicate pushdown, column pruning, same as parquet)."""
    return spark.read.orc(path)


def scan_text_jsonlines(spark: SparkSession, path: str, schema) -> DataFrame:
    """NDJSON via the raw-text path: read lines as strings, parse with
    from_json(schema).  The shape for feeds where lines need inspection
    or repair before parsing (the reference's S3 block ETL stages (u,
    ActiveData-ETL) read raw bytes first); corrupt lines become NULL
    structs instead of poisoning the scan."""
    from pyspark.sql import functions as F

    return (
        spark.read.text(path)
        .select(F.from_json(F.col("value"), schema).alias("doc"))
        .select("doc.*")
    )


def scan_xml(spark: SparkSession, path: str, row_tag: str, schema=None) -> DataFrame:
    """XML scan — Spark 4 ships the former spark-xml as a native source.
    An explicit schema skips the inference pass (the 100 TB pattern —
    inference re-reads the whole input)."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def sink_xml(
    df: DataFrame, path: str, row_tag: str, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


def sink_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def sink_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def sink_jsonlines(df: DataFrame, path: str, mode: str = "overwrite", gzip: bool = True) -> None:
    w = df.write.mode(mode)
    if gzip:
        w = w.option("compression", "gzip")
    w.json(path)


def sink_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def scan_sqlite(spark: SparkSession, db_path: str, table_or_sql: str) -> DataFrame:
    """jx-sqlite container scan (u, jx_sqlite/container.py: jx queries
    execute against a SQLite 'snowflake' store).

    SQLite is an embedded single-file engine, so this is inherently a
    driver-side ingest: read via the stdlib sqlite3 + pandas, then
    parallelize with createDataFrame (Arrow).  Intended for the
    reference's actual sqlite use — config/dimension-sized containers;
    a 100 TB fact table would never live in SQLite.  Accepts a table
    name or a full SELECT (statement detected as 'select' + whitespace,
    so tables named e.g. 'selections' route correctly)."""
    import re
    import sqlite3
    from contextlib import closing

    import pandas as pd

    is_stmt = re.match(r"\s*select\s", table_or_sql, re.IGNORECASE)
    sql = table_or_sql if is_stmt else f"SELECT * FROM {table_or_sql}"
    with closing(sqlite3.connect(db_path)) as conn:  # ctx mgr alone only commits
        pdf = pd.read_sql_query(sql, conn)
        if pdf.empty:
            # createDataFrame can't infer types from zero rows; derive
            # the schema from the cursor's declared column types
            decls = conn.execute(sql + " LIMIT 0").description or []
            to_spark = {"INTEGER": "long", "REAL": "double", "BLOB": "binary"}
            cols = []
            for d, col in zip(decls, pdf.columns):
                decl = ""
                if not is_stmt:
                    row = conn.execute(
                        f"SELECT type FROM pragma_table_info(?) WHERE name = ?",
                        (table_or_sql, col),
                    ).fetchone()
                    decl = (row[0] or "").upper() if row else ""
                cols.append(f"`{col}` {to_spark.get(decl, 'string')}")
            return spark.createDataFrame([], ", ".join(cols))
        return spark.createDataFrame(pdf)


def sink_sqlite(df: DataFrame, db_path: str, table: str, mode: str = "replace") -> None:
    """Write a (dimension-sized) DataFrame into a SQLite table — the
    return leg of the jx-sqlite container mapping.  Driver-side
    toPandas + to_sql; same size caveat as scan_sqlite."""
    import sqlite3
    from contextlib import closing

    with closing(sqlite3.connect(db_path)) as conn:
        df.toPandas().to_sql(table, conn, if_exists=mode, index=False)
        conn.commit()
