"""Python Data Source block store: partition granularity (one input
partition per block — the ETL-unit sharding model) and row fidelity
vs a direct json read of the same files."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_block_store_partitions_and_fidelity(spark):
    from mo_etl_spark.sources.blocks import (
        BlockStoreDataSource,
        BlockStoreReader,
        register_block_source,
        write_block_store,
    )
    from mo_etl_spark.tables import load_table

    path = "/root/repo/.cache/test_blocks"
    events = load_table(spark, SF, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        F.pmod("event_id", F.lit(4)).cast("long").alias("block_id"),
    )
    write_block_store(events, path)

    # reader plans one partition per block dir
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(BlockStoreDataSource(options={}).schema())
    reader = BlockStoreReader(schema, {"path": path})
    parts = reader.partitions()
    assert [p.block_id for p in parts] == [0, 1, 2, 3]

    register_block_source(spark)
    back = spark.read.format("ndjson_blocks").load(path)
    direct = spark.read.json(path)  # Spark's own reader sees block_id too

    assert back.count() == events.count()
    sym_diff = back.exceptAll(direct.select(back.columns)).count() + direct.select(
        back.columns
    ).exceptAll(back).count()
    assert sym_diff == 0
