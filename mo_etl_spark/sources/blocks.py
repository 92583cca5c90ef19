"""Block-store source via the Spark 4 Python Data Source API.

The reference's production input is a bucket of gzipped JSON-lines
"blocks", one per ETL unit, addressed by an etl id encoded in the key
(u, ActiveData-ETL `activedata_etl/imports/s3_bucket.py` — SURVEY.md
§2.1 `source_s3`).  This module re-expresses that source natively:

- **Layout**: a directory of `block_id=<id>/part-*.json.gz` block dirs
  (what S3 prefixes look like mounted locally).
- **`BlockStoreDataSource`** (`format("ndjson_blocks")`): a
  `pyspark.sql.datasource.DataSource` whose reader lists block dirs on
  the driver and emits ONE `InputPartition` PER BLOCK — the unit of
  parallelism is the ETL unit, exactly the reference's work-sharding
  model, and at cluster scale each executor pulls only its blocks.
- **Lineage injection**: the block id lives in the path, not the
  payload (the reference's `etl` field is reconstructed from the S3
  key); the reader re-attaches it as a `block_id` column.
- **Arrow batches**: each partition parses its gz NDJSON with
  `pyarrow.json` and yields `RecordBatch`es — the vectorized path the
  Python Data Source API supports — instead of per-row Python tuples.

Spark cannot plan pushdown into a Python source, so keep real tables
on parquet; this is the *ingest* surface for feed formats Spark lacks.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "ndjson_blocks"


class BlockPartition(InputPartition):
    def __init__(self, block_id: int, files: list[str]):
        self.block_id = block_id
        self.files = files


class BlockStoreReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ndjson_blocks requires a path")

    def partitions(self):
        parts = []
        for entry in sorted(os.listdir(self.path)):
            if not entry.startswith("block_id="):
                continue
            block_id = int(entry.split("=", 1)[1])
            block_dir = os.path.join(self.path, entry)
            files = sorted(
                os.path.join(block_dir, f)
                for f in os.listdir(block_dir)
                if f.endswith(".json.gz") or f.endswith(".json")
            )
            if files:
                parts.append(BlockPartition(block_id, files))
        return parts

    def read(self, partition: BlockPartition):
        # executor-side: decompress + Arrow-parse one block's files
        import gzip
        import io

        import pyarrow as pa
        import pyarrow.json as pa_json

        fields = [f.name for f in self.schema.fields]
        for path in partition.files:
            with open(path, "rb") as fh:
                raw = fh.read()
            if path.endswith(".gz"):
                raw = gzip.decompress(raw)
            if not raw.strip():
                continue
            table = pa_json.read_json(io.BytesIO(raw))
            table = table.append_column(
                "block_id", pa.array([partition.block_id] * len(table), pa.int64())
            )
            # project to the declared schema's order; missing cols -> error
            table = table.select(fields)
            for batch in table.to_batches():
                yield batch


class BlockStoreDataSource(DataSource):
    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        # default shape of the events block store; callers with other
        # payloads pass .schema(...) explicitly
        return (
            "event_id BIGINT, user_id BIGINT, event_type STRING, "
            "value_cents BIGINT, block_id BIGINT"
        )

    def reader(self, schema):
        return BlockStoreReader(schema, self.options)

    def streamReader(self, schema):
        return BlockStreamReader(schema, self.options)


def register_block_source(spark) -> None:
    """Idempotently register the format with this session."""
    try:
        spark.dataSource.register(BlockStoreDataSource)
    except Exception:
        pass  # already registered in this session


def write_block_store(df, path: str, block_col: str = "block_id") -> None:
    """Materialize a DataFrame as a block store: one dir per block id,
    gzipped NDJSON inside, rows sorted for deterministic layout (the
    sink leg of the reference's S3 block writer (u))."""
    (
        df.repartition(block_col)
        .sortWithinPartitions(block_col)
        .write.partitionBy(block_col)
        .option("compression", "gzip")
        .mode("overwrite")
        .json(path)
    )


class BlockStreamReader(DataSourceStreamReader):
    """Streaming leg of the block store — the reference's queue-driven
    consumption model (u, ActiveData-ETL pulse workers pull block keys
    off a queue and process each exactly once) as a Spark 4 Python
    streaming data source.

    Offsets are positions in the sorted block-id list: a microbatch is
    the next <= max_blocks_per_batch unconsumed blocks, one
    InputPartition per block (executor-side Arrow parse, same as the
    batch reader).  Offset tracking + checkpointing give exactly-once
    per block — the property the reference engineered by hand with
    etl-id bookkeeping.  `latestOffset` rate-limits the batch size so
    a backlog drains as a sequence of bounded microbatches instead of
    one giant catch-up batch (the queue analog of maxFilesPerTrigger).
    """

    def __init__(self, schema, options):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ndjson_blocks stream requires a path")
        self.max_blocks = int(options.get("maxblockspertrigger", "3"))
        self._batch = BlockStoreReader(schema, options)

    def _block_ids(self) -> list[int]:
        return sorted(
            int(e.split("=", 1)[1])
            for e in os.listdir(self.path)
            if e.startswith("block_id=")
        )

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        # advance at most max_blocks past the last planned batch; the
        # true end moves forward as more blocks land in the store.
        # Stable across repeated calls within one microbatch (only
        # partitions() moves self._pos), and a checkpoint restart
        # corrects the position at the first partitions() call.
        n = len(self._block_ids())
        return {"pos": min(n, getattr(self, "_pos", 0) + self.max_blocks)}

    def partitions(self, start: dict, end: dict):
        self._pos = max(getattr(self, "_pos", 0), end["pos"])
        ids = self._block_ids()[start["pos"] : end["pos"]]
        parts = []
        for block_id in ids:
            block_dir = os.path.join(self.path, f"block_id={block_id}")
            files = sorted(
                os.path.join(block_dir, f)
                for f in os.listdir(block_dir)
                if f.endswith(".json.gz") or f.endswith(".json")
            )
            if files:
                parts.append(BlockPartition(block_id, files))
        # Spark requires a non-empty partition list; an empty batch is
        # a zero-file partition that yields no rows
        return parts or [BlockPartition(-1, [])]

    def read(self, partition: BlockPartition):
        return self._batch.read(partition)

    def commit(self, end: dict) -> None:
        pass  # consumed state lives in the checkpoint, nothing to ack

    def stop(self) -> None:
        pass
