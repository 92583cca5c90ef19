"""Multimodal column plumbing (SURVEY.md §2.11): image/audio/video as
opaque ``binary`` columns plus a typed metadata struct, processed with
Arrow-batched pandas UDFs over ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libs in this
container): ``fake_decode`` is a deterministic stand-in that exercises
the REAL Spark plumbing — schema, partitioning, Arrow batch transfer,
UDF signature — so swapping in PIL/librosa later is a one-function
change.  ``decode_image`` raises NotImplementedError by design.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: output schema of the (stubbed) decoder — the real shape a
#: feature-extraction stage would produce
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload: encode the text as utf-8 bytes + metadata struct
    (at ingest time this would be ``spark.read.format('binaryFile')``
    or a parquet binary column)."""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.length(payload).alias("n_bytes"),
        F.lit("text/plain").alias("mime"),
    )
    return df.withColumn("payload", payload).withColumn("meta", meta)


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real decoder slot — image libs absent in this environment."""
    raise NotImplementedError("image decoding requires PIL/opencv; see fake_decode")


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in 'decode': derive (width, height) from the
    content hash so outputs are stable and oracle-checkable."""
    h = hashlib.md5(payload).digest()
    return (h[0] % 64 + 1, h[1] % 64 + 1)


def decode_batch(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas over (id, payload): Arrow-batched, one Python worker
    per partition — the 100 TB decode pattern (repartition upstream to
    size batches; no driver involvement)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            sizes = [fake_decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(lambda p: hashlib.md5(p).hexdigest()),
                    "width": [s[0] for s in sizes],
                    "height": [s[1] for s in sizes],
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, DECODED_SCHEMA)
