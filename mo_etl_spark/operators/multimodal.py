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
    """Real decoder slot — image libs absent in this environment.

    SWAP-IN CONTRACT (what a deployment plugs here): a pure function
    ``(payload: bytes) -> (width: int, height: int)`` — no Spark, no
    I/O, no shared state (it runs inside an Arrow worker, one call per
    row, many workers in parallel).  Raise ``ValueError`` on a corrupt
    payload; ``decode_batch`` callers decide drop-vs-fail policy.  With
    PIL::

        from io import BytesIO
        from PIL import Image
        def decode_image(payload):
            with Image.open(BytesIO(payload)) as im:
                return im.size  # (width, height)

    Then point ``decode_batch``'s inner call at it (or monkeypatch this
    name) — the mapInPandas plumbing, DECODED_SCHEMA, and partitioning
    are already real and tested against ``fake_decode``."""
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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)


def resize_image(payload: bytes, size: tuple[int, int]) -> bytes:
    """Real resize slot — image libs absent in this environment.

    SWAP-IN CONTRACT: a pure function ``(payload: bytes, size: (w, h))
    -> bytes`` returning the re-encoded thumbnail (same constraints as
    ``decode_image``: stateless, no I/O, ValueError on corrupt input).
    With PIL::

        from io import BytesIO
        from PIL import Image
        def resize_image(payload, size):
            with Image.open(BytesIO(payload)) as im:
                buf = BytesIO()
                im.resize(size).save(buf, format="PNG")
                return buf.getvalue()

    ``resize_batch`` then hashes/ships the returned bytes unchanged."""
    raise NotImplementedError("resize requires PIL/opencv; see fake_resize")


def fake_resize(payload: bytes, size: tuple[int, int]) -> bytes:
    """Deterministic stand-in: the 'thumbnail' is the payload tagged
    with the target size — stable bytes, so the output hash is
    reproducible by any engine."""
    return payload + f"@{size[0]}x{size[1]}".encode()


def resize_batch(df: DataFrame, size: tuple[int, int] = (16, 16), id_col: str = "doc_id") -> DataFrame:
    """mapInPandas resize stage: same Arrow plumbing as decode_batch;
    emits target dims + thumbnail content hash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = pdf["payload"].map(lambda p: fake_resize(p, size))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "thumb_w": size[0],
                    "thumb_h": size[1],
                    "thumb_md5": thumbs.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def frame_sample_batch(
    df: DataFrame, interval_ms: int = 1000, id_col: str = "doc_id"
) -> DataFrame:
    """Video frame sampling plumbing: each payload fans out to one row
    per sampled frame (the doc->many-frames UDTF shape).  The decoder
    is stubbed deterministically — frame count = payload_bytes % 5 + 1,
    frame content = payload tagged with the index — so the fan-out,
    batch shape, and per-frame hashing are real and cross-engine
    checkable; swapping in pyav/ffmpeg changes one inner function."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, hashes = [], [], [], []
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                n_frames = len(payload) % 5 + 1
                for i in range(n_frames):
                    ids.append(did)
                    idxs.append(i)
                    tss.append(i * interval_ms)
                    hashes.append(
                        hashlib.md5(payload + b"#" + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_ts_ms": tss,
                    "frame_md5": hashes,
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, FRAMES_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def audio_features_batch(df: DataFrame, n_features: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Audio feature-extraction plumbing (MFCC-shaped output): stubbed
    deterministic features from the content hash; real librosa/torch
    extraction drops into the same mapInPandas slot."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(
                lambda p: [
                    int.from_bytes(hashlib.md5(p + bytes([i])).digest()[:4], "big")
                    / 2**32
                    for i in range(n_features)
                ]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_samples": pdf["payload"].map(len).astype("int64") * 100,
                    "features": feats,
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, AUDIO_SCHEMA)
