"""Multimodal column plumbing (beyond-reference; SURVEY §7.1 M7): treat
image/audio/video payloads as opaque ``binary`` columns with a typed metadata
struct, and run decode / feature-extract / frame-sample as Arrow-batched
Pandas operations via ``mapInPandas``.

The actual codec step is STUBBED (`decode_image` raises
``NotImplementedError`` — no image/audio libraries in this environment); the
deterministic fake (`_fake_decode`) stands in so the Spark-side contract —
schema, batch shape, partitioning, UDF signature — is real and tested.

Scale design: ``mapInPandas`` streams Arrow record batches through each task
(no row-at-a-time pickling, no driver collect); payload bytes never leave
the executor, and output schemas are fixed ``StructType``s so downstream
stages stay columnar. Partition count follows the input splits — for a
100 TB media corpus, tune ``spark.sql.files.maxPartitionBytes`` so one batch
of payloads fits executor memory.

The md5/byte-length features are engine-portable (DuckDB ``md5``/
``octet_length`` on the source text), so even the UDF path is oracle-checked
— rare for Python-side code, and deliberate: it proves the Arrow round-trip
is lossless.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import ensure_parallelism
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("n_bytes", LongType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_md5", StringType()),
        StructField("n_frame_bytes", LongType()),
    ]
)

FRAME_CHARS = 64


def media_table(docs: DataFrame) -> DataFrame:
    """documents → media rows: utf-8 payload bytes + typed metadata struct.
    (With real media, ``payload`` would come straight off parquet/binaryFile.)"""
    docs = ensure_parallelism(docs)
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length("text").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """Real codec hook — unavailable in this environment by design."""
    raise NotImplementedError(
        "image decoding requires a codec library not present in this "
        "environment; wire Pillow/ffmpeg here in production"
    )


def _fake_decode(payload: bytes) -> bytes:
    """Deterministic stand-in for a codec: identity on the byte stream."""
    return payload


def media_features(media: DataFrame) -> DataFrame:
    """Per-payload features via mapInPandas (Arrow batches of binary)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": decoded.map(len).astype("int64"),
                    "content_md5": decoded.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(extract, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, frame_chars: int = FRAME_CHARS) -> DataFrame:
    """Frame sampling: split each payload into fixed-size frames, one output
    row per frame (the video-pipeline shape: 1 input row → N frame rows,
    still streamed per Arrow batch)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_md5": [],
                "n_frame_bytes": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                text = _fake_decode(payload).decode("utf-8")
                for i in range(0, len(text), frame_chars):
                    chunk = text[i : i + frame_chars]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i // frame_chars)
                    out["frame_md5"].append(
                        hashlib.md5(chunk.encode("utf-8")).hexdigest()
                    )
                    out["n_frame_bytes"].append(len(chunk.encode("utf-8")))
            yield pd.DataFrame(out)

    return media.mapInPandas(frames, FRAMES_SCHEMA)
