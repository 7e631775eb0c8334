"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine's model for image/audio/video at 100 TB: a ``binary`` column
(inline for small blobs, or a path pointer + ``spark.read.format
("binaryFile")`` for large ones) plus a metadata struct carried alongside.
Decode / resize / frame-sample run as Arrow-batched ``mapInPandas``
operators so each task streams batches without materializing a partition.

The actual media codecs are not present in this environment, so the decode
kernel is a clearly marked deterministic stub (`_fake_decode`); everything
Spark-side — schema, batching, partition flow, UDF signatures — is real
and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyconnect_spark.operators._util import t
from pyconnect_spark.query import QueryRegistry

REGISTRY = QueryRegistry()

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, checksum long"
)


@REGISTRY.register(
    "mm01_binary_columns",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           lang AS media_lang,
           CAST(n_chars AS BIGINT) AS meta_chars
    FROM documents
    """,
    doc="Binary payload column + metadata struct: byte lengths computed "
    "JVM-side on the binary type (documents' text stands in for a blob).",
    tags=("multimodal", "binary"),
)
def mm01(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(F.col("lang").alias("lang"), F.col("n_chars").alias("chars"))
    return docs.select(
        "doc_id", payload.alias("payload"), meta.alias("meta")
    ).select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.col("meta.lang").alias("media_lang"),
        F.col("meta.chars").cast("long").alias("meta_chars"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB decode kernel. A real deployment plugs an image/audio codec in
    here (PIL/ffmpeg are not in this container). Deterministic fake:
    derives (width, height, checksum) from the bytes so tests are stable.

    Raises NotImplementedError for payloads that declare a real codec.
    """
    if payload[:4] in (b"\x89PNG", b"RIFF", b"\xff\xd8\xff\xe0"):
        raise NotImplementedError("real media decode requires codec libs not in this image")
    checksum = sum(payload[:64]) + len(payload)
    width = 16 + (checksum % 64)
    height = 16 + ((checksum // 64) % 64)
    return width, height, checksum


def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: streams Arrow batches; never materializes a
    partition. Shape/signature is exactly what a real decoder would use."""
    for pdf in it:
        decoded = [_fake_decode(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "checksum": [d[2] for d in decoded],
            }
        )


def decode_media(df: DataFrame) -> DataFrame:
    """df(doc_id, payload: binary) → decoded metadata via mapInPandas."""
    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


@REGISTRY.register(
    "mm02_decode_pipeline",
    oracle=None,  # stubbed decode kernel; plumbing asserted in pytest
    doc="mapInPandas decode pipeline over binary payloads (stubbed codec): "
    "real Arrow batch flow, schema, and partitioning.",
    tags=("multimodal", "mapInPandas"),
)
def mm02(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return decode_media(docs)
