"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step is STUBBED (this container has no image/audio libraries)
behind ``decoder=`` injection with a deterministic fake as default — the
Spark-side plumbing (schema, batch shape, partitioning, UDF signature) is
real and tested. Swapping ``_fake_decode`` for a Pillow/ffmpeg call is a
one-function change on a real cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),   # image | audio | video
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for a real decoder (Pillow/librosa/ffmpeg).

    Derives fake dimensions and an 8-dim feature vector from the sha256 of
    the payload — stable across executors, partitions, and runs, and
    reproducible in SQL (floor-based rounding, see functions/numeric.py)
    so the plumbing has a DuckDB oracle. A real deployment raises
    NotImplementedError for kinds it can't decode.
    """
    digest = hashlib.sha256(payload).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    feature = [
        int(b / 255.0 * 1_000_000 + 0.5) / 1_000_000 for b in digest[2:10]
    ]
    return {"width": width, "height": height, "feature": feature}


def extract_media_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
    decoder: Callable[[bytes, str], dict] = _fake_decode,
) -> DataFrame:
    """binary payloads → typed features via one Arrow-batched crossing.

    Batch shape: each pandas batch holds ≤ arrow.maxRecordsPerBatch rows;
    payloads arrive as Python bytes. Partitioning is inherited — at scale,
    repartition upstream so a partition's payload bytes fit executor
    memory (spark.sql.files.maxPartitionBytes governs the scan side).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, kind, payload in zip(
                batch[id_col], batch[kind_col], batch[payload_col]
            ):
                if payload is None:
                    rows.append((mid, kind, 0, None, None, None))
                    continue
                meta = decoder(bytes(payload), kind)
                rows.append(
                    (
                        mid,
                        kind,
                        len(payload),
                        meta.get("width"),
                        meta.get("height"),
                        meta.get("feature"),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "n_bytes", "width", "height", "feature",
                ],
            )

    cols = media.select(
        F.col(id_col), F.col(kind_col), F.col(payload_col)
    )
    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived
    from (seed, media_id)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (1 + i % 7)
        rows.append((i, kinds[i % 3], bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
