"""Multimodal column plumbing (training-data pipeline ops).

Images/audio/video ride as opaque ``binary`` columns with a typed metadata
struct. The decode/feature kernels are STUBS behind a clearly-marked seam
(no image/audio libs exist in this container — see ``_decode_image``);
everything Spark-side is real and tested: schema, Arrow batch shape,
mapInPandas signature, bounded batch sizing for large blobs.

Production note: set spark.sql.execution.arrow.maxRecordsPerBatch low
(session.py uses 4096) when blob columns ride through mapInPandas —
batch bytes, not batch rows, are what OOMs a Python worker.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sha", StringType(), True),
    ]
)

_DECODERS_AVAILABLE = False  # no PIL/cv2/librosa in this container


def _decode_image(payload: bytes) -> tuple[int, int]:
    """STUB: image decode seam.

    With a real decoder: return PIL.Image.open(io.BytesIO(payload)).size.
    Here: a deterministic fake derived from the payload bytes, so the
    plumbing (schema, nullability, batching) is testable end-to-end.
    """
    if _DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire PIL/cv2 here")
    if not payload:
        return (0, 0)
    return (len(payload) % 1920 + 1, len(payload) % 1080 + 1)


def extract_media_meta(media: DataFrame) -> DataFrame:
    """binary blobs -> typed metadata rows via mapInPandas.

    The native parts (byte length, sha) stay JVM-side; only the decode
    stub runs in Python, and only the payload column crosses the boundary.
    """
    narrow = media.select("media_id", "kind", "mime", "payload").withColumn(
        "n_bytes", F.length("payload").cast("long")
    ).withColumn("sha", F.sha2(F.col("payload"), 256))

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                _decode_image(bytes(p)) if p is not None and k == "image" else (None, None)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pdf[["media_id", "kind", "mime", "n_bytes", "sha"]].copy()
            out["width"] = pd.array([d[0] for d in dims], dtype="Int32")
            out["height"] = pd.array([d[1] for d in dims], dtype="Int32")
            yield out[
                ["media_id", "kind", "mime", "n_bytes", "width", "height", "sha"]
            ]

    return narrow.mapInPandas(_decode, MEDIA_META_SCHEMA)
