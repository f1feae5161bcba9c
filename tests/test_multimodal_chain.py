"""Multimodal feature-extract -> similarity chain + frame/resize plumbing.

The embed stub is deterministic per payload (sha-seeded unit vector), so
identical blobs embed identically — exact near-dup over the embeddings
must therefore recover planted duplicate media.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from harvester_fgp_spark.operators.multimodal import (
    embed_media,
    resize_image,
    sample_frames,
)
from harvester_fgp_spark.operators.similarity import exact_near_dup_pairs


def _media(spark, sf_dir, kind):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.lit(f"{kind}/fake").alias("mime"),
    )


def test_embed_then_near_dup_recovers_planted_duplicates(spark, sf_dir):
    media = _media(spark, sf_dir, "image")
    dup = media.withColumn("media_id", F.col("media_id") + 10000)
    emb = embed_media(media.unionByName(dup)).select(
        F.col("media_id").alias("vec_id"), "embedding"
    )
    pairs = {
        (r.ia, r.ib)
        for r in exact_near_dup_pairs(emb, threshold=0.999).collect()
    }
    ids = [r.media_id for r in media.select("media_id").collect()]
    for i in ids:
        assert (i, i + 10000) in pairs, f"planted duplicate blob {i} missed"
    assert len(pairs) == len(ids)  # distinct blobs -> near-orthogonal vectors


def test_sample_frames_cardinality_and_bytes(spark, sf_dir):
    media = _media(spark, sf_dir, "video")
    frames = sample_frames(media).collect()
    by_media: dict[int, list] = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    for mid, b in src.items():
        fs = sorted(by_media[mid], key=lambda r: r.frame_idx)
        assert len(fs) == len(b) % 7 + 1
        assert b"".join(bytes(f.frame_payload) for f in fs) == b[
            : len(fs) * max(1, len(b) // len(fs))
        ]
        assert [f.ts_ms for f in fs] == [j * 1000 for j in range(len(fs))]


def test_resize_image_plumbing(spark, sf_dir):
    media = _media(spark, sf_dir, "image")
    out = resize_image(media, 64, 32).collect()
    assert len(out) == 40
    keep = 64 * 32 // 64
    for r in out:
        assert r.width == 64 and r.height == 32
        assert len(bytes(r.payload)) <= keep
