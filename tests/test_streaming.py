"""Structured Streaming smoke: the batch stages lift unchanged (§2.10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from harvester_fgp_spark.streaming.pipeline import (
    read_pages_stream,
    stream_tile_counts,
)
from harvester_fgp_spark.synth import pages_df


def test_streaming_tile_counts_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages_stream")
    pages = pages_df(spark, 400, seed=42)
    pages.repartition(4).write.mode("overwrite").parquet(src)

    stream = read_pages_stream(spark, src, max_files_per_trigger=2)
    agg = stream_tile_counts(stream, window="6 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("tile_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "scp"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "select sum(n_payloads) as total from tile_counts"
    ).first()
    # batch equivalent over the same input
    from harvester_fgp_spark.operators import extract as E

    exp = (
        E.with_payloads(
            spark.read.parquet(src).filter(F.col("lang").isin("en", "fr")), "text"
        ).count()
    )
    assert got.total == exp
