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


def test_stateful_dedup_across_micro_batches(spark, tmp_path):
    """applyInPandasWithState: first-seen urls emitted once, later crawls
    of the same url suppressed even when they arrive in later batches."""
    import pandas as pd

    from harvester_fgp_spark.schemas import PAGES_SCHEMA
    from harvester_fgp_spark.streaming.pipeline import (
        read_pages_stream,
        stream_dedup_first_seen,
    )

    src = str(tmp_path / "pages_src")

    def _batch(urls, ts_day):
        pdf = pd.DataFrame(
            {
                "url": urls,
                "warc_ts": [pd.Timestamp(f"2024-01-{ts_day:02d}")] * len(urls),
                "html": [None] * len(urls),
                "text": ["x"] * len(urls),
                "lang": ["en"] * len(urls),
            }
        )
        return spark.createDataFrame(pdf, schema=PAGES_SCHEMA)

    # batch 1: urls a,b,c — batch 2: b,c,d (overlap b,c)
    _batch(["u://a", "u://b", "u://c"], 1).write.mode("overwrite").parquet(src)
    _batch(["u://b", "u://c", "u://d"], 2).write.mode("append").parquet(src)

    stream = read_pages_stream(spark, src, max_files_per_trigger=1)
    q = (
        stream_dedup_first_seen(stream)
        .writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select url from first_seen").collect()
    urls = sorted(r.url for r in rows)
    assert urls == ["u://a", "u://b", "u://c", "u://d"]  # each exactly once


def test_watermark_drops_late_rows(spark, tmp_path):
    """§2.10 late-data semantics: with a short watermark and append-mode
    windowed counts, a row arriving far behind the advanced watermark is
    dropped from the already-finalized window."""
    import pandas as pd

    from harvester_fgp_spark.schemas import PAGES_SCHEMA
    from harvester_fgp_spark.streaming.pipeline import (
        read_pages_stream,
        stream_tile_counts,
    )

    src = str(tmp_path / "late_src")

    def _write(ts, mode):
        pdf = pd.DataFrame(
            {
                "url": [f"u://{ts}"],
                "warc_ts": [pd.Timestamp(ts)],
                "html": [None],
                "text": ["point at 45.0, -75.0"],
                "lang": ["en"],
            }
        )
        spark.createDataFrame(pdf, schema=PAGES_SCHEMA).write.mode(mode).parquet(src)

    # phase 1: an event at T0, then T0+3d which advances the watermark
    # (1d) far past T0's hour window; phase 2 (written only after phase 1
    # is fully processed, so trigger order is guaranteed): a LATE row
    # back inside T0's window
    _write("2024-01-01 00:10:00", "overwrite")
    _write("2024-01-04 00:10:00", "append")

    stream = read_pages_stream(spark, src, max_files_per_trigger=1)
    q = (
        stream_tile_counts(stream, watermark="1 day", window="1 hour")
        .writeStream.format("memory")
        .queryName("late_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write("2024-01-01 00:20:00", "append")  # late arrival
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "select w.start as ws, n_payloads from late_counts"
    ).collect()
    by_window = {str(r.ws): r.n_payloads for r in rows}
    # T0's window finalized with ONE payload — the late third row was
    # dropped, not double-counted and not re-emitted
    assert by_window.get("2024-01-01 00:00:00") == 1
