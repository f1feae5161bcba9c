"""Structured Streaming seam (SURVEY.md §2.10 — out of scope for v1).

The reference is a batch harvester (periodic pulls); the v2 lift is
documented here so the batch stages stay streaming-compatible:

    spark.readStream.table("cat.db.pages")
        .withWatermark("warc_ts", "1 day")
        .transform(lambda df: mine_records(spark, df, ppdf))  # stateless
        .writeStream.foreachBatch(write_records_and_checkpoint)

All batch stages (E1-E7, G1-G7) are stateless per-row/per-batch, so they
lift unchanged inside foreachBatch; the windowed per-tile aggregation
becomes `groupBy(window("warc_ts", "1 hour"), "tile_id")`.
"""
