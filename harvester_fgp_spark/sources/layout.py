"""Production table layout (SURVEY.md §4 partition-pruning row).

At 10^12 documents the pages table lives in Iceberg with partition spec
``days(warc_ts)`` + ``bucket(url, N)`` so that (a) time-ranged harvests
prune partitions at planning time and (b) url-keyed joins/dedup co-locate
without a shuffle. This sandbox has no Iceberg runtime, so the same
layout is emulated with Hive-style directory partitioning on
``crawl_date`` — the reader-side pruning behavior (the part that matters
to query plans) is identical and is asserted in
tests/test_plan_shape.py::test_partition_pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_pages_layout(pages: DataFrame, path: str) -> None:
    """pages -> date-partitioned parquet (Iceberg days(warc_ts) stand-in)."""
    (
        pages.withColumn("crawl_date", F.to_date(F.date_trunc("day", "warc_ts")))
        .repartition("crawl_date")
        .write.mode("overwrite")
        .partitionBy("crawl_date")
        .parquet(path)
    )


def read_pages_layout(
    spark: SparkSession,
    path: str,
    date_from: str | None = None,
    date_to: str | None = None,
) -> DataFrame:
    """Date-ranged read; the crawl_date predicates prune whole partitions
    (static partition pruning — no file of an out-of-range day is read)."""
    df = spark.read.parquet(path)
    if date_from:
        df = df.filter(F.col("crawl_date") >= F.lit(date_from))
    if date_to:
        df = df.filter(F.col("crawl_date") <= F.lit(date_to))
    return df
