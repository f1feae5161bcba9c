"""Table readers (SURVEY.md §2.1 S1-S3).

Production reads the pages table from Iceberg (`spark.read.table` with
snapshot pinning for resumability); this sandbox has no Iceberg runtime
jar, so the same API falls back to Parquet paths — the calling code is
identical either way, which is the point of keeping it behind one module.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_pages(
    spark: SparkSession,
    source: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """S1: pages(url, warc_ts, html, text, lang).

    `source` is an Iceberg table name (contains no '/') or a Parquet path.
    Snapshot pinning (`VERSION AS OF`) only applies to the Iceberg branch.
    """
    if "/" not in source:
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.table(source)
    return spark.read.parquet(source)


def read_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S3: one driver oracle table (TESTDATA.md)."""
    if name not in TESTDATA_TABLES:
        raise ValueError(f"unknown testdata table {name!r}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_all_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_testdata(spark, sf_dir, t) for t in TESTDATA_TABLES}
