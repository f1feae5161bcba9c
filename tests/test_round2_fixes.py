"""Regression tests for the round-1 verdict/advice findings.

- streaming sink: tiles span micro-batches; batches must not erase each
  other's rows in a shared tile, and a replayed batch must be idempotent.
- asof_join(how='inner'): a matched right row whose VALUE column is NULL
  must not drop the left row.
- salted_join: outer variants are rejected (they would duplicate
  unmatched build rows).
- case-sensitivity: pages with upper-case bbox phrases ("WEST: ...") and
  no comma must survive the native prefilter (BBOX_RE is IGNORECASE).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from harvester_fgp_spark.operators.joins import asof_join, salted_join
from harvester_fgp_spark.sinks.checkpoint import write_stream_batch


def _records(spark, ids, tile_x):
    pdf = pd.DataFrame(
        {
            "record_id": [f"r{i}" for i in ids],
            "tile_z": [8] * len(ids),
            "tile_x": [tile_x] * len(ids),
            "tile_y": [77] * len(ids),
            "val": list(ids),
        }
    )
    return spark.createDataFrame(pdf)


def test_stream_batches_share_a_tile_without_data_loss(spark, tmp_path):
    out = str(tmp_path / "records")
    cp = str(tmp_path / "cp")
    # two micro-batches land in the SAME tile (tile_x=10)
    write_stream_batch(_records(spark, range(5), 10), out, cp, "run", batch_id=0)
    write_stream_batch(_records(spark, range(5, 12), 10), out, cp, "run", batch_id=1)
    got = spark.read.parquet(out)
    assert got.count() == 12  # round-1 bug: overwrite left only the last 7
    # replay of batch 0 (streaming restart re-runs the uncommitted batch):
    # overwrites its own partition only -> still 12 rows, no duplicates
    write_stream_batch(_records(spark, range(5), 10), out, cp, "run", batch_id=0)
    assert spark.read.parquet(out).count() == 12
    assert spark.read.parquet(out).select("record_id").distinct().count() == 12


def test_asof_inner_keeps_match_with_null_value(spark):
    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "lts": [ts(10), ts(10)]})
    )
    # key 1 matches a right row whose value is NULL; key 2 has no prior row
    right = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 2], "rts": [ts(5), ts(20)], "v": pd.array([None, 7.0])}
        )
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        value_cols=["v"], how="inner",
    ).collect()
    assert [r["k"] for r in out] == [1]  # matched-but-null kept, unmatched dropped
    assert out[0]["asof_v"] is None


def test_salted_join_rejects_outer():
    with pytest.raises(ValueError, match="inner"):
        salted_join(None, None, "k", how="right")


def test_uppercase_bbox_page_survives_prefilter(spark):
    from harvester_fgp_spark.plans.pipeline import mine_records
    from harvester_fgp_spark.schemas import PAGES_SCHEMA
    from harvester_fgp_spark.synth import generate_polygons

    pdf = pd.DataFrame(
        {
            "url": ["https://a.example.ca/1"],
            "warc_ts": [pd.Timestamp("2024-01-02")],
            "html": [None],
            # upper-case phrase, NO comma: round-1 prefilter dropped it
            "text": ["boundary WEST: -100.00 EAST: -98.00 SOUTH: 50.00 NORTH: 52.00 end"],
            "lang": ["en"],
        }
    )
    pages = spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
    recs = mine_records(spark, pages, generate_polygons(10, seed=42))
    rows = recs.collect()
    assert len(rows) == 1 and rows[0]["kind"] == "bbox"
    assert rows[0]["west"] == -100.0 and rows[0]["north"] == 52.0
