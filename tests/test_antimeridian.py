"""Antimeridian (dateline) bboxes end-to-end (round 3).

ISO 19115 allows west > east (the box crosses ±180°). Round-2 behavior
silently dropped such boxes in the miner AND treated them as empty in the
cover — a Fiji-style page produced nothing. Now: the miner emits the
payload, covers split at the dateline, centers wrap, and the full
pipeline assigns the correct tile/cell.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from harvester_fgp_spark.geo import cells as C
from harvester_fgp_spark.geo import tiles as TL


@given(
    west=st.floats(-180, 180),
    east=st.floats(-180, 180),
    south=st.floats(-90, 89),
    dn=st.floats(0.01, 30),
    level=st.integers(2, 8),
)
@settings(max_examples=120, deadline=None)
def test_wrapped_cover_equals_union_of_splits(west, east, south, dn, level):
    north = min(90.0, south + dn)
    got = C.cover_bbox(west, south, east, north, level)
    if west <= east:
        exp = got  # straight branch is its own reference
        assert len(np.unique(got)) == len(got)
        return
    exp = np.unique(
        np.concatenate(
            [
                C.cover_bbox(west, south, 180.0, north, level),
                C.cover_bbox(-180.0, south, east, north, level),
            ]
        )
    )
    np.testing.assert_array_equal(got, exp)
    assert len(got) > 0  # a wrapped box always covers something


def test_wrapped_center_lon():
    # Fiji-style: 177..-178 wraps through 180 -> center 179.5
    assert C.bbox_center_lon(np.array([177.0]), np.array([-178.0]))[0] == 179.5
    # crossing with more west of the line: -175..-170 normal; 170..-175
    got = C.bbox_center_lon(np.array([170.0]), np.array([-175.0]))[0]
    assert got == 177.5
    # wraps past the line onto the negative side
    got = C.bbox_center_lon(np.array([175.0]), np.array([-165.0]))[0]
    assert got == -175.0
    # ordinary box unchanged
    assert C.bbox_center_lon(np.array([-80.0]), np.array([-70.0]))[0] == -75.0


def test_native_center_matches_numpy(spark):
    from harvester_fgp_spark.operators.geo import bbox_center_lon_col

    rng = np.random.default_rng(4)
    pdf = pd.DataFrame(
        {
            "west": rng.uniform(-180, 180, 500),
            "east": rng.uniform(-180, 180, 500),
        }
    )
    rows = (
        spark.createDataFrame(pdf)
        .select(bbox_center_lon_col(F.col("west"), F.col("east")).alias("c"))
        .collect()
    )
    exp = C.bbox_center_lon(pdf["west"].to_numpy(), pdf["east"].to_numpy())
    np.testing.assert_allclose([r.c for r in rows], exp, rtol=0, atol=0)


def test_fiji_page_end_to_end(spark):
    """A dateline-straddling page must produce a record with the tile of
    the WRAPPED center (179.5, -17.5), not of the naive midpoint (-0.5)."""
    from harvester_fgp_spark.plans.pipeline import mine_records
    from harvester_fgp_spark.schemas import PAGES_SCHEMA
    from harvester_fgp_spark.synth import generate_polygons

    pdf = pd.DataFrame(
        {
            "url": ["https://fiji.example.org/p/1"],
            "warc_ts": [pd.Timestamp("2024-03-01")],
            "html": [None],
            "text": [
                "fiji archipelago extent west: 177.00 east: -178.00 "
                "south: -20.00 north: -15.00 end"
            ],
            "lang": ["en"],
        }
    )
    pages = spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
    rec = mine_records(spark, pages, generate_polygons(10, seed=1)).collect()
    assert len(rec) == 1
    r = rec[0]
    assert r.kind == "bbox" and r.west == 177.0 and r.east == -178.0
    exp_x, exp_y = TL.point_to_tile(np.array([179.5]), np.array([-17.5]), 8)
    assert (r.tile_x, r.tile_y) == (int(exp_x[0]), int(exp_y[0]))
    # cell id of the wrapped center too
    assert r.cell_id == int(C.encode(np.array([179.5]), np.array([-17.5]), 12)[0])
    # the GeoJSON spatial field preserves the raw wrapped bounds
    assert "177.000000" in r.spatial and "-178.000000" in r.spatial
