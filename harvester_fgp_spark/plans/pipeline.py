"""EP1: the full production DAG (SURVEY.md §3.2, §7.2 minimum slice).

pages -> validity/lang/coord prefilters (native, BEFORE any UDF so
pushdown reaches the scan) -> E1 extract -> E2 mine+explode -> E3
bilingual -> E6/E7 serialization -> G1 cell encode (native) -> G4
broadcast-R-tree PIP -> G7 tile assign (native) -> normalized records.

The reference runs the same semantics as one sequential per-record loop
([REF? harvest_hnap.py], SURVEY §3.1); here the whole thing is one
declarative DataFrame DAG — Catalyst owns ordering, AQE owns shuffle
sizing, and the only Python is three Arrow-batched stages (E1, E2, G4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo import cells as _cells
from ..geo import tiles as _tiles
from ..operators import extract as E
from ..operators import geo as G


def mine_records(
    spark: SparkSession,
    pages: DataFrame,
    polygons_pdf: pd.DataFrame,
    cell_level: int = _cells.DEFAULT_LEVEL,
    tile_z: int = _tiles.DEFAULT_TILE_Z,
    verify_extraction: bool = False,
) -> DataFrame:
    """pages + polygons -> normalized records (FIXTURES.md §3 core fields).

    `verify_extraction=True` adds the E1 output column (`extracted_text`)
    for byte-identity checks; production leaves it off so the html column
    is pruned from the scan when text is already materialized.
    """
    valid, _quarantine = E.split_valid(pages)
    df = valid.filter(F.col("lang").isin("en", "fr"))

    if verify_extraction:
        df = df.withColumn("extracted_text", E.extract_text_udf("html"))
        text_col = "extracted_text"
    else:
        # Use materialized text when present; extract only where missing.
        # The when() nulls the UDF INPUT for rows that already have text:
        # ArrowEvalPython evaluates UDFs unconditionally (coalesce cannot
        # short-circuit through it), so this is what keeps the html bytes
        # of already-extracted pages off the Arrow boundary entirely.
        df = df.withColumn(
            "extracted_text",
            F.coalesce(
                F.col("text"),
                E.extract_text_udf(
                    F.when(F.col("text").isNull(), F.col("html"))
                ),
            ),
        )
        text_col = "extracted_text"

    df = E.with_payloads(df, text_col)
    df = E.with_bilingual(df, text_col, "notes")

    # Point coordinates: points carry (lat, lon); bboxes use their centroid
    # for cell/tile keys but keep the full bounds for the spatial field.
    df = df.withColumn(
        "pt_lat",
        F.when(F.col("kind") == "point", F.col("lat")).otherwise(
            (F.col("south") + F.col("north")) / 2
        ),
    ).withColumn(
        "pt_lon",
        F.when(F.col("kind") == "point", F.col("lon")).otherwise(
            (F.col("west") + F.col("east")) / 2
        ),
    )

    df = df.withColumn(
        "cell_id", G.cell_encode_col(F.col("pt_lon"), F.col("pt_lat"), cell_level)
    )
    tx, ty = G.tile_cols(F.col("pt_lon"), F.col("pt_lat"), tile_z)
    df = (
        df.withColumn("tile_z", F.lit(tile_z).cast("int"))
        .withColumn("tile_x", tx)
        .withColumn("tile_y", ty)
    )

    # payload ordinal comes from posexplode (array position) — stable,
    # deterministic, and no window shuffle (E7)
    df = df.withColumn("record_id", E.record_id_col(F.col("url"), F.col("payload_idx")))

    df = df.withColumn(
        "spatial",
        F.when(
            F.col("kind") == "bbox",
            E.geojson_bbox_col(
                F.col("west"), F.col("south"), F.col("east"), F.col("north")
            ),
        ),
    )

    # Narrow the row BEFORE the PIP Arrow boundary: html (binary!) and the
    # raw text/lang columns must not ride through the Python stage — at
    # 10^12 pages that transfer, not the ray cast, would be the bottleneck.
    df = df.select(
        "record_id", "url", "warc_ts", "notes_en", "notes_fr", "spatial",
        "kind", "lat", "lon", "west", "south", "east", "north",
        "cell_id", "tile_z", "tile_x", "tile_y", "extracted_text",
        "pt_lat", "pt_lon",
    )
    records = G.pip_join(
        spark,
        df,
        polygons_pdf,
        lon_col="pt_lon",
        lat_col="pt_lat",
        how="left",
    )
    return records.select(
        "record_id",
        "url",
        "warc_ts",
        "notes_en",
        "notes_fr",
        "spatial",
        "kind",
        "lat",
        "lon",
        "west",
        "south",
        "east",
        "north",
        "cell_id",
        "polygon_id",
        "tile_z",
        "tile_x",
        "tile_y",
        "extracted_text",
    )


def tile_summary(records: DataFrame) -> DataFrame:
    """A1/O1: matched records per (tile, polygon) — the flagship answer."""
    return (
        records.filter(F.col("polygon_id").isNotNull())
        .groupBy("tile_z", "tile_x", "tile_y", "polygon_id")
        .agg(
            F.count("*").alias("n_records"),
            F.countDistinct("url").alias("n_urls"),
        )
        .orderBy("tile_z", "tile_x", "tile_y", "polygon_id")
    )
