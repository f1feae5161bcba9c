"""Fixed, explicit schemas (SURVEY.md §1.2).

The reference harvester uses dynamic dict-of-values records with
mandatory-field validation only (SURVEY §1.1); this engine replaces that
with declared StructType constants end-to-end — inference is used nowhere
outside tests.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Primary input — exact shape mandated by BASELINE.json:15.
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# One mined geo-payload (E2 output element). kind: 'point' | 'bbox'.
PAYLOAD_STRUCT = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("lat", DoubleType(), True),
        StructField("lon", DoubleType(), True),
        StructField("west", DoubleType(), True),
        StructField("south", DoubleType(), True),
        StructField("east", DoubleType(), True),
        StructField("north", DoubleType(), True),
    ]
)

PAYLOADS_TYPE = ArrayType(PAYLOAD_STRUCT)

# FGP-collection-style join dimension (FIXTURES.md §2) — broadcast side.
RING_POINT = StructType(
    [StructField("x", DoubleType(), False), StructField("y", DoubleType(), False)]
)

POLYGONS_SCHEMA = StructType(
    [
        StructField("polygon_id", StringType(), False),
        StructField("name_en", StringType(), False),
        StructField("name_fr", StringType(), False),
        StructField("ring", ArrayType(RING_POINT), False),
        StructField("minx", DoubleType(), False),
        StructField("miny", DoubleType(), False),
        StructField("maxx", DoubleType(), False),
        StructField("maxy", DoubleType(), False),
    ]
)

# Normalized-record output (FIXTURES.md §3) — field-for-field reconstruction
# of the reference harvester's CKAN-ish record (SURVEY §1.1, [REF?]-grade).
RECORD_SCHEMA = StructType(
    [
        StructField("record_id", StringType(), False),
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("title_en", StringType(), True),
        StructField("title_fr", StringType(), True),
        StructField("notes_en", StringType(), True),
        StructField("notes_fr", StringType(), True),
        StructField("keywords", ArrayType(StringType()), True),
        StructField("topic_category", StringType(), True),
        StructField("frequency", StringType(), True),
        StructField("spatial", StringType(), True),
        StructField("kind", StringType(), False),
        StructField("lat", DoubleType(), True),
        StructField("lon", DoubleType(), True),
        StructField("west", DoubleType(), True),
        StructField("south", DoubleType(), True),
        StructField("east", DoubleType(), True),
        StructField("north", DoubleType(), True),
        StructField("cell_id", LongType(), True),
        StructField("polygon_id", StringType(), True),
        StructField("tile_z", IntegerType(), True),
        StructField("tile_x", IntegerType(), True),
        StructField("tile_y", IntegerType(), True),
        StructField("extracted_text", StringType(), True),
    ]
)

# Checkpoint / lineage table (FIXTURES.md §4, BASELINE.json:14).
CHECKPOINT_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("tile_id", LongType(), False),
        StructField("row_count", LongType(), False),
        StructField("input_fingerprint", StringType(), False),
        StructField("completed_at", TimestampType(), False),
    ]
)

# Driver-provided oracle tables (TESTDATA.md) — names used by sources.testdata.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
