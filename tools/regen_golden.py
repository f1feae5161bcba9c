"""Regenerate tests/golden/records_sf_small.parquet.

ONLY run when pipeline semantics change deliberately — the golden is the
stand-in for the reference harvester's outputs (SURVEY §5.2-4); silent
regeneration defeats the regression gate.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from harvester_fgp_spark.plans.pipeline import mine_records  # noqa: E402
from harvester_fgp_spark.session import build_session  # noqa: E402
from harvester_fgp_spark.synth import generate_polygons, pages_df  # noqa: E402


def main() -> None:
    spark = build_session(master="local[4]", shuffle_partitions=8)
    records = mine_records(
        spark, pages_df(spark, 500, seed=42), generate_polygons(60, seed=42)
    )
    pdf = (
        records.toPandas()
        .sort_values(["record_id", "polygon_id"], na_position="first")
        .reset_index(drop=True)
    )
    # list column -> tuples so the pytest frame comparison is unambiguous
    pdf["keywords"] = pdf["keywords"].map(
        lambda v: None if v is None else tuple(v)
    )
    pdf.to_parquet("/root/repo/tests/golden/records_sf_small.parquet", index=False)
    print(f"regenerated golden: {len(pdf)} rows")
    spark.stop()


if __name__ == "__main__":
    main()
