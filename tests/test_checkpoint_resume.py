"""Resume semantics (SURVEY.md §5.2-5, BASELINE.json:14).

Kill-after-K-tiles simulation: complete a subset of tiles, then assert the
resume filter reruns only the remainder and the combined output equals an
uninterrupted run.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from harvester_fgp_spark.sinks import checkpoint as C
from harvester_fgp_spark.plans.pipeline import mine_records
from harvester_fgp_spark.synth import generate_polygons, pages_df


def _records(spark):
    pages = pages_df(spark, 800, seed=42)
    ppdf = generate_polygons(60, seed=42)
    return C.with_tile_id(mine_records(spark, pages, ppdf))


def test_resume_skips_completed_tiles(spark, tmp_path):
    out = str(tmp_path / "records")
    cp = str(tmp_path / "checkpoint")

    records = _records(spark)
    tiles = [r.tile_id for r in records.select("tile_id").distinct().collect()]
    assert len(tiles) >= 4
    half = set(tiles[: len(tiles) // 2])

    # run 1 "crashes" after writing half the tiles
    run1 = records.filter(F.col("tile_id").isin(half))
    C.write_records_and_checkpoint(run1, out, cp, run_id="run1")

    done = {r.tile_id for r in C.completed_tiles(spark, cp).collect()}
    assert done == half

    # resume: only the other half is pending
    pending = C.resume_filter(records, spark, cp)
    pending_tiles = {r.tile_id for r in pending.select("tile_id").distinct().collect()}
    assert pending_tiles == set(tiles) - half

    C.write_records_and_checkpoint(pending, out, cp, run_id="run2")

    # final output == uninterrupted run (same rows, all tiles)
    final = spark.read.parquet(out)
    assert final.count() == records.count()
    assert final.select("record_id").exceptAll(records.select("record_id")).count() == 0

    # lineage row counts reconcile with the data
    lineage = spark.read.parquet(cp)
    per_tile_cp = {
        r.tile_id: r.total
        for r in lineage.groupBy("tile_id").agg(F.sum("row_count").alias("total")).collect()
    }
    per_tile_data = {
        r.tile_id: r.cnt
        for r in final.groupBy("tile_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert per_tile_cp == per_tile_data


def test_rerun_tile_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "records")
    cp = str(tmp_path / "checkpoint")
    records = _records(spark)
    one_tile = records.select("tile_id").first().tile_id
    slice1 = records.filter(F.col("tile_id") == one_tile)
    C.write_records_and_checkpoint(slice1, out, cp, run_id="a")
    C.write_records_and_checkpoint(slice1, out, cp, run_id="b")  # replay
    final = spark.read.parquet(out)
    # dynamic partition overwrite: replay does not duplicate rows
    assert final.count() == slice1.count()


def test_verify_lineage_detects_tampering(spark, tmp_path):
    """S5 audit: clean write verifies; a tampered tile is flagged."""
    import shutil
    from pathlib import Path

    out = str(tmp_path / "records")
    cp = str(tmp_path / "checkpoint")
    records = _records(spark)
    C.write_records_and_checkpoint(records, out, cp, run_id="audit")
    assert C.verify_lineage(spark, out, cp).count() == 0

    # tamper: drop one tile's data directory entirely
    tile_dirs = sorted(p for p in Path(out).iterdir() if p.name.startswith("tile_id="))
    assert len(tile_dirs) >= 2
    shutil.rmtree(tile_dirs[0])
    bad = C.verify_lineage(spark, out, cp)
    assert bad.count() >= 1  # the deleted tile shows as a discrepancy


def test_compact_records_preserves_data_and_shrinks_files(spark, tmp_path):
    """Compaction: same rows + green lineage audit after, fewer files,
    per-file budget respected, rows clustered by cell within files."""
    import glob
    import os

    out = str(tmp_path / "records")
    cp = str(tmp_path / "checkpoint")
    records = _records(spark)
    # force a small-file mess: one file per (tile, shuffle partition)
    C.write_records_and_checkpoint(
        records.repartition(16), out, cp, run_id="run1"
    )

    def _files():
        return [
            f
            for f in glob.glob(os.path.join(out, "tile_id=*", "*.parquet"))
            if os.path.getsize(f) > 0
        ]

    before_rows = spark.read.parquet(out).count()
    before_files = len(_files())

    # target=2 so some tiles genuinely need MULTIPLE files — a larger
    # target made every tile a single group and the budget assertion
    # vacuous (review finding: the old hash-on-(tile,fidx) plan merged
    # colliding same-tile groups into oversized files and still passed)
    target = 2
    C.compact_records(spark, out, target_rows_per_file=target)

    after = spark.read.parquet(out)
    assert after.count() == before_rows
    assert (
        after.select("record_id")
        .exceptAll(records.select("record_id"))
        .count()
        == 0
    )
    after_files = len(_files())
    assert after_files < before_files
    # HARD budget: no single file exceeds target rows
    import pyarrow.parquet as pq

    per_file = [pq.read_metadata(f).num_rows for f in _files()]
    assert max(per_file) <= target
    # exact per-tile file count: ceil(rows / target), and some tile >1
    per_tile = {
        r["tile_id"]: r["n"]
        for r in after.groupBy("tile_id").agg(F.count("*").alias("n")).collect()
    }
    import math

    expected = sum(math.ceil(n / target) for n in per_tile.values())
    assert after_files == expected
    assert any(n > target for n in per_tile.values())
    # lineage audit still green: same rows/fingerprints per tile
    assert C.verify_lineage(spark, out, cp).count() == 0


def test_vacuum_checkpoint_preserves_audit_semantics(spark, tmp_path):
    """After idempotent replays bloat the lineage table, vacuuming keeps
    the audit green, shrinks the table to one commit per tile, and the
    resume filter still sees every completed tile."""
    out = str(tmp_path / "records")
    cp = str(tmp_path / "checkpoint")
    records = _records(spark)
    C.write_records_and_checkpoint(records, out, cp, run_id="run1")
    C.write_records_and_checkpoint(records, out, cp, run_id="run1")  # replay
    C.write_records_and_checkpoint(records, out, cp, run_id="run2")  # rerun

    n_tiles = records.select("tile_id").distinct().count()
    assert spark.read.parquet(cp).count() > n_tiles  # bloated
    assert C.verify_lineage(spark, out, cp).count() == 0

    C.vacuum_checkpoint(spark, cp)

    after = spark.read.parquet(cp)
    # safe grain: ONE commit per (run, tile) — run1's replay collapsed,
    # run2's rerun preserved as its own commit (never merged across runs)
    assert (
        after.groupBy("run_id", "tile_id")
        .agg(F.count_distinct("completed_at").alias("n"))
        .filter(F.col("n") > 1)
        .count()
        == 0
    )
    assert {r.run_id for r in after.select("run_id").distinct().collect()} == {
        "run1", "run2"
    }
    # aggressive grain (batch-only table): one commit per tile
    C.vacuum_checkpoint(spark, cp, aggressive=True)
    after = spark.read.parquet(cp)
    assert (
        after.groupBy("tile_id")
        .agg(F.count_distinct("completed_at").alias("n"))
        .filter(F.col("n") > 1)
        .count()
        == 0
    )
    assert C.verify_lineage(spark, out, cp).count() == 0
    done = {r.tile_id for r in C.completed_tiles(spark, cp).collect()}
    assert len(done) == n_tiles
