"""Partitioned-vacuum timing at breadth (round 6, VERDICT r5 next-#5).

The round-5 layout claims vacuum cost scales with the AFFECTED runs'
rows, not the table's lifetime. Evidence: synthesize a lineage table of
N_RUNS runs x N_TILES tiles, each run replayed once (2 commits -> 50%
garbage), in BOTH layouts, then time

  - partitioned, runs=[one]   (the retention call a pipeline makes)
  - partitioned, all runs     (N independent leaf swaps)
  - flat, whole-table         (the only option without the layout)

The lineage rows are synthesized directly at the checkpoint schema —
vacuum never reads the records table, so driving mine_records here
would only add noise. byte-identity of untouched leaves is pytest's
job (tests/test_round6_scale.py); this file is the clock.

Usage: python bench/bench_vacuum.py [n_tiles] [n_runs]
Appends the measured table to BENCH/BASELINE.md and prints a JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_TILES = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
N_RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def main() -> None:
    from pyspark.sql import functions as F

    from harvester_fgp_spark.session import build_session
    from harvester_fgp_spark.sinks.checkpoint import vacuum_checkpoint

    spark = build_session(app_name="hfs-bench-vacuum", master="local[16]",
                          shuffle_partitions=32)
    base = "/tmp/hfs_bench_vacuum"
    shutil.rmtree(base, ignore_errors=True)
    part_dir, flat_dir = f"{base}/part", f"{base}/flat"

    def commit(run: str):
        return spark.range(N_TILES).select(
            F.lit(run).alias("run_id"),
            F.lit("records").alias("stage"),
            F.spark_partition_id().alias("partition_id"),
            F.col("id").alias("tile_id"),
            F.lit(1).cast("long").alias("row_count"),
            F.format_string("%016x", F.xxhash64("id"))
            .alias("input_fingerprint"),
            F.current_timestamp().alias("completed_at"),
            F.lit(uuid.uuid4().hex).alias("commit_token"),
        )

    for i in range(N_RUNS):
        for _ in range(2):  # original + one replay -> 50% garbage rows
            c = commit(f"run-{i:02d}")
            c.write.mode("append").partitionBy("stage", "run_id").parquet(
                part_dir
            )
            c.write.mode("append").parquet(flat_dir)

    def timed(fn):
        t0 = time.monotonic()
        fn()
        return round(time.monotonic() - t0, 3)

    one = timed(lambda: vacuum_checkpoint(spark, part_dir, runs=["run-03"]))
    all_runs = timed(lambda: vacuum_checkpoint(spark, part_dir))
    flat = timed(lambda: vacuum_checkpoint(spark, flat_dir))
    rows = spark.read.parquet(part_dir).count()
    assert rows == N_RUNS * N_TILES, rows  # every replay collapsed

    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    md = f"""
## Partitioned-vacuum timing at breadth (round 6, {stamp})

`python bench/bench_vacuum.py {N_TILES} {N_RUNS}` — lineage table of
{N_RUNS} runs x {N_TILES:,} tiles, every run replayed once (2 commits,
50% garbage), local[16]:

| vacuum call | sec |
|---|---|
| partitioned, `runs=[one]` (retention hook) | {one} |
| partitioned, all {N_RUNS} runs | {all_runs} |
| flat, whole-table | {flat} |

Single-run vacuum cost is independent of the other {N_RUNS - 1} runs
(their leaves are never read — byte-identity pinned by
tests/test_round6_scale.py); the flat layout pays the whole table on
every call, which at 10^7 tiles x years of runs is the difference
between a bounded maintenance op and a full-table rewrite.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)
    print(json.dumps({
        "n_tiles": N_TILES, "n_runs": N_RUNS,
        "sec_one_run": one, "sec_all_runs": all_runs, "sec_flat": flat,
    }))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
