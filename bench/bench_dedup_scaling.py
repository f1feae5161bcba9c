"""Two-parallelism scaling evidence for the DEDUP path (round 6).

The flagship spatial pipeline's N-vs-4N measurement (bench_scaling.py)
left the second-most-expensive production path — minhash signature ->
band shuffle -> bucket pair expansion -> exact Jaccard verify — with
per-query times only (VERDICT r5 missing-#3). This runs the IDENTICAL
minhash_near_dup_pairs job at local[N_LOW] and local[N_HIGH] on the
IDENTICAL deterministic doc table (seed-42 synthetic pages + 1% planted
duplicates so the verify join does real work), each run in a fresh
taskset-pinned subprocess, and appends throughput at both plus the
scaling efficiency to BENCH/BASELINE.md (after the generated marker, so
bench_scaling.py regenerations preserve it).

Usage: python bench/bench_dedup_scaling.py [n_docs] [n_low] [n_high]
Inner (one pinned measurement): ... --inner <cpus> <n_docs>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WARMUP_DOCS = 500_000  # enough to spawn the full Python-worker pool


def _docs_parquet(spark, n: int) -> str:
    """Deterministic doc table: seed-42 pages (bench.py's cache) with 1%
    planted exact duplicates (doc_id suffixed) — identical at every
    parallelism level, and the duplicates guarantee the verify stage
    streams real candidate pairs instead of an empty join."""
    from pyspark.sql import functions as F

    from bench import _pages_parquet

    path = f"/tmp/hfs_dedup_docs_{n}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        pages = spark.read.parquet(_pages_parquet(spark, n))
        docs = pages.select(
            F.col("url").alias("doc_id"), F.col("text")
        )
        dups = (
            docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(100)) == 0)
            .withColumn("doc_id", F.concat(F.col("doc_id"), F.lit("#dup")))
        )
        # 128 output files: a small parquet file is ONE row group and
        # row groups are the split unit, so the first smoke run's 8-file
        # table capped the signature scan at 8 tasks and local[16]
        # measured 0.266 efficiency — an input-layout artifact, not the
        # operator. 128 files + the 8 MB maxPartitionBytes in inner()
        # give both parallelism levels full scan fan-out.
        docs.unionByName(dups).repartition(128).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def inner(cpus: int, n: int) -> None:
    from harvester_fgp_spark.operators.dedup import minhash_near_dup_pairs
    from harvester_fgp_spark.session import build_session

    spark = build_session(
        app_name="hfs-dedup-scaling",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 32),
        extra_conf={
            # see _docs_parquet: keep scan splits well above core count
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        },
    )
    path = _docs_parquet(spark, n)
    warm_path = _docs_parquet(spark, WARMUP_DOCS)
    # warmup on a small slice: spawns the worker pool + JIT without
    # paying a full-size run twice
    minhash_near_dup_pairs(
        spark.read.parquet(warm_path), id_col="doc_id"
    ).count()
    docs = spark.read.parquet(path)
    t0 = time.monotonic()
    pairs = minhash_near_dup_pairs(docs, id_col="doc_id").count()
    sec = time.monotonic() - t0
    n_docs = docs.count()
    print(json.dumps({
        "cpus": cpus, "docs": n_docs, "pairs": pairs,
        "sec": round(sec, 3), "docs_per_sec": round(n_docs / sec, 1),
    }))


def run_at(cpus: int, n: int) -> dict:
    out = subprocess.run(
        [
            "taskset", "-c", f"0-{cpus - 1}",
            sys.executable, os.path.abspath(__file__),
            "--inner", str(cpus), str(n),
        ],
        capture_output=True, text=True, check=True, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    ratio = n_high // n_low
    # interleaved best-of-2 per level (same host-noise argument as
    # bench_scaling.py)
    lows, highs = [], []
    for _ in range(2):
        lows.append(run_at(n_low, n))
        highs.append(run_at(n_high, n))
    lo = max(lows, key=lambda r: r["docs_per_sec"])
    hi = max(highs, key=lambda r: r["docs_per_sec"])
    eff = hi["docs_per_sec"] / (ratio * lo["docs_per_sec"])
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    assert lo["pairs"] == hi["pairs"], (lo, hi)
    md = f"""
## Dedup-path scaling at {n / 1e6:g}M docs ({stamp})

`python bench/bench_dedup_scaling.py {n} {n_low} {n_high}` — the minhash
near-dup pipeline (fused Arrow-native signature+banding mapInArrow
stage -> fixed-width band shuffle -> bucket pair expansion -> auto-sized
broadcast text fetch -> exact Jaccard verify) on seed-42 pages + 1%
planted duplicates
({lo["docs"]:,} docs, {lo["pairs"]:,} verified pairs, identical at both
levels); fresh taskset-pinned subprocess per run, small-slice warmup,
best of 2 interleaved attempts per level.

| parallelism | docs/sec | sec |
|---|---|---|
| local[{n_low}]  (N)  | {lo["docs_per_sec"]:,.1f} | {lo["sec"]} |
| local[{n_high}] (4N) | {hi["docs_per_sec"]:,.1f} | {hi["sec"]} |

**Scaling efficiency = {eff:.3f}** (north-rule target: >= 0.8)
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)
    print(json.dumps({
        "tp_low": lo["docs_per_sec"], "tp_high": hi["docs_per_sec"],
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--inner":
        inner(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
