"""SemDeDup at 1M vectors under auto-k (round 7, VERDICT r6 next-#5).

Deterministic seed-42 vectors (dim D) + 1% planted exact twins; runs
``semantic_dedup`` with the auto-sized quantizer (n_cells=None ->
~sqrt(n), cost-capped) and records: chosen k, cluster-scoped candidate
pairs vs the all-pairs n(n-1)/2 it replaces, planted-twin recall (must
be exactly 1.0 — twins co-cluster under any centroid set), and wall
seconds. The point on record: with auto-k the pair volume stays ~n^1.5
instead of the fixed-k=8 default's n^2/16.

Usage: python bench/bench_semantic_scale.py [n_vectors] [dim] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D = int(sys.argv[2]) if len(sys.argv) > 2 else 32
CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else 16


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from harvester_fgp_spark.operators.similarity import semantic_dedup
    from harvester_fgp_spark.session import build_session

    path = f"/tmp/bench_semantic_{N}_{D}.parquet"
    if not os.path.exists(path):
        rng = np.random.default_rng(42)
        # clustered-ish corpus: 1000 latent topics so k-means has real
        # structure to find (uniform vectors make every cell equal-sized
        # anyway; topical structure is the realistic harder case)
        topics = rng.normal(size=(1000, D)).astype(np.float32)
        assign = rng.integers(0, 1000, size=N)
        v = topics[assign] + rng.normal(scale=0.3, size=(N, D)).astype(
            np.float32
        )
        ids = np.arange(N, dtype=np.int64)
        tw = N // 100
        twin_ids = ids[:tw] + 10_000_000
        allv = np.concatenate([v, v[:tw]])
        allid = np.concatenate([ids, twin_ids])
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(allid),
                    "embedding": pa.array(list(allv), type=pa.list_(pa.float32())),
                }
            ),
            path,
            row_group_size=131_072,
        )
    spark = build_session(
        master=f"local[{CPUS}]", shuffle_partitions=max(CPUS * 2, 32)
    )
    vec = spark.read.parquet(path)
    stats: dict = {}
    t0 = time.time()
    out = semantic_dedup(vec, threshold=0.9999, stats=stats)
    dropped = out.localCheckpoint()
    n_dropped = dropped.count()
    wall = time.time() - t0
    tw = N // 100
    recall = (
        dropped.filter(
            (F.col("dropped_id") >= 10_000_000)
            & (F.col("kept_id") == F.col("dropped_id") - 10_000_000)
        ).count()
        / tw
    )
    print(
        json.dumps(
            {
                "n": stats.get("n"),
                "dim": D,
                "cpus": CPUS,
                "auto_k": stats.get("k"),
                "scoped_pairs": stats.get("scoped_pairs"),
                "all_pairs": stats.get("all_pairs"),
                "pair_reduction_x": round(
                    stats["all_pairs"] / max(stats["scoped_pairs"], 1), 1
                ),
                "planted": tw,
                "dropped": n_dropped,
                "twin_recall": recall,
                "wall_sec": round(wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
