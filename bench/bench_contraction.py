"""One-off scale measurement for the contraction loop (round 4, VERDICT
r3 missing-#6): connected_components at >= 1M nodes, in the two regimes
that bound its behavior.

- "sparse": 1M nodes, ~0.6M random edges — many small components (the
  production near-dup shape: clusters are tiny, the loop ends in 2-3
  rounds). Random pairing keeps expected component size O(1)..O(log n).
- "percolated": one 1M-node PATH with randomly permuted ids — a single
  max-diameter component, the worst case that plain min-label
  propagation needs 10^6 rounds for and the contraction + full pointer
  jumping collapses in a handful.

Reports rounds and per-round seconds; numbers go into the
connected_components docstring + BENCH/BASELINE.md per house style
(bench.py:45 excludes dbscan from the per-round bench because per-round
FIXED cost dominates tiny inputs — this run is the evidence that the
per-round work amortizes at real scale).

Usage: python bench/bench_contraction.py [n_nodes] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def main() -> None:
    from pyspark.sql import functions as F

    from harvester_fgp_spark.operators.dedup import connected_components
    from harvester_fgp_spark.session import build_session

    spark = build_session(
        app_name="hfs-bench-contraction",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    out: dict = {"n_nodes": N, "cpus": CPUS, "regimes": {}}

    ids = spark.range(N).select(F.col("id").alias("doc_id"))

    # deterministic pseudo-random permutation of [0, N): multiply by an
    # odd constant mod a power of two >= N, rejecting overflow ids —
    # xxhash-free so the same graph regenerates exactly across runs
    def perm(col):
        m = 1
        while m < N:
            m <<= 1
        return (col * 2654435761 + 12345) % m

    regimes = {}
    # sparse: 0.6M random edges over 1M nodes
    e = spark.range(int(N * 0.6)).select(
        (perm(F.col("id")) % N).alias("id_a"),
        (perm(F.col("id") + 7777777) % N).alias("id_b"),
    ).filter(F.col("id_a") != F.col("id_b"))
    regimes["sparse"] = e
    # percolated: a single path 0-1-2-...-(N-1) under a permuted labeling
    p = spark.range(N - 1).select(
        perm(F.col("id")).alias("id_a"),
        perm(F.col("id") + 1).alias("id_b"),
    )
    path_ids = spark.range(N).select(perm(F.col("id")).alias("doc_id"))
    regimes["percolated"] = p

    for name, edges in regimes.items():
        node_frame = ids if name == "sparse" else path_ids
        edges = edges.localCheckpoint()
        n_edges = edges.count()
        stats: dict = {}
        t0 = time.monotonic()
        cc = connected_components(
            node_frame, edges, id_col="doc_id", stats=stats
        )
        n_clusters = cc.select("cluster_id").distinct().count()
        sec = time.monotonic() - t0
        out["regimes"][name] = {
            "n_edges": n_edges,
            "n_clusters": n_clusters,
            "total_sec": round(sec, 2),
            "rounds": stats.get("rounds", []),
        }
        print(f"{name}: {n_edges} edges -> {n_clusters} clusters "
              f"in {sec:.1f}s; rounds (edges_in, sec) = "
              f"{stats.get('rounds')}", file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
