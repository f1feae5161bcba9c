"""Streaming store-dedup at scale-ish (round 7, VERDICT r6 next-#7).

Seeds a persistent signature store with N_STORE docs, then drives a
REAL structured stream (file source, maxFilesPerTrigger=1) of K
micro-batches of N_BATCH docs each through
``stream_dedup_incremental_store``. Each batch carries ~1% planted
copies of STORE docs, so the cross-era path (old signatures read from
the store, candidate texts fetched from the texts table) does real
work every batch.

Reported: per-batch wall seconds straight from the streaming engine's
progress events (triggerExecution), against the store size at that
batch. The claim under test: per-batch cost is FLAT in stream position
(state lives in the store layout; each batch pays O(batch) signature
work + one band-table scan that grows only with the store's fixed-width
band rows — 20 B/row — not its text bytes).

Usage: python bench/bench_streaming_store.py [n_store] [n_batch] [k] [cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_STORE = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 25_000
K = int(sys.argv[3]) if len(sys.argv) > 3 else 6
CPUS = int(sys.argv[4]) if len(sys.argv) > 4 else 16


def main() -> None:
    from pyspark.sql import functions as F

    from bench import _pages_parquet
    from harvester_fgp_spark.operators.dedup import update_minhash_store
    from harvester_fgp_spark.session import build_session
    from harvester_fgp_spark.streaming.pipeline import (
        stream_dedup_incremental_store,
    )

    spark = build_session(
        master=f"local[{CPUS}]", shuffle_partitions=max(CPUS * 2, 32)
    )
    base = "/tmp/bench_stream_store"
    shutil.rmtree(base, ignore_errors=True)
    store = f"{base}/store"
    src = f"{base}/src"
    pairs_out = f"{base}/pairs"
    ckpt = f"{base}/ckpt"
    os.makedirs(src, exist_ok=True)

    pages = spark.read.parquet(_pages_parquet(spark, N_STORE + K * N_BATCH))
    docs = pages.select(F.col("url").alias("doc_id"), "text")
    seed = docs.limit(N_STORE).localCheckpoint()
    t0 = time.time()
    update_minhash_store(seed, f"{store}/bands")
    seed.write.mode("overwrite").parquet(f"{store}/texts")
    seed_sec = time.time() - t0

    # K batch files: fresh docs + ~1% copies of store docs (cross-era dups)
    rest = docs.subtract(seed.select("doc_id", "text")).localCheckpoint()
    store_sample = seed.filter(
        F.pmod(F.xxhash64("doc_id"), F.lit(100)) == 0
    ).limit(N_BATCH // 100)
    for b in range(K):
        batch = (
            rest.filter(F.pmod(F.xxhash64("doc_id"), F.lit(K)) == b)
            .limit(N_BATCH)
            .unionByName(
                store_sample.withColumn(
                    "doc_id", F.concat("doc_id", F.lit(f"#replay{b}"))
                )
            )
        )
        batch.coalesce(1).write.mode("overwrite").parquet(f"{base}/b{b}")
        fn = [
            f
            for f in os.listdir(f"{base}/b{b}")
            if f.endswith(".parquet")
        ][0]
        shutil.copy(f"{base}/b{b}/{fn}", f"{src}/batch{b}.parquet")

    schema = "doc_id string, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_dedup_incremental_store(stream, store, pairs_out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    prog = [json.loads(p.json) for p in q.recentProgress]
    batches = [
        {
            "batch": p["batchId"],
            "rows": p["numInputRows"],
            "sec": round(p["durationMs"]["triggerExecution"] / 1000.0, 2),
        }
        for p in prog
        if p["numInputRows"] > 0
    ]
    n_pairs = spark.read.parquet(pairs_out).count()
    print(
        json.dumps(
            {
                "n_store": N_STORE,
                "n_batch": N_BATCH,
                "k": K,
                "cpus": CPUS,
                "seed_sec": round(seed_sec, 1),
                "batches": batches,
                "total_pairs": n_pairs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
