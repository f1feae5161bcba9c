"""DBSCAN (operators/cluster.py) + corpus split/postings (textops).

The DBSCAN gate query is exact-oracle-checked against a brute-force
recursive-CTE DuckDB twin; these tests cover the operator directly:
grid-join completeness vs an all-pairs numpy reference (random inputs),
the planted-quad core guarantee the fixtures rely on, and cache hygiene.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _brute_dbscan(ids, xy, eps, min_pts):
    """All-pairs reference: returns {pid: (role, cluster_id)} with the
    same deterministic border rule (min neighboring core cluster)."""
    n = len(ids)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    nbr = (d2 <= eps * eps) & ~np.eye(n, dtype=bool)
    core = nbr.sum(1) + 1 >= min_pts
    # connected components over core-core edges (union-find)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        if not core[i]:
            continue
        for j in range(i + 1, n):
            if core[j] and nbr[i, j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    label = {}
    for i in range(n):
        if core[i]:
            comp = [j for j in range(n) if core[j] and find(j) == find(i)]
            label[ids[i]] = ("core", min(ids[j] for j in comp))
    for i in range(n):
        if core[i]:
            continue
        cores_near = [ids[j] for j in range(n) if core[j] and nbr[i, j]]
        if cores_near:
            label[ids[i]] = (
                "border",
                min(label[c][1] for c in cores_near),
            )
        else:
            label[ids[i]] = ("noise", None)
    return label


@pytest.mark.parametrize(
    "seed,min_pts", [(0, 4), (1, 4), (2, 4), (0, 2)]
)
def test_dbscan_matches_brute_force(spark, seed, min_pts):
    from harvester_fgp_spark.operators.cluster import dbscan

    rng = np.random.default_rng(seed)
    n = 120
    # mix of dense blobs and uniform scatter so all roles occur
    blobs = rng.integers(-500, 500, size=(4, 2))
    pts = np.concatenate(
        [
            blobs[rng.integers(0, 4, n // 2)]
            + rng.integers(-60, 60, size=(n // 2, 2)),
            rng.integers(-2000, 2000, size=(n - n // 2, 2)),
        ]
    )
    ids = list(range(1, n + 1))
    eps = 150
    expected = _brute_dbscan(ids, pts, eps, min_pts)

    df = spark.createDataFrame(
        [(i, int(x), int(y)) for i, (x, y) in zip(ids, pts)],
        "pid long, x long, y long",
    )
    got = {
        r["pid"]: (r["role"], r["cluster_id"])
        for r in dbscan(df, eps=eps, min_pts=min_pts).collect()
    }
    assert got == expected


def test_dbscan_planted_quad_is_core(spark):
    """Four points pairwise within eps (each <= eps/2 from a base point)
    must all be core at min_pts=4 and share one cluster — the guarantee
    the gate fixtures (plans/derived.py:dbscan_points) are built on."""
    from harvester_fgp_spark.operators.cluster import dbscan

    quad = [(1, 0, 0), (2, 200, 0), (3, 0, 200), (4, -200, -100)]
    lone = [(9, 10000, 10000)]
    df = spark.createDataFrame(quad + lone, "pid long, x long, y long")
    rows = {r["pid"]: r for r in dbscan(df, eps=600, min_pts=4).collect()}
    assert all(rows[i]["role"] == "core" for i in (1, 2, 3, 4))
    assert len({rows[i]["cluster_id"] for i in (1, 2, 3, 4)}) == 1
    assert rows[9]["role"] == "noise" and rows[9]["cluster_id"] is None


def test_connected_components_long_chain(spark):
    """Regression (round 3): a deep MONOTONE-id path — the adversarial
    shape for min-label algorithms. Plain propagation needs diameter
    rounds (and the persist-only loop OOM'd the driver stringifying its
    exponentially-doubling logical plan); partial pointer jumps yield a
    near-bijection that merges nothing. The contraction algorithm
    (adoption map flattened to idempotence, exact edges-empty
    termination) must converge well inside max_iter — and raises, never
    silently under-merges, if it can't."""
    from harvester_fgp_spark.operators.dedup import connected_components

    n = 300
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = connected_components(ids, edges).collect()
    assert len(got) == n
    assert {r["cluster_id"] for r in got} == {0}


def test_dbscan_snake_cluster(spark):
    """A 200-point chain spaced eps/2 apart (every point sees 4
    neighbors -> core at min_pts=4) must come out as ONE cluster — the
    deep-diameter shape that broke the pre-jump label propagation."""
    from harvester_fgp_spark.operators.cluster import dbscan

    df = spark.createDataFrame(
        [(i, 50 * i, 0) for i in range(200)], "pid long, x long, y long"
    )
    rows = dbscan(df, eps=100, min_pts=4).collect()
    # chain ends see only 2 neighbors -> border; cores are 1..198, so the
    # cluster label (min core id) is 1
    assert {r["cluster_id"] for r in rows} == {1}
    # interior points are core; only the two chain ends are border
    roles = {r["pid"]: r["role"] for r in rows}
    assert roles[100] == "core"
    assert all(v != "noise" for v in roles.values())


def test_hash_split_partitions_and_determinism(spark):
    from harvester_fgp_spark.operators.textops import (
        hash_bucket_col,
        hash_split_col,
    )

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = df.select(
        "doc_id",
        hash_split_col(F.col("doc_id")).alias("split"),
        hash_bucket_col(F.col("doc_id"), lo=16).alias("sb"),
    )
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # a partition: every doc in one split
    assert set(counts) == {"train", "validation", "test"}
    assert 0.85 <= counts["train"] / 2000 <= 0.95
    # rerun = identical assignment (pure function of the key)
    again = out.collect()
    assert sorted(map(tuple, again)) == sorted(
        map(tuple, out.collect())
    )
    # sample slice is an independent stream: both splits contain samples
    sampled = out.filter(F.col("sb") < 10).count()
    assert 0.05 <= sampled / 2000 <= 0.15


def test_inverted_postings_hand_example(spark):
    from harvester_fgp_spark.operators.textops import inverted_postings

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana banana cherry"),
            (3, "apple cherry cherry zebra"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["term"]: (r["df"], r["postings"])
        for r in inverted_postings(docs, k=2, min_df=2).collect()
    }
    # apple: tf {1:2, 3:1} -> "1:2,3:1"; banana: {2:2, 1:1}; cherry: {3:2, 2:1}
    assert got == {
        "apple": (2, "1:2,3:1"),
        "banana": (2, "2:2,1:1"),
        "cherry": (2, "3:2,2:1"),
    }  # zebra: df=1, trimmed by min_df


def test_decontaminate_hand_example(spark):
    from harvester_fgp_spark.operators.dedup import decontaminate

    bench_text = " ".join(f"w{i}" for i in range(13))  # exactly one window
    corpus = spark.createDataFrame(
        [
            (1, bench_text),  # identical -> shares the window
            (2, "pre1 pre2 " + bench_text + " post"),  # embedded -> shares
            (3, " ".join(f"w{i}" for i in range(12))),  # too short -> clean
            (4, " ".join(f"x{i}" for i in range(30))),  # unrelated -> clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(bench_text,)], "text string")
    got = {
        r["doc_id"]: r["n_shared"] for r in decontaminate(corpus, bench).collect()
    }
    assert got == {1: 1, 2: 1}


def test_domain_mix_thresholds_and_determinism(spark):
    from harvester_fgp_spark.operators.textops import domain_mix

    rows = (
        [(i, "a") for i in range(1000)]
        + [(10000 + i, "b") for i in range(500)]
        + [(20000 + i, "c") for i in range(250)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_mix(
        docs,
        lambda s: F.when(s == "a", 1).when(s == "b", 2).otherwise(1),
    )
    # binding source: b (500/2 = 250) ties c (250/1); T = 250
    # thr_a = floor(1e6 * 1 * 250 / 1000) = 250000; b and c keep all
    agg = {
        r["source"]: (r["thr"], r["n_kept"])
        for r in out.groupBy("source", "thr")
        .agg(F.count_if(F.col("kept")).alias("n_kept"))
        .collect()
    }
    assert agg["a"][0] == 250_000
    assert agg["b"] == (1_000_000, 500)
    assert agg["c"] == (1_000_000, 250)
    # sha2-keyed selection: close to the target rate and deterministic
    assert 0.2 <= agg["a"][1] / 1000 <= 0.3
    again = {
        r["source"]: r["n_kept"]
        for r in domain_mix(
            docs, lambda s: F.when(s == "a", 1).when(s == "b", 2).otherwise(1)
        )
        .groupBy("source")
        .agg(F.count_if(F.col("kept")).alias("n_kept"))
        .collect()
    }
    assert again == {s: v[1] for s, v in agg.items()}


def test_dbscan_min_pts_one_isolated_point_is_core(spark):
    """Review regression: a neighbor-less point counts ITSELF, so at
    min_pts=1 it is a singleton core cluster, not noise."""
    from harvester_fgp_spark.operators.cluster import dbscan

    df = spark.createDataFrame(
        [(1, 0, 0), (2, 10000, 10000)], "pid long, x long, y long"
    )
    rows = sorted(
        (r["pid"], r["role"], r["cluster_id"])
        for r in dbscan(df, eps=100, min_pts=1).collect()
    )
    assert rows == [(1, "core", 1), (2, "core", 2)]


def test_remove_duplicate_lines_hand_example(spark):
    """Boilerplate stripped everywhere, unique lines kept in order, a
    fully-boilerplate doc becomes empty (not null)."""
    from harvester_fgp_spark.operators.textops import remove_duplicate_lines

    docs = spark.createDataFrame(
        [
            (1, "keep one. SPAM. keep two"),
            (2, "SPAM. middle stays. SPAM"),
            (3, "SPAM. SPAM"),
            (4, "all unique here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in remove_duplicate_lines(
            docs, sep=". ", min_occurrences=3
        ).collect()
    }
    assert got == {
        1: "keep one. keep two",
        2: "middle stays",
        3: "",
        4: "all unique here",
    }
