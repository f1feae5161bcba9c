"""Exact-kNN mode (round 3): the distance-bound escalation must return
the SAME answer as brute force even when nearest neighbors straddle
prefix-cell boundaries (where plain cell-join kNN is approximate), and
the restructured operator must leave nothing cached behind."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from harvester_fgp_spark.operators import geo as G


def _frames(spark, n_q=150, n_c=80, seed=5):
    rng = np.random.default_rng(seed)
    q = pd.DataFrame(
        {
            "qid": np.arange(n_q),
            "q_lat": rng.uniform(-70, 70, n_q),
            "q_lon": rng.uniform(-170, 170, n_q),
        }
    )
    c = pd.DataFrame(
        {
            "cid": np.arange(n_c),
            "c_lat": rng.uniform(-70, 70, n_c),
            "c_lon": rng.uniform(-170, 170, n_c),
        }
    )
    qdf = spark.createDataFrame(q).withColumn(
        "cell_id", G.cell_encode_col(F.col("q_lon"), F.col("q_lat"), 12)
    )
    cdf = spark.createDataFrame(c).withColumn(
        "cell_id", G.cell_encode_col(F.col("c_lon"), F.col("c_lat"), 12)
    )
    return q, c, qdf, cdf


def _brute(q, c, k):
    from harvester_fgp_spark.geo.distance import haversine_km

    exp = {}
    for qid in range(len(q)):
        d = haversine_km(
            np.full(len(c), q["q_lat"][qid]), np.full(len(c), q["q_lon"][qid]),
            c["c_lat"].to_numpy(), c["c_lon"].to_numpy(),
        )
        exp[qid] = list(np.argsort(d, kind="stable")[:k])
    return exp


def test_knn_exact_matches_brute_force_across_boundaries(spark):
    """Sparse global candidates at prefix_level=4: many queries' true
    neighbors live in OTHER prefix cells, which approximate mode misses —
    exact mode must recover every one of them."""
    q, c, qdf, cdf = _frames(spark)
    got = (
        G.knn_join(
            qdf, cdf, k=3, query_id="qid", cand_id="cid",
            prefix_level=4, exact=True,
        )
        .select("qid", "cid", "knn_rank")
        .toPandas()
        .sort_values(["qid", "knn_rank"])
    )
    exp = _brute(q, c, 3)
    assert len(got) == 3 * len(q)  # every query fully answered
    for qid, grp in got.groupby("qid"):
        assert list(grp["cid"]) == exp[qid], f"query {qid}"
    # the test has teeth: plain approximate mode at the same prefix level
    # must actually disagree somewhere on this layout
    approx = (
        G.knn_join(
            qdf, cdf, k=3, query_id="qid", cand_id="cid",
            prefix_level=4, exact=False, expand_underfilled=True,
        )
        .select("qid", "cid", "knn_rank")
        .toPandas()
        .sort_values(["qid", "knn_rank"])
    )
    approx_map = {
        qid: list(grp["cid"]) for qid, grp in approx.groupby("qid")
    }
    assert any(approx_map.get(qid) != exp[qid] for qid in exp)


def test_knn_exact_rank_round_mode(spark):
    """rank_round ranks on rounded distance + cand_id tiebreak (the
    oracle's order) while exactness still holds."""
    q, c, qdf, cdf = _frames(spark, seed=9)
    got = (
        G.knn_join(
            qdf, cdf, k=2, query_id="qid", cand_id="cid",
            prefix_level=4, exact=True, rank_round=6,
        )
        .select("qid", "cid", "dist_km", "knn_rank")
        .toPandas()
    )
    assert len(got) == 2 * len(q)
    # rounded surface: every dist has <= 6 decimals
    assert all(abs(v - round(v, 6)) < 1e-12 for v in got["dist_km"])


def test_knn_leaves_no_lingering_cache(spark):
    """Round-3 fix: the ring-expansion path derives underfilled queries
    from a per-prefix candidate histogram instead of persisting and
    re-consuming the join output — no persist() may outlive the call.
    The exact path localCheckpoints its per-level frames (so each
    level's join executes ONCE — review fix); checkpoint blocks free on
    JVM GC and the listener bus can pin the last query's refs, so the
    exact-path assertion is BOUNDED growth (<= 2 small frames per
    escalation level), not zero."""
    q, c, qdf, cdf = _frames(spark, n_q=60, n_c=10, seed=3)

    # OTHER tests' checkpoint blocks free asynchronously on JVM GC; a
    # free landing between two measurements makes COUNT deltas lie in
    # either direction (failed in-suite round 4: 4 stale RDDs freed
    # during the measured call and `after == before` tripped on 0 == 4).
    # Concurrent frees can only REMOVE ids, never add them, so the leak
    # assertion is on the set of NEW persistent-RDD ids — immune to GC
    # races by construction. GC-stabilize anyway so `before` doesn't
    # carry ids that are already doomed.
    def stable_ids() -> frozenset:
        import gc
        import time

        jsc = spark.sparkContext._jsc
        prev = None
        for _ in range(25):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.2)
            cur = frozenset(
                int(i) for i in jsc.getPersistentRDDs().keySet().toArray()
            )
            if cur == prev:
                return cur
            prev = cur
        return prev

    before = stable_ids()
    G.knn_join(
        qdf, cdf, k=4, query_id="qid", cand_id="cid",
        prefix_level=6, expand_underfilled=True,
    ).count()
    # non-exact path: strict — nothing NEW cached at all
    assert stable_ids() - before == frozenset()
    exact_df = G.knn_join(
        qdf, cdf, k=2, query_id="qid", cand_id="cid",
        prefix_level=4, exact=True,
    )
    exact_df.count()
    # exact path: levels [4, 2, 0] -> at most 2 checkpoints per non-final
    # level (out_lv + remaining); anything beyond that is a NEW leak.
    # exact_df stays referenced so its own checkpoints cannot free early.
    new_ids = stable_ids() - before
    assert len(new_ids) <= 4, sorted(new_ids)


def test_cell_boundary_dist_is_a_true_lower_bound(spark):
    """Property: for random points, every OTHER point outside the cell at
    level L is at least cell_boundary_dist_km away."""
    rng = np.random.default_rng(11)
    n = 400
    pdf = pd.DataFrame(
        {
            "pid": np.arange(n),
            "lat": rng.uniform(-80, 80, n),
            "lon": rng.uniform(-179, 179, n),
        }
    )
    level = 5
    df = spark.createDataFrame(pdf)
    rows = df.select(
        "pid", "lat", "lon",
        G.cell_boundary_dist_km(F.col("lat"), F.col("lon"), level).alias("b"),
        G.cell_encode_col(F.col("lon"), F.col("lat"), level).alias("cell"),
    ).collect()
    from harvester_fgp_spark.geo.distance import haversine_km

    lat = pdf["lat"].to_numpy()
    lon = pdf["lon"].to_numpy()
    by_pid = {r.pid: r for r in rows}
    for r in rows[:100]:
        d = haversine_km(np.full(n, r.lat), np.full(n, r.lon), lat, lon)
        outside = np.array(
            [by_pid[i].cell != r.cell for i in range(n)]
        )
        if outside.any():
            assert d[outside].min() >= r.b - 1e-9, r.pid
