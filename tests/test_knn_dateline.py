"""Exact-kNN across the antimeridian (round 5, VERDICT r4 next-#6).

Cell prefixes on opposite sides of ±180 are NOT adjacent in Morton
space, so prefix-join kNN can never see a cross-dateline neighbor at
any level > 0. Exactness near Fiji therefore rests entirely on the
termination bound: a query at lon ~179.9 has a tiny distance to its own
cell's east boundary (the ±180 meridian), so it cannot satisfy
`k-th dist <= cell_boundary_dist_km` while a closer candidate sits
across the line — it escalates all the way to level 0 (one world cell =
all candidates) and recovers the true neighbors. These tests prove that
chain end-to-end and pin the bound's validity at the dateline."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from harvester_fgp_spark.operators import geo as G


def _fiji_frames(spark, seed=21):
    """Queries hugging the dateline's west side (+179.2..+179.98), the
    candidate field split across BOTH sides — for most queries the true
    nearest candidates are across the line (lon -179.x), plus far-away
    decoys that approximate prefix-join kNN happily returns instead."""
    rng = np.random.default_rng(seed)
    n_q = 40
    q = pd.DataFrame(
        {
            "qid": np.arange(n_q),
            "q_lat": rng.uniform(-19.0, -16.0, n_q),  # Fiji latitudes
            "q_lon": rng.uniform(179.2, 179.98, n_q),
        }
    )
    # candidates: 30 just across the dateline (nearest for most queries),
    # 10 on the same side, 20 decoys ~500+ km east (same Morton side,
    # so approximate mode finds ONLY these and the same-side few)
    c = pd.DataFrame(
        {
            "cid": np.arange(60),
            "c_lat": np.concatenate(
                [
                    rng.uniform(-19.0, -16.0, 30),
                    rng.uniform(-19.0, -16.0, 10),
                    rng.uniform(-19.0, -16.0, 20),
                ]
            ),
            "c_lon": np.concatenate(
                [
                    rng.uniform(-179.98, -179.3, 30),  # across the line
                    rng.uniform(179.0, 179.98, 10),  # same side
                    rng.uniform(174.0, 176.0, 20),  # decoys, same side
                ]
            ),
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
            np.full(len(c), q["q_lat"][qid]),
            np.full(len(c), q["q_lon"][qid]),
            c["c_lat"].to_numpy(),
            c["c_lon"].to_numpy(),
        )
        exp[qid] = list(np.argsort(d, kind="stable")[:k])
    return exp


def test_knn_exact_recovers_cross_dateline_neighbors(spark):
    q, c, qdf, cdf = _fiji_frames(spark)
    exp = _brute(q, c, 3)
    got = (
        G.knn_join(
            qdf, cdf, k=3, query_id="qid", cand_id="cid",
            prefix_level=6, exact=True,
        )
        .select("qid", "cid", "knn_rank")
        .toPandas()
        .sort_values(["qid", "knn_rank"])
    )
    assert len(got) == 3 * len(q)
    for qid, grp in got.groupby("qid"):
        assert list(grp["cid"]) == exp[qid], f"query {qid}"
    # the fixture has teeth: cross-dateline candidates (cid < 30) must
    # actually dominate the true answer set...
    n_cross = sum(1 for ids in exp.values() for i in ids if i < 30)
    assert n_cross >= 10  # a meaningful share of answers straddle the line
    # ...and approximate mode at the same prefix level must miss them
    approx = (
        G.knn_join(
            qdf, cdf, k=3, query_id="qid", cand_id="cid",
            prefix_level=6, exact=False, expand_underfilled=True,
        )
        .select("qid", "cid")
        .toPandas()
    )
    assert not any(approx["cid"] < 30)  # prefix join never crosses ±180


def test_boundary_bound_holds_at_the_dateline(spark):
    """cell_boundary_dist_km stays a TRUE lower bound for points whose
    nearest out-of-cell neighbors are across the antimeridian: the
    geodesic to them crosses the ±180 meridian, which IS the cell's
    east (resp. west) boundary, so the cross-track meridian bound
    applies unchanged."""
    rng = np.random.default_rng(5)
    n = 200
    side = rng.integers(0, 2, n)
    pdf = pd.DataFrame(
        {
            "pid": np.arange(n),
            "lat": rng.uniform(-60, 60, n),
            "lon": np.where(
                side == 0,
                rng.uniform(179.0, 180.0, n),
                rng.uniform(-180.0, -179.0, n),
            ),
        }
    )
    level = 6
    rows = (
        spark.createDataFrame(pdf)
        .select(
            "pid", "lat", "lon",
            G.cell_boundary_dist_km(F.col("lat"), F.col("lon"), level).alias("b"),
            G.cell_encode_col(F.col("lon"), F.col("lat"), level).alias("cell"),
        )
        .collect()
    )
    from harvester_fgp_spark.geo.distance import haversine_km

    lat = pdf["lat"].to_numpy()
    lon = pdf["lon"].to_numpy()
    cells = {r.pid: r.cell for r in rows}
    for r in rows:
        d = haversine_km(np.full(n, r.lat), np.full(n, r.lon), lat, lon)
        outside = np.array([cells[i] != r.cell for i in range(n)])
        if outside.any():
            assert d[outside].min() >= r.b - 1e-9, r.pid


def test_knn_exact_handles_lon_exactly_180(spark):
    """lon == +180.0 (the seam itself): the bound may degrade to <= 0
    (never terminates early) but exactness must survive via level-0
    escalation."""
    q = pd.DataFrame({"qid": [0], "q_lat": [-17.5], "q_lon": [180.0]})
    c = pd.DataFrame(
        {
            "cid": [0, 1, 2, 3],
            "c_lat": [-17.5, -17.5, -17.5, -17.5],
            "c_lon": [-179.9, 179.8, -179.5, 175.0],
        }
    )
    qdf = spark.createDataFrame(q).withColumn(
        "cell_id", G.cell_encode_col(F.col("q_lon"), F.col("q_lat"), 12)
    )
    cdf = spark.createDataFrame(c).withColumn(
        "cell_id", G.cell_encode_col(F.col("c_lon"), F.col("c_lat"), 12)
    )
    got = (
        G.knn_join(
            qdf, cdf, k=2, query_id="qid", cand_id="cid",
            prefix_level=6, exact=True,
        )
        .select("cid", "knn_rank")
        .toPandas()
        .sort_values("knn_rank")
    )
    assert list(got["cid"]) == [0, 1]  # true order: 0.1 deg then 0.2 deg
