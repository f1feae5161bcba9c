"""Round-6 additions (VERDICT r5 next-steps): the streaming family's
batch-mode session_window driver row, the HLL error-bound gate, the
auto-sized LSH verify broadcast, and the ADVICE hardening."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

import __spark_entry__ as E


def test_session_window_boundary_semantics(spark):
    """Pin the measured session_window merge rule the DuckDB oracle
    encodes: events EXACTLY gap apart merge (split is strictly >), and
    the session ends at last event ts + gap."""
    from harvester_fgp_spark.streaming.pipeline import sessionize_windows

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0)),
        (1, dt.datetime(2024, 1, 1, 0, 30, 0)),  # == gap -> merges
        (1, dt.datetime(2024, 1, 1, 0, 59, 59)),
        (1, dt.datetime(2024, 1, 1, 1, 30, 0)),  # 30:01 after -> splits
        (2, dt.datetime(2024, 1, 1, 0, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize_windows(
        df, gap="30 minutes", streaming=False, ts_col="ts", key_col="user_id"
    )
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in out.toPandas().itertuples()
    )
    assert got == [
        (
            1,
            dt.datetime(2024, 1, 1, 0, 0, 0),
            dt.datetime(2024, 1, 1, 1, 29, 59),
            3,
        ),
        (
            1,
            dt.datetime(2024, 1, 1, 1, 30, 0),
            dt.datetime(2024, 1, 1, 2, 0, 0),
            1,
        ),
        (
            2,
            dt.datetime(2024, 1, 1, 0, 0, 0),
            dt.datetime(2024, 1, 1, 0, 30, 0),
            1,
        ),
    ]


def test_session_window_batch_matches_lag_sessionizer(spark, sf_dir):
    """The native session_window plan and the lag/running-sum sessionizer
    (sessionize_events) must reconstruct the SAME sessions — same
    per-user session count and same event totals."""
    native = E.queries()["session_window_batch"](spark, sf_dir)
    lagged = E.queries()["sessionize_events"](spark, sf_dir)
    n = (
        native.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    l = (
        lagged.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (n["n_sessions"] == l["n_sessions"]).all()
    assert (n["n_events"] == l["n_events"]).all()


def test_approx_distinct_bound_holds(spark, sf_dir):
    """The HLL rsd=0.01 estimate stays within the 5% gate bound on the
    fixture — the exact-gate row's within_bound must be all-1."""
    out = E.queries()["approx_distinct_bound"](spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out["within_bound"] == 1).all()
    assert (out["exact_users"] > 0).all()


def _dup_corpus(spark):
    base = [(i, f"unique document number {i} with words " + " ".join(
        f"tok{(i * 7 + j) % 50}" for j in range(30))) for i in range(40)]
    dups = [(i + 1000, t) for i, t in base[:10]]
    return spark.createDataFrame(base + dups, "doc_id long, text string")


def test_minhash_auto_broadcast_parity(spark):
    """Auto mode (broadcast_candidates=None, the round-6 default) must
    return exactly the forced-broadcast / forced-shuffle pair sets."""
    from harvester_fgp_spark.operators.dedup import minhash_near_dup_pairs

    corpus = _dup_corpus(spark)
    auto = sorted(map(tuple, minhash_near_dup_pairs(corpus).collect()))
    forced = sorted(
        map(
            tuple,
            minhash_near_dup_pairs(corpus, broadcast_candidates=True).collect(),
        )
    )
    assert auto == forced and len(auto) >= 10


def test_auto_broadcast_flips_on_dup_heavy_corpus(spark, monkeypatch):
    """With MAX_BROADCAST_PAIRS forced to 0 every corpus counts as
    dup-heavy: the auto path must take the shuffled plan and still return
    the identical verified pairs (driver-OOM guard, round-5 watch item)."""
    from harvester_fgp_spark.operators import dedup

    monkeypatch.setattr(dedup, "MAX_BROADCAST_PAIRS", 0)
    corpus = _dup_corpus(spark)
    shuffled_auto = sorted(
        map(tuple, dedup.minhash_near_dup_pairs(corpus).collect())
    )
    forced = sorted(
        map(
            tuple,
            dedup.minhash_near_dup_pairs(
                corpus, broadcast_candidates=True
            ).collect(),
        )
    )
    assert shuffled_auto == forced


def test_partition_lineage_reads_numeric_run_id_as_string(spark, tmp_path):
    """Round-6 advice: Hive partition type inference must NOT turn a
    numeric-looking ('20260817'), date-shaped ('2026-08-17'), or
    zero-padded ('0123') run_id into INT/DATE on read — both layouts
    read run_id/stage back as STRING, byte-identical."""
    from harvester_fgp_spark.sinks.checkpoint import (
        _read_checkpoint,
        completed_tiles,
        write_records_and_checkpoint,
    )

    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    recs = spark.createDataFrame(
        [(f"r{i}", 8, i % 3, i % 2) for i in range(20)],
        "record_id string, tile_z int, tile_x int, tile_y int",
    )
    for rid in ("20260817", "2026-08-17", "0123"):
        write_records_and_checkpoint(
            recs, out, cp, run_id=rid, partition_lineage=True
        )
    got = _read_checkpoint(spark, cp)
    assert dict(got.dtypes)["run_id"] == "string"
    assert dict(got.dtypes)["stage"] == "string"
    run_ids = {r.run_id for r in got.select("run_id").distinct().collect()}
    assert run_ids == {"20260817", "2026-08-17", "0123"}
    assert completed_tiles(spark, cp).count() > 0


def test_layout_check_non_local_uri_uses_hadoop_fs(spark, tmp_path, monkeypatch):
    """Round-6 advice: a non-local checkpoint URI must still get layout
    enforcement via the Hadoop FileSystem API when a session is
    available. Exercised honestly by forcing the non-local branch onto a
    real directory (Hadoop's LocalFileSystem lists it)."""
    from harvester_fgp_spark.sinks import checkpoint as C

    d = tmp_path / "cp"
    (d / "stage=records").mkdir(parents=True)
    (d / "stage=records" / "part-0.parquet").write_bytes(b"")

    def _refuse(uri):
        raise ValueError("forced non-local")

    monkeypatch.setattr(C, "_local_path", _refuse)
    # partitioned dir + flat write -> must raise through the Hadoop branch
    with pytest.raises(ValueError, match="partitioned but this write is flat"):
        C._check_lineage_layout(str(d), False, spark)
    # matching layout passes; missing dir passes
    C._check_lineage_layout(str(d), True, spark)
    C._check_lineage_layout(str(tmp_path / "absent"), True, spark)
    # no session to list through -> warn-and-skip, never a crash
    with pytest.warns(UserWarning, match="layout enforcement skipped"):
        C._check_lineage_layout("s3a://bucket/cp", False, None)
