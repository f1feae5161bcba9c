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
