"""Driver-contract smoke (EP2/EP3 shape checks; the full DuckDB-oracle
comparison lives in tools/check_oracle.py and runs per-round)."""

from __future__ import annotations

import __spark_entry__ as E


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert {f.name for f in df.schema.fields} == {
        "tile_x", "tile_y", "box_id", "n_points",
    }


def test_queries_and_oracles_consistent():
    qs, oracles = E.queries(), E.oracle_sql()
    assert len(qs) >= 20
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle_sql keys not in queries(): {unknown}"
    # non-SQL ops are the documented exceptions
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "dedup_minhash", "dedup_simhash",
        "ann_lsh", "ann_ivf", "approx_distinct_users", "polygon_tiles",
        "pipeline_flagship",
        # round 6: Douglas-Peucker is recursive, not SQL-expressible
        # (deterministic digest + pytest parity instead)
        "polygon_simplify",
    }


def test_sample_queries_run_at_sf0001(spark, sf_dir):
    qs = E.queries()
    for name in ("geo_cell_encode", "tpch_q1_pricing", "sim_cosine_topk"):
        df = qs[name](spark, sf_dir)
        assert df.count() > 0, name
