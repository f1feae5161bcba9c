from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from harvester_fgp_spark.session import build_session

    s = build_session(
        app_name="hfs-tests", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


def plan_string(df) -> str:
    """Executed-plan toString — shared by every plan-shape assertion
    (was duplicated in three test modules)."""
    return df._jdf.queryExecution().executedPlan().toString()
