"""Bucketed co-located joins (S-family scale machinery): writing both
sides bucketed by the join key removes BOTH Exchanges from a
large-x-large SortMergeJoin — the pre-shuffle pattern for repeated
fact-fact joins at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from harvester_fgp_spark.sources.tables import write_bucketed


from tests.conftest import plan_string as _plan


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(5000).select(
            F.col("id").alias("user_id"),
            (F.col("id") % 97).alias("score"),
        )
        b = spark.range(5000).select(
            F.col("id").alias("user_id"),
            (F.col("id") % 13).alias("grp"),
        )
        write_bucketed(a, "bj_left", "user_id", n_buckets=8)
        write_bucketed(b, "bj_right", "user_id", n_buckets=8)
        j = spark.table("bj_left").join(spark.table("bj_right"), "user_id")
        assert j.count() == 5000
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:800]

        # control: the same join from plain (unbucketed) frames shuffles
        control = a.join(b, "user_id")
        control.count()
        assert "Exchange" in _plan(control)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bj_left")
        spark.sql("DROP TABLE IF EXISTS bj_right")
