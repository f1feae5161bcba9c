"""Join planners J1-J7 (SURVEY.md §2.5) — DataFrame-level rewrites only.

Catalyst picks BHJ/SMJ on its own; what this module adds is the two
rewrites Catalyst cannot do (SURVEY §4): explicit key salting for
hot-key skew (dense urban cells, popular domains — BASELINE.json:6), and
the cell-prefix equi-join used by the spatial paths (operators.geo).
AQE's skew-join split handles skewed *partitions*; salting handles a
single skewed *key*, which AQE cannot split across tasks for a hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """J7: equi-join with the hot-key fix.

    Probe (large, skewed) side gets a random salt in [0, salt); build side
    is exploded `salt` times so every (key, salt) pair exists. Result set
    is provably identical to the unsalted join (property-tested in
    tests/test_joins_spark.py).

    Scale note: explodes the small side by `salt`x — keep the build side
    small or broadcast; pick `salt` from a sampled key histogram rather
    than folklore constants.

    Only inner/left are supported: for right/full joins the exploded
    build side would emit each UNMATCHED small-side row `salt` times,
    breaking the identical-result-set guarantee.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: outer "
            "variants would duplicate unmatched build rows salt times"
        )
    salted_large = large.withColumn(
        "_salt", (F.rand(seed) * salt).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    return salted_large.join(salted_small, [on, "_salt"], how).drop("_salt")


def choose_salt_factor(
    df: DataFrame,
    on: str,
    sample_fraction: float = 0.01,
    target_rows_per_task: int = 500_000,
    max_salt: int = 64,
    seed: int = 42,
) -> int:
    """Pick the salt factor from a sampled key histogram (SURVEY §2.5 J7:
    never a folklore constant).

    Estimates the hottest key's row count from a Bernoulli sample and
    returns ceil(hot_rows / target_rows_per_task) clamped to [1, max_salt].
    1 means "don't salt" — the common case when AQE alone suffices.
    The sample is one cheap scan; at 10^12 rows run it on a snapshot
    column statistic instead if the table format provides one.
    """
    hot = (
        df.sample(fraction=sample_fraction, seed=seed)
        .groupBy(on)
        .count()
        .agg(F.max("count").alias("m"))
        .first()
    )
    if hot is None or hot.m is None:
        return 1
    est_hot_rows = hot.m / sample_fraction
    salt = int(est_hot_rows // target_rows_per_task) + 1
    return max(1, min(salt, max_salt))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    how: str = "left",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """J8: as-of join — for each left row, the closest right row per key:
    latest with right_ts <= left_ts (``direction='backward'``, default) or
    earliest with right_ts >= left_ts (``'forward'``). With ``tolerance``
    (an INTERVAL string, e.g. ``'2 hours'``), matches farther than that
    are treated as no-match (values nulled / row dropped for inner) —
    the pandas merge_asof surface, at shuffle scale.

    Union-window rewrite (one shuffle on the key, no range-explosion):
    tag sides, sort (ts, side) within key with the right side first on
    ties (inclusive semantics), carry values forward with
    last(ignorenulls), keep left rows. Forward direction is the same
    window over descending ts. This is the shape that scales — a naive
    theta-join (l.ts >= r.ts) is quadratic per key.
    """
    from pyspark.sql.window import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = [f.name for f in left.schema.fields]
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l.schema["_left"].dataType).alias("_left"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l.unionByName(r)
    for c in value_cols:
        u = u.withColumn(f"_v_{c}", F.last(f"_v_{c}", ignorenulls=True).over(w))
    # explicit matched flag: a right row seen at-or-before this position.
    # Filtering on a carried VALUE column would also drop left rows whose
    # matched right row legitimately has a NULL value.
    u = u.withColumn(
        "_matched",
        F.last(F.when(F.col("_side") == 0, F.lit(1)), ignorenulls=True).over(w),
    )
    if tolerance is not None:
        m_ts = F.last(
            F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True
        ).over(w)
        gap = (
            F.col("_ts") - m_ts if direction == "backward" else m_ts - F.col("_ts")
        )
        within = gap <= F.expr(f"INTERVAL {tolerance}")
        u = u.withColumn(
            "_matched", F.when(within, F.col("_matched"))
        )
        for c in value_cols:
            u = u.withColumn(f"_v_{c}", F.when(within, F.col(f"_v_{c}")))
    out = u.filter(F.col("_side") == 1).select(
        "_left.*",
        *[F.col(f"_v_{c}").alias(f"asof_{c}") for c in value_cols],
        "_matched",
    )
    if how == "inner":
        out = out.filter(F.col("_matched") == 1)
    return out.drop("_matched")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Temporal range join: point rows x interval rows with
    start <= ts <= end — the 1-D analog of the geo cover join (J3).

    A theta join is quadratic; instead each point carries its epoch
    bucket and each interval explodes to the buckets it covers, so
    Catalyst plans an EQUI-join on an int key; the exact BETWEEN filter
    then removes bucket false positives. Each matching (point, interval)
    pair joins exactly once (a point lives in one bucket), so no distinct
    pass is needed. Size bucket_seconds to typical interval length:
    buckets-per-interval is the fan-out, points-per-bucket the skew knob
    (salt with J7 on `_b` if wall-clock hot spots dominate).
    """
    bs = F.lit(int(bucket_seconds))

    def _epoch(c: str) -> F.Column:
        # TIMESTAMP_NTZ has no direct long cast; route through TIMESTAMP
        # (session tz, pinned UTC by callers) — consistent on both sides,
        # which is all bucketing needs
        return F.col(c).cast("timestamp").cast("long")

    pb = points.withColumn("_b", F.floor(_epoch(point_ts) / bs).cast("long"))
    ib = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(_epoch(start_ts) / bs).cast("long"),
                F.floor(_epoch(end_ts) / bs).cast("long"),
            )
        ),
    )
    return (
        pb.join(ib, "_b")
        .filter(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("_b")
    )


def dedup_latest(df: DataFrame, key: str = "url", ts: str = "warc_ts") -> DataFrame:
    """W2 use-case: keep the latest crawl per url (lag/window dedup)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(F.col(ts).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
