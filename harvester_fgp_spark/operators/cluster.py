"""Density clustering (DBSCAN) as a grid-partitioned DataFrame plan.

DBSCAN(eps, min_pts) over planar integer coordinates:

- CORE point: >= ``min_pts`` points (itself included) within ``eps``.
- BORDER point: non-core within ``eps`` of at least one core point.
- NOISE: everything else.
- Clusters = connected components of the core-core eps-neighbor graph;
  each border point attaches to the min-labeled cluster among its core
  neighbors (a deterministic refinement of classic DBSCAN, whose border
  assignment is scan-order-dependent).

Scale shape — why this is NOT an all-pairs join: points snap to a grid
of cell size ``eps``, so every eps-neighbor of p lies in the 3x3 cell
neighborhood of p's cell. The candidate join is an EQUI-join on
(cell_x, cell_y) after a static 9-way neighbor-offset explode: shuffle
keys are two longs, candidate volume ~ local density x 9 cells, never
N^2. The exact ``d2 <= eps^2`` filter runs native (codegen) after the
join. Labels come from ``connected_components`` (cluster-graph
contraction, exact-terminated) over core-core edges only — at corpus
scale the component graph is the dense minority, not the full point
set. A skewed mega-cell
(one city at 100 TB) shows up as one hot join key; AQE skew split or the
sampled salt chooser (operators/joins.choose_salt_factor) applies
unchanged because the join is a plain equi-join.

Coordinates are integers (centi-degrees in the gate query) and d2 is
computed in int64, so the DuckDB oracle (brute-force pair join +
recursive-CTE closure) matches bit-exactly — no float boundary flips.

The neighbor-pair frame is persisted for the duration of the
computation (it feeds the degree count, the core edge set, and the
border attachment — Spark re-executes multi-consumer subtrees
otherwise) and unpersisted before return; the RETURNED frame is
materialized while the pairs are still cached, so callers never pay a
recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components

_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def eps_neighbor_pairs(
    points: DataFrame,
    eps: int,
    id_col: str = "pid",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Directed pairs (ia, ib) with 0 < L2^2 <= eps^2, via the 3x3
    cell-neighborhood equi-join. Each unordered pair appears exactly
    twice (once per direction) because the probe side's 9 offsets hit
    the build side's home cell exactly once."""
    # eps is interpolated into the int64 cell expression below: a float
    # fails analysis on `div`, and eps <= 0 makes pmod/div yield NULL cell
    # keys under non-ANSI mode — every point silently becomes noise
    # (round-4 advice). Fail loudly instead. operator.index accepts any
    # true integer type (incl. numpy int64 from array math) while
    # rejecting floats and anything merely int-convertible.
    import operator

    if isinstance(eps, bool):
        raise ValueError(f"eps must be a positive int, got {eps!r}")
    try:
        eps = operator.index(eps)
    except TypeError:
        raise ValueError(f"eps must be a positive int, got {eps!r}") from None
    if eps <= 0:
        raise ValueError(f"eps must be a positive int, got {eps!r}")
    p = points.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    )

    # floor(c / eps) in PURE int64 (round-3 advice: float division can bin
    # |c| near 2^53 one cell off, breaking 3x3-neighborhood completeness
    # for generic integer inputs): subtract the positive mod, then SQL
    # `div` — the operand is an exact multiple of eps, so truncating
    # division equals the floor quotient for any int64 coordinate.
    def cell(col: str) -> F.Column:
        return F.expr(f"({col} - pmod({col}, {eps})) div {eps}")

    build = p.select(
        F.col("_id").alias("ib"),
        F.col("_x").alias("bx"),
        F.col("_y").alias("by"),
        cell("_x").alias("cx"),
        cell("_y").alias("cy"),
    )
    probe = (
        p.withColumn(
            "_off",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(dx).alias("dx"), F.lit(dy).alias("dy")
                        )
                        for dx, dy in _OFFSETS
                    ]
                )
            ),
        )
        .select(
            F.col("_id").alias("ia"),
            F.col("_x").alias("ax"),
            F.col("_y").alias("ay"),
            (cell("_x") + F.col("_off.dx")).alias("cx"),
            (cell("_y") + F.col("_off.dy")).alias("cy"),
        )
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        probe.join(build, ["cx", "cy"])
        .filter((F.col("ia") != F.col("ib")) & (d2 <= F.lit(eps * eps)))
        .select("ia", "ib")
    )


def dbscan(
    points: DataFrame,
    eps: int,
    min_pts: int,
    id_col: str = "pid",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Full DBSCAN. Returns one row per input point:
    (id_col, role in {'core','border','noise'}, cluster_id — null for
    noise, else the min core-point id of the cluster)."""
    ids = points.select(F.col(id_col).alias("pid")).distinct()
    pairs = eps_neighbor_pairs(
        points, eps, id_col=id_col, x_col=x_col, y_col=y_col
    ).persist()
    deg = pairs.groupBy(F.col("ia").alias("pid")).agg(
        F.count("*").alias("nbrs")
    )
    # degree over ALL points (neighbor-less points have no pairs row but
    # still count themselves: at min_pts=1 an isolated point is core)
    core = (
        ids.join(deg, "pid", "left")
        .filter(F.coalesce(F.col("nbrs"), F.lit(0)) + 1 >= min_pts)
        .select("pid")
        .persist()
    )
    core.count()  # materialize while pairs is hot; reused 3x below
    core_edges = (
        pairs.join(core.select(F.col("pid").alias("ia")), "ia")
        .join(core.select(F.col("pid").alias("ib")), "ib")
        .filter(F.col("ia") < F.col("ib"))
        .select(F.col("ia").alias("id_a"), F.col("ib").alias("id_b"))
    )
    cc = connected_components(
        core.select(F.col("pid")), core_edges, id_col="pid"
    )
    border = (
        pairs.join(core.select(F.col("pid").alias("ia")), "ia", "left_anti")
        .join(
            cc.select(F.col("pid").alias("ib"), "cluster_id"), "ib"
        )
        .groupBy(F.col("ia").alias("pid"))
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    labeled = cc.select(
        "pid", F.lit("core").alias("role"), "cluster_id"
    ).unionByName(
        border.select("pid", F.lit("border").alias("role"), "cluster_id")
    )
    noise = ids.join(labeled.select("pid"), "pid", "left_anti").select(
        "pid",
        F.lit("noise").alias("role"),
        F.lit(None).cast("long").alias("cluster_id"),
    )
    # localCheckpoint (eager), not persist: materializes now — while the
    # pairs cache is hot — and frees on GC, so callers never unpersist
    out = labeled.unionByName(noise).localCheckpoint()
    pairs.unpersist()
    core.unpersist()
    return out
