"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline
  (native zip_with/aggregate dot products; no UDF, no collect).
- ``ann_lsh_topk``: the scale path — random-hyperplane LSH signatures
  bucket the vectors, candidates come from an equi-join on (table, bucket)
  so the cross product never materializes; exact cosine re-ranks within
  buckets. Multi-table (independent hash tables) trades compute for
  recall, the standard LSH knob.

At 10^12 scale brute force is O(Q x N) — the LSH variant's equi-join is
what survives; its recall is measured against brute force in
tests/test_similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType
from pyspark.sql.window import Window

# Recall/compute tradeoff, tuned against brute force on random gaussian
# vectors (the adversarial case — real embedding corpora cluster and do
# better): 6 planes x 8 tables gives ~0.4 recall@5 there vs ~0.08 for
# 10 planes x 6 tables (tests/test_similarity.py enforces the floor).
N_TABLES = 8
N_PLANES = 6  # bits per table -> 64 buckets/table
_DIM_DEFAULT = 64

_rng = np.random.default_rng(77)
_PLANES = _rng.standard_normal((N_TABLES, N_PLANES, _DIM_DEFAULT))


def _dot(a: str | Column, b: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_sim_col(a: str | Column, b: str | Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


#: cos_sim is rounded to 6 decimals before ranking, so a candidate can
#: only displace another whose UNROUNDED value is within one rounding
#: step (1e-6) plus both rounding shifts (<= 5e-7 each). A per-block
#: keep-margin of 3e-6 below the block's k-th best unrounded value is
#: therefore a guaranteed superset of the global rounded top-k: if a
#: candidate x is dropped, >= k block-mates have unrounded cos
#: > x + 3e-6, hence rounded cos >= round(x) + 1e-6 — x can never rank
#: <= k. (Proof in OPTIMIZATION_r08.md; the margin is 3x the minimum.)
_TOPK_ROUND_MARGIN = 3.0e-6


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_emb: str = "q_emb",
    c_emb: str = "c_emb",
    n_blocks: "int | None" = None,
) -> DataFrame:
    """Exact top-k per query — O(Q x N) pair arithmetic, vectorized.

    Round-8 shape (guide §4.2): the round-1..7 crossJoin evaluated one
    interpreted zip_with/aggregate lambda chain PER PAIR (~130 expression
    evaluations per 64-dim dot product; 55.9 s at 400 x 20k pairs, the
    round-7 driver bench's single most expensive query). The pairs still
    all get computed — exactness requires it — but now inside a cogrouped
    Arrow kernel that runs the dot products as ~d vectorized numpy passes
    per (candidate-block x query-set) tile: candidates hash into
    scale-adaptive blocks, queries replicate to every block (Q x n_blocks
    rows of metadata-sized shuffle, guide §2.3), and each block emits
    only its margin-guarded top-k superset (~k rows per query per block),
    so the O(Q x N) pair stream never hits a shuffle. A native
    round + row_number window over ~k x n_blocks rows per query finishes.

    BIT-EXACT by construction, not approximately equal: the kernel
    accumulates dot products and norms left-to-right over the dimension
    axis in float64 — the same IEEE operation sequence as the native
    aggregate(zip_with(cast double)) it replaces — and the final
    ROUND/rank runs in Spark on the raw doubles, so every emitted
    (q_id, c_id, rank, cos_sim) row is identical to the round-7 plan's
    (verified row-exact at sf0.001/0.01/0.1/1.0; the superset-margin
    argument above covers selection).
    """
    spark = queries.sparkSession
    if n_blocks is None:
        n_blocks = max(int(spark.sparkContext.defaultParallelism) * 2, 8)
    q_id_t = queries.schema[q_id].dataType.simpleString()
    c_id_t = candidates.schema[c_id].dataType.simpleString()
    blocks = spark.range(n_blocks).select(F.col("id").cast("int").alias("_blk"))
    qrep = queries.select(q_id, q_emb).crossJoin(F.broadcast(blocks))
    cblk = candidates.select(c_id, c_emb).withColumn(
        "_blk", F.pmod(F.xxhash64(F.col(c_id)), F.lit(n_blocks)).cast("int")
    )
    margin = _TOPK_ROUND_MARGIN

    def _block_topk(cands: pd.DataFrame, qs: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({q_id: [], c_id: [], "_cos": []})
        if len(cands) == 0 or len(qs) == 0:
            return empty
        C = np.stack(cands[c_emb].to_numpy()).astype(np.float64)
        Q = np.stack(qs[q_emb].to_numpy()).astype(np.float64)
        # left-to-right accumulation over dims: IEEE-identical to the
        # native aggregate(zip_with(...)) sequential double sum
        acc = np.zeros((Q.shape[0], C.shape[0]))
        qn = np.zeros(Q.shape[0])
        cn = np.zeros(C.shape[0])
        for j in range(C.shape[1]):
            acc += Q[:, j : j + 1] * C[:, j]
            qn += Q[:, j] * Q[:, j]
            cn += C[:, j] * C[:, j]
        cos = acc / (np.sqrt(qn)[:, None] * np.sqrt(cn)[None, :])
        self_mask = qs[q_id].to_numpy()[:, None] == cands[c_id].to_numpy()[None, :]
        # Spark sorts NaN FIRST under desc — treat NaN as +inf for the
        # k-th-value selection and always keep NaN rows; the Spark-side
        # window then orders them exactly as the old plan did
        sel = np.where(self_mask, -np.inf, np.nan_to_num(cos, nan=np.inf))
        if sel.shape[1] >= k:
            kth = np.sort(sel, axis=1)[:, -k]
        else:
            kth = np.full(sel.shape[0], -np.inf)
        keep = ~self_mask & ((cos >= kth[:, None] - margin) | np.isnan(cos))
        qi, ci = np.nonzero(keep)
        return pd.DataFrame(
            {
                q_id: qs[q_id].to_numpy()[qi],
                c_id: cands[c_id].to_numpy()[ci],
                "_cos": cos[qi, ci],
            }
        )

    out = (
        cblk.groupby("_blk")
        .cogroup(qrep.groupby("_blk"))
        .applyInPandas(
            _block_topk, schema=f"{q_id} {q_id_t}, {c_id} {c_id_t}, _cos double"
        )
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cos_sim"), F.asc(c_id))
    return (
        out.withColumn("cos_sim", F.round(F.col("_cos"), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "rank", "cos_sim")
    )


_NEARDUP_RNG = np.random.default_rng(99)


def exact_near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = _DIM_DEFAULT,
) -> DataFrame:
    """Exact cosine near-dup pairs (cos >= threshold) WITHOUT an all-pairs
    nested loop — result set identical to the brute-force theta join.

    Blocking with a *guaranteed-complete* candidate set: for unit vectors,
    cos(a,b) >= t implies the chord bound ||a-b|| <= sqrt(2-2t), and any
    unit projection r satisfies |r.a - r.b| <= ||a-b||. So bucketing each
    vector by floor((r.e/||e||)/w) with w = sqrt(2-2t) puts every
    qualifying pair in the same or adjacent bucket; an equi-join on the
    bucket key with the probe side exploded to {b-1, b, b+1} is therefore
    complete, and the exact cosine filter removes the false positives.

    Physical plan: shuffled hash/sort-merge join on an integer key — no
    BroadcastNestedLoopJoin, no O(N^2) row explosion, no driver-sized
    broadcast (the round-1 scale-killer this replaces). At production
    near-dup thresholds (>= 0.9) w is small and the candidate count is
    near-linear; as t -> 0 buckets widen and the plan degrades gracefully
    toward brute force but never misses a pair.

    `w` is derived from threshold - 1e-5 so float rounding at the bucket
    boundary can never push a true pair out of the adjacent-bucket window.
    """
    r = _NEARDUP_RNG.standard_normal(dim)
    r = r / np.linalg.norm(r)
    r_lit = F.array(*[F.lit(float(x)) for x in r])
    w = float(np.sqrt(max(2.0 - 2.0 * (threshold - 1e-5), 1e-12)))

    base = emb.select(
        F.col(id_col).alias("_id"),
        F.col(emb_col).alias("_e"),
        F.sqrt(_dot(emb_col, emb_col)).alias("_n"),
    ).withColumn(
        "_bkt", F.floor(_dot("_e", r_lit) / (F.col("_n") * F.lit(w))).cast("long")
    )
    probe = base.select(
        F.col("_id").alias("ia"),
        F.col("_e").alias("ea"),
        F.col("_n").alias("na"),
        F.explode(
            F.array(F.col("_bkt") - 1, F.col("_bkt"), F.col("_bkt") + 1)
        ).alias("_bkt"),
    )
    build = base.select(
        F.col("_id").alias("ib"),
        F.col("_e").alias("eb"),
        F.col("_n").alias("nb"),
        "_bkt",
    )
    # Pair cosines in a BATCHED Arrow kernel over the joined candidate
    # stream (round 8, guide §4.2 — the semantic_dedup pair-stage
    # treatment): the native equi-join keeps its candidate structure (a
    # qualifying pair matches at exactly one probe bucket and survives
    # ia < ib exactly once), and the per-pair dot product runs as ~d
    # vectorized numpy passes per 16k-row batch instead of an
    # interpreted zip_with/aggregate lambda chain per pair. Per-batch —
    # not per-bucket-group — granularity keeps the Python overhead
    # scale-free. Dots accumulate left-to-right in float64 over the
    # float32 inputs and norms ride in from the native side, so emitted
    # values are bit-identical; the kernel pre-filters at
    # threshold - 1e-6 (rounding to 6 decimals can raise a value by at
    # most 5e-7, so no pair that rounds past the threshold is ever
    # dropped) and the exact ROUND + >= threshold decision stays native.
    id_t = emb.schema[id_col].dataType.simpleString()
    thr_keep = float(threshold) - 1e-6
    joined = (
        probe.join(build, "_bkt")
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib", "ea", "eb", "na", "nb")
    )

    def _pair_cos(batches):
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            A = np.stack(
                batch.column(2).to_numpy(zero_copy_only=False)
            ).astype(np.float64)
            B = np.stack(
                batch.column(3).to_numpy(zero_copy_only=False)
            ).astype(np.float64)
            acc = np.zeros(A.shape[0])
            for j in range(A.shape[1]):
                acc += A[:, j] * B[:, j]
            cos = acc / (
                batch.column(4).to_numpy(zero_copy_only=False)
                * batch.column(5).to_numpy(zero_copy_only=False)
            )
            keep = pa.array(cos >= thr_keep)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0).filter(keep),
                    batch.column(1).filter(keep),
                    pa.array(cos[cos >= thr_keep]),
                ],
                names=["ia", "ib", "_cos"],
            )

    pairs = joined.mapInArrow(
        _pair_cos, schema=f"ia {id_t}, ib {id_t}, _cos double"
    )
    return (
        pairs.withColumn("cos_sim", F.round(F.col("_cos"), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("ia", "ib", "cos_sim")
    )


def lsh_buckets_udf(dim: int):
    planes = _PLANES if dim == _DIM_DEFAULT else np.random.default_rng(77).standard_normal(
        (N_TABLES, N_PLANES, dim)
    )

    @pandas_udf(ArrayType(LongType()))
    def _buckets(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())  # (batch, dim)
        out = []
        signs = np.einsum("bd,tpd->btp", mat, planes) > 0  # (batch, T, P)
        weights = 1 << np.arange(N_PLANES, dtype=np.int64)
        codes = (signs * weights[None, None, :]).sum(axis=2)  # (batch, T)
        for row in codes:
            out.append([int(t) << 32 | int(c) for t, c in enumerate(row)])
        return pd.Series(out)

    return _buckets


def ann_ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse k-means quantizer + multi-probe.

    The scale path alongside LSH: a distributed KMeans fit (Spark ML)
    partitions the corpus into n_cells inverted lists; each query probes
    its n_probe nearest centroids and reranks exactly within those lists.
    Candidate generation is an equi-join on the int cell id — the cross
    product never materializes, and the centroid table (n_cells rows) is
    a broadcast literal, so query assignment is one narrow broadcast join.

    Recall/compute knob: n_probe/n_cells (probing all cells = exact).
    Unlike LSH's data-oblivious hyperplanes, the quantizer adapts to the
    corpus distribution — on clustered real-world embeddings IVF recall
    dominates at equal candidate budgets.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = vectors.sparkSession
    vec = vectors.withColumn("_v", array_to_vector(F.col(emb_col)))
    model = KMeans(
        k=n_cells, seed=7, featuresCol="_v", predictionCol="_cell"
    ).fit(vec)
    cand = (
        model.transform(vec)
        .select(
            F.col(id_col).alias("c_id"),
            F.col(emb_col).alias("c_emb"),
            F.sqrt(_dot(emb_col, emb_col)).alias("_cn"),
            F.col("_cell").alias("cell"),
        )
    )
    ctr = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, ctr array<double>",
    )
    return _ivf_probe_rank(ctr, cand, queries, k, n_probe, id_col, emb_col)


def _ivf_probe_rank(
    ctr: DataFrame,
    cand: DataFrame,
    queries: DataFrame,
    k: int,
    n_probe: int,
    id_col: str,
    emb_col: str,
) -> DataFrame:
    """Shared IVF tail: assign each query its n_probe nearest centroids
    (broadcast cross join on the tiny centroid table), equi-join the
    inverted lists on the int cell id, exact cosine rerank. Norms ride
    the join sides — computed once per vector, never per pair (per-pair
    recomputation tripled the hot-loop arithmetic; same IEEE ops,
    identical values)."""
    # squared L2 to each centroid, native; keep the n_probe nearest
    d2 = F.aggregate(
        F.zip_with(
            F.col("q_emb"), F.col("ctr"), lambda x, y: (x.cast("double") - y) ** 2
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("_d2"), F.asc("cell"))
    qs = (
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(emb_col).alias("q_emb"),
            F.sqrt(_dot(emb_col, emb_col)).alias("_qn"),
        )
        .crossJoin(F.broadcast(ctr))
        .withColumn("_d2", d2)
        .withColumn("_pr", F.row_number().over(w))
        .filter(F.col("_pr") <= n_probe)
        .select("q_id", "q_emb", "_qn", "cell")
    )
    pairs = (
        qs.join(cand, "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "q_emb", "_qn", "c_id", "c_emb", "_cn")
    )
    ranked = pairs.withColumn(
        "cos_sim",
        F.round(
            _dot("q_emb", "c_emb") / (F.col("_qn") * F.col("_cn")),
            6,
        ),
    )
    wr = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        ranked.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "rank", "cos_sim")
    )


def build_ivf_index(
    vectors: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """Build and PERSIST an IVF index — the build-once / query-many shape
    real ANN serving needs at corpus scale (re-fitting k-means per query
    batch, as ann_ivf_topk does for its self-contained oracle row, is a
    non-starter at 10^12 vectors).

    Layout: ``{path}/centroids`` (tiny parquet: cell, ctr) and
    ``{path}/lists`` Hive-partitioned BY CELL — a query batch probing
    p of n_cells cells prunes to p partitions at the file listing level
    (dynamic partition pruning at scale; the layout is the index).
    Norms are precomputed into the lists so queries never touch them.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = vectors.sparkSession
    vec = vectors.withColumn("_v", array_to_vector(F.col(emb_col)))
    model = KMeans(
        k=n_cells, seed=7, featuresCol="_v", predictionCol="_cell"
    ).fit(vec)
    ctr = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, ctr array<double>",
    )
    ctr.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    (
        model.transform(vec)
        .select(
            F.col(id_col).alias("c_id"),
            F.col(emb_col).alias("c_emb"),
            F.sqrt(_dot(emb_col, emb_col)).alias("_cn"),
            F.col("_cell").alias("cell"),
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/lists")
    )


def query_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Query a persisted IVF index (build_ivf_index layout): broadcast
    the centroid table, probe, equi-join the cell-partitioned lists,
    exact rerank. Identical results to the in-memory ann_ivf_topk for
    the same corpus/parameters (pytest parity)."""
    ctr = spark.read.parquet(f"{path}/centroids")
    cand = spark.read.parquet(f"{path}/lists").withColumn(
        "cell", F.col("cell").cast("int")
    )
    return _ivf_probe_rank(ctr, cand, queries, k, n_probe, id_col, emb_col)


def ann_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = _DIM_DEFAULT,
) -> DataFrame:
    """Approximate top-k: bucket equi-join (N_TABLES tables) + exact rerank.

    Null embeddings are dropped up front (embed_media emits them for null
    payloads): np.stack inside the bucket kernel would raise on None —
    the native cosine paths tolerate nulls, so the LSH path must too."""
    bud = lsh_buckets_udf(dim)
    cand = vectors.filter(F.col(emb_col).isNotNull()).select(
        F.col(id_col).alias("c_id"),
        F.col(emb_col).alias("c_emb"),
        F.sqrt(_dot(emb_col, emb_col)).alias("_cn"),
        F.explode(bud(F.col(emb_col))).alias("bucket"),
    )
    qs = queries.filter(F.col(emb_col).isNotNull()).select(
        F.col(id_col).alias("q_id"),
        F.col(emb_col).alias("q_emb"),
        F.sqrt(_dot(emb_col, emb_col)).alias("_qn"),
        F.explode(bud(F.col(emb_col))).alias("bucket"),
    )
    pairs = (
        qs.join(cand, "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "q_emb", "_qn", "c_id", "c_emb", "_cn")
        .distinct()
    )
    # per-vector norms ride the bucket join (see ann_ivf_topk note)
    ranked = pairs.withColumn(
        "cos_sim",
        F.round(
            _dot("q_emb", "c_emb") / (F.col("_qn") * F.col("_cn")),
            6,
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        ranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "rank", "cos_sim")
    )


#: Auto-sizing cap for the semantic_dedup quantizer: k-means fit cost is
#: O(n * k * d * iters), so k is bounded even when sqrt(n) keeps growing
#: (at n = 10^9, sqrt(n) ~ 31623 <= the cap; past it, candidate pairs
#: grow linearly in n again — the caller should shard first).
MAX_AUTO_CELLS = 32_768


def _auto_n_cells(n: int) -> int:
    """~sqrt(n) clusters, floored at 8 and cost-capped: with k = sqrt(n)
    the expected within-cell pair count is n^2/(2k) = n^1.5/2 — the
    SemDeDup sweet spot where quantizer fit cost (n*k*d) and pair-join
    cost meet — instead of the old fixed k=8's n^2/16 foot-gun. Never
    exceeds n itself (Spark KMeans requires k <= points)."""
    import math

    return max(
        1, min(max(8, int(math.isqrt(max(n, 0)))), MAX_AUTO_CELLS, n)
    )


def semantic_dedup(
    vectors: DataFrame,
    n_cells: "int | None" = None,
    threshold: float = 0.9999,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    stats: "dict | None" = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the corpus with a coarse k-means quantizer, then drop every document
    whose cosine similarity to a LOWER-id document in the SAME cluster
    meets ``threshold``; the surviving lower id is the kept
    representative.

    Returns (dropped_id, kept_id) with kept_id = min qualifying partner.

    Scale shape: the all-pairs comparison is scoped to clusters — the
    only join is an equi-join on the int cell id, so candidate pairs are
    sum_c(n_c^2)/2, not n^2/2, and the cluster count is the compute/
    recall knob exactly as in IVF search. Centroids ride a broadcast;
    the pair join shuffles (id, embedding) rows hash-partitioned by cell.

    ``n_cells=None`` (the default since round 7) AUTO-SIZES the
    quantizer to ~sqrt(n) clusters (one count job over the non-null
    vectors, cost-capped at MAX_AUTO_CELLS): the old fixed k=8 meant
    ~n^2/16 candidate pairs at ANY corpus size — quadratic the moment a
    caller forgot to scale k. Auto-k keeps expected pairs at n^1.5/2
    and leaves the explicit knob for recall tuning. Dedup output at
    threshold ~1.0 is k-invariant either way (exact duplicates
    co-cluster under any centroid set).

    Determinism note (oracle strategy, the ann_ivf_recall trick): at
    ``threshold`` ~1.0 the qualifying pairs are exact-duplicate vectors,
    which land in the same cluster under ANY centroid set (identical
    inputs -> identical argmin), so the output is centroid-invariant and
    DuckDB can recompute it as an equality self-join on the raw arrays.
    Lower thresholds trade that invariance for more aggressive semantic
    pruning (pytest covers the planted-near-dup tier).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vectors = vectors.filter(F.col(emb_col).isNotNull())
    n_vec = vectors.count()
    if n_cells is None:
        n_cells = _auto_n_cells(n_vec)
    # fit input pruned to the feature column alone (guide §2.3) AND
    # coalesced to partitions sized for the VECTOR volume, not the text
    # corpus's partitioning (round 8, guide §2.2): embeddings are
    # ~d*4 bytes/row, so inheriting a corpus-sized partition count hands
    # every one of the fit's ~maxIter+1 jobs hundreds of near-empty
    # tasks — task-launch overhead, not distance math, dominated the
    # fit (measured 2.4 s -> 0.8 s at 25k vectors / 65 -> 1 partitions).
    # ~50k vectors/task keeps a 10M-vector fit at ~200 real tasks.
    # floor of 4: a 1-partition fit single-threads the distance math
    # (measured slower than 4-16 partitions at 25k vectors)
    fit_parts = max(
        4,
        min(
            int(vectors.sparkSession.sparkContext.defaultParallelism),
            n_vec // 50_000 + 1,
        ),
    )
    vec = vectors.select(
        array_to_vector(F.col(emb_col)).alias("_v")
    ).coalesce(fit_parts)
    # the quantizer only scopes the pair join — it needn't converge, so
    # iterations are bounded (r6 measured maxIter 20 -> 8; round 8 cut
    # to 4 — each iteration is one scheduler-bound job, the dedup output
    # is centroid-invariant at threshold ~1.0, and the planted-near-dup
    # pytest tier stayed green) and init is plain random (round 8:
    # k-means|| spends ~2 extra distributed passes buying an init
    # quality a SCOPING quantizer cannot cash; re-verified row-exact
    # after both switches)
    model = KMeans(
        k=n_cells,
        seed=7,
        maxIter=4,
        initMode="random",
        featuresCol="_v",
        predictionCol="_cell",
    ).fit(vec)
    # chord-bound projection prefilter (the exact_near_dup_pairs trick,
    # computed ONCE per vector): for unit vectors cos(a,b) >= t implies
    # |r.a/(|r||a|) - r.b/(|r||b|)| <= sqrt(2-2t), so within-cell pairs
    # whose integer projection buckets differ by > 1 cannot qualify and
    # never reach the cosine — at t ~ 1.0 this kills almost every
    # non-duplicate pair before the full-width dot product. The
    # direction is the same deterministic sin-hash per index, so it
    # adapts to ANY embedding dimension with no driver-side state.
    #
    # Round 8 (guide §4.2): cell argmin + norm + projection bucket were
    # a Spark-ML transform (VectorUDT predict UDF) plus three
    # interpreted HOF chains per row; all four now come from ONE Arrow
    # kernel against the broadcast centroid matrix (the model's cluster
    # centers — ~KBs). Cell and bucket only SCOPE the join (output at
    # threshold ~1.0 is quantizer-invariant, re-verified row-exact), but
    # _n divides the cosine, so the kernel accumulates it left-to-right
    # in float64 — bit-identical to the native sqrt(aggregate(...)).
    w_bkt = float(np.sqrt(max(2.0 - 2.0 * (threshold - 1e-5), 1e-12)))
    centers = np.stack(
        [np.asarray(c, dtype=np.float64) for c in model.clusterCenters()]
    )
    emb_t = vectors.schema[emb_col].dataType.simpleString()
    id_t2 = vectors.schema[id_col].dataType.simpleString()
    assign_schema = (
        f"{id_col} {id_t2}, {emb_col} {emb_t}, _n double, "
        "cell int, _prj bigint"
    )

    def _assign(batches):
        import pyarrow as pa

        for batch in batches:
            ids, embs = batch.column(0), batch.column(1)
            if len(ids) == 0:
                continue
            M = np.stack(
                embs.to_numpy(zero_copy_only=False)
            ).astype(np.float64)
            d = M.shape[1]
            nn = np.zeros(M.shape[0])
            for j in range(d):
                nn += M[:, j] * M[:, j]
            n = np.sqrt(nn)
            # argmin ||x-c||^2 == argmin(||c||^2 - 2 x.c); GEMM once
            c2 = (centers * centers).sum(axis=1)
            cell = np.argmin(c2[None, :] - 2.0 * (M @ centers.T), axis=1)
            rv = np.sin((np.arange(d) + 1.0) * 12.9898)
            # zero-norm vectors get bucket 0: their cosine is NaN and
            # never qualifies, so placement is output-irrelevant — this
            # only avoids inf -> int64 UB
            proj = np.where(n > 0, (M @ rv) / np.where(n > 0, n, 1.0), 0.0)
            prj = np.floor(
                proj / (float(np.sqrt((rv * rv).sum())) * w_bkt)
            ).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    embs,
                    pa.array(n),
                    pa.array(cell.astype(np.int32)),
                    pa.array(prj),
                ],
                names=[id_col, emb_col, "_n", "cell", "_prj"],
            )

    assigned = vectors.select(id_col, emb_col).mapInArrow(
        _assign, assign_schema
    )
    # assigned feeds BOTH join sides (and the optional stats job): Spark
    # never CSEs multi-consumer subtrees, so without this checkpoint the
    # quantizer transform (n*k*d argmin — real money at auto-k ~ sqrt(n))
    # would run once PER consumer (round 7; single non-iterative
    # localCheckpoint, no _stats_reset hazard)
    assigned = assigned.localCheckpoint()
    if stats is not None:
        sizes = assigned.groupBy("cell").agg(F.count("*").alias("_k"))
        row = sizes.agg(
            F.sum(F.col("_k")).alias("n"),
            F.sum(
                F.col("_k") * (F.col("_k") - F.lit(1)) / F.lit(2)
            ).alias("scoped"),
        ).first()
        n_total = int(row["n"] or 0)
        stats.update(
            n=n_total,
            k=n_cells,
            scoped_pairs=int(row["scoped"] or 0),
            all_pairs=n_total * (n_total - 1) // 2,
        )
    lo = assigned.select(
        F.col("cell"),
        F.col(id_col).alias("_lo_id"),
        F.col(emb_col).alias("_lo_emb"),
        F.col("_n").alias("_lo_n"),
        F.col("_prj").alias("_lo_p"),
    )
    hi = assigned.select(
        F.col("cell"),
        F.col(id_col).alias("_hi_id"),
        F.col(emb_col).alias("_hi_emb"),
        F.col("_n").alias("_hi_n"),
        F.col("_prj").alias("_hi_p"),
    )
    # chord prefilter AS A JOIN KEY (round 7, was filter-after-join): the
    # lo side explodes to its 3 admissible buckets {p-1, p, p+1} and the
    # join is equi on (cell, bucket) — |lo_p - hi_p| <= 1 holds iff
    # EXACTLY ONE exploded row matches (no dedup needed), so non-dup
    # pairs never materialize at all instead of materializing and dying
    # in a post-join filter. At auto-k + threshold ~1.0 this turns the
    # within-cell n_c^2 row stream into only the chord-admissible pairs.
    lo3 = lo.withColumn(
        "_bkt",
        F.explode(
            F.array(
                F.col("_lo_p") - 1, F.col("_lo_p"), F.col("_lo_p") + 1
            )
        ),
    )
    # The per-pair cosine moves from an interpreted zip_with/aggregate
    # chain (~3.9M admissible pairs x ~130 expression evals at sf1.0
    # under n_cells=8; 7.3 s measured) into a BATCHED Arrow kernel over
    # the joined pair stream (round 8, guide §4.2): the native equi-join
    # above still forms exactly the chord-admissible pairs, and the
    # kernel runs ~d vectorized numpy passes per 16k-row batch. Batch
    # granularity matters: a first cut cogrouped per (cell, bucket) and
    # paid the per-GROUP Arrow overhead x (n_cells x ~2/w buckets)
    # groups — ~fine at sf1.0 but +2 s at sf0.1 and growing with
    # auto-k at scale; per-batch overhead is scale-free. Norms ride in
    # from the assignment kernel and the dot accumulates left-to-right
    # in float64 — the same IEEE sequence as the native expressions — so
    # the (cos >= threshold) decision is BIT-IDENTICAL (verified
    # row-exact at sf0.01/0.1/1.0).
    id_t = vectors.schema[id_col].dataType.simpleString()
    thr = float(threshold)
    joined = (
        lo3.join(hi.withColumnRenamed("_hi_p", "_bkt"), ["cell", "_bkt"])
        .filter(F.col("_lo_id") < F.col("_hi_id"))
        .select("_lo_id", "_hi_id", "_lo_emb", "_hi_emb", "_lo_n", "_hi_n")
    )

    def _pair_cos(batches):
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            A = np.stack(
                batch.column(2).to_numpy(zero_copy_only=False)
            ).astype(np.float64)
            B = np.stack(
                batch.column(3).to_numpy(zero_copy_only=False)
            ).astype(np.float64)
            acc = np.zeros(A.shape[0])
            for j in range(A.shape[1]):
                acc += A[:, j] * B[:, j]
            cos = acc / (
                batch.column(4).to_numpy(zero_copy_only=False)
                * batch.column(5).to_numpy(zero_copy_only=False)
            )
            keep = cos >= thr
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0).filter(pa.array(keep)),
                    batch.column(1).filter(pa.array(keep)),
                ],
                names=["_lo_id", "_hi_id"],
            )

    pairs = joined.mapInArrow(
        _pair_cos, schema=f"_lo_id {id_t}, _hi_id {id_t}"
    )
    return pairs.groupBy(F.col("_hi_id").alias("dropped_id")).agg(
        F.min("_lo_id").alias("kept_id")
    )


# --- Product quantization (round 7): the compressed-ANN scale path ----------


def pq_train(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    emb_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 8,
) -> list:
    """Train an m-subspace product-quantization codebook (Jegou et al.
    2011): split the d-dim embedding into m contiguous d/m-dim
    subvectors and fit an independent k-center quantizer per subspace
    with Spark ML KMeans (distributed — the corpus never leaves the
    executors; only the m*k*(d/m) centroid floats come back, ~100 KB).

    Returns ``codebook`` as nested Python lists [m][k][d/m] — small
    enough to ride a UDF closure or plan literal. Storage story at 100 TB:
    float32 64-dim vectors (256 B) compress to m=8 one-byte codes
    (32x); ADC search then costs m table lookups per pair instead of d
    multiplies. The quantizers needn't converge (semantic_dedup lesson:
    bounded maxIter changes cost, not dedup/recall truth on planted
    twins — identical vectors encode identically under ANY codebook).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vec = vectors.filter(F.col(emb_col).isNotNull())
    row = vec.select(F.size(emb_col).alias("d")).first()
    if row is None:
        raise ValueError("pq_train: corpus has no non-null embeddings")
    d = row["d"]
    if d % m != 0:
        raise ValueError(f"embedding dim {d} not divisible by m={m}")
    dsub = d // m
    codebook = []
    for mi in range(m):
        sub = vec.select(
            array_to_vector(
                F.slice(F.col(emb_col), mi * dsub + 1, dsub)
            ).alias("_v")
        )
        model = KMeans(
            k=k,
            seed=seed + mi,
            maxIter=max_iter,
            featuresCol="_v",
            predictionCol="_c",
        ).fit(sub)
        codebook.append(
            [[float(x) for x in c] for c in model.clusterCenters()]
        )
    return codebook


def pq_encode_udf(codebook: list):
    """Arrow-batched encoder: per subspace, argmin distance to the k
    centroids via one GEMM per (batch, subspace) — ||x-c||^2 argmin ==
    (-2xC^T + ||c||^2) argmin, the ||x||^2 term is constant per row."""
    from pyspark.sql.types import IntegerType

    cb = np.asarray(codebook, dtype=np.float64)  # (m, k, dsub)
    m, _, dsub = cb.shape
    c2 = (cb**2).sum(axis=2)  # (m, k)

    @pandas_udf(ArrayType(IntegerType()))
    def _encode(emb: pd.Series) -> pd.Series:
        X = np.array(emb.tolist(), dtype=np.float64)
        codes = np.empty((len(X), m), dtype=np.int32)
        for mi in range(m):
            sub = X[:, mi * dsub : (mi + 1) * dsub]
            codes[:, mi] = (-2.0 * (sub @ cb[mi].T) + c2[mi]).argmin(1)
        return pd.Series(list(codes))

    return _encode


def pq_encode(
    vectors: DataFrame,
    codebook: list,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — the compressed corpus representation."""
    enc = pq_encode_udf(codebook)
    return vectors.filter(F.col(emb_col).isNotNull()).select(
        F.col(id_col).alias("c_id"), enc(F.col(emb_col)).alias("codes")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebook: list,
    k: int = 3,
    shortlist: int = 32,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """PQ/ADC approximate top-k with exact rerank — deployment shape:

    1. corpus -> codes (pq_encode, m ints per vector);
    2. per QUERY, one native HOF pass builds the m x k ADC distance
       table T[mi][j] = ||q_sub(mi) - codebook[mi][j]||^2 (O(k*d) per
       query, ONCE — that is the asymmetric-distance trick);
    3. the code scan evaluates sum_mi T[mi][codes[mi]] per candidate —
       m array lookups instead of d multiplies, over 32x less data when
       codes are stored; keep the ``shortlist`` best per query
       (labeled brute-force over CODES: at scale this crossJoin is
       scoped by composing with the IVF cell join — probe cells first,
       ADC-scan only their lists, exactly the IVF-PQ layout);
    4. exact cosine rerank of the shortlist against raw embeddings.

    Planted-twin determinism (the ann_ivf_recall argument, one step
    further): an identical vector's codes are the per-subspace argmins
    for the query itself, so its ADC distance is the GLOBAL minimum any
    candidate can achieve — it makes every shortlist >= 1 regardless of
    what KMeans chose, and the exact rerank puts it at rank 1."""
    # the ADC table/sum and exact-rerank tail are the SHARED helpers
    # below (_adc_expr/_pq_rerank) — one construction for both pq_topk
    # and ivf_pq_topk so the twins cannot drift (round-7 review fix:
    # this function originally inlined verbatim copies)
    table, adc = _adc_expr(codebook)
    qs = (
        queries.filter(F.col(emb_col).isNotNull())
        .select(
            F.col(id_col).alias("q_id"),
            F.col(emb_col).alias("q_emb"),
            F.sqrt(_dot(emb_col, emb_col)).alias("_qn"),
        )
        .withColumn("_t", table)
    )
    codes = pq_encode(corpus, codebook, id_col, emb_col)
    ws = Window.partitionBy("q_id").orderBy(F.asc("_adc"), F.asc("c_id"))
    short = (
        codes.crossJoin(F.broadcast(qs))
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("_adc", adc)
        .withColumn("_sr", F.row_number().over(ws))
        .filter(F.col("_sr") <= shortlist)
        .select("q_id", "q_emb", "_qn", "c_id")
    )
    return _pq_rerank(short, corpus, k, id_col, emb_col)


def _adc_expr(codebook: list) -> "tuple[Column, Column]":
    """(per-query ADC table over ``q_emb``, per-pair ADC sum over
    ``codes`` + ``_t``) — the two native HOF expressions pq_topk and
    ivf_pq_topk share (one construction so the twins cannot drift)."""
    m = len(codebook)
    dsub = len(codebook[0][0])
    cb_lit = F.lit(codebook)
    table = F.transform(
        cb_lit,
        lambda sub, mi: F.transform(
            sub,
            lambda ctr: F.aggregate(
                F.zip_with(
                    F.slice(F.col("q_emb"), mi * F.lit(dsub) + 1, dsub),
                    ctr,
                    lambda x, y: (x.cast("double") - y) ** 2,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        ),
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, i: F.element_at(
                F.element_at(F.col("_t"), i + 1), c + 1
            ),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return table, adc


def _pq_rerank(
    short: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str,
    emb_col: str,
) -> DataFrame:
    """Exact cosine rerank of an ADC shortlist (q_id, q_emb, _qn, c_id)
    against raw corpus embeddings — shared pq/ivf-pq tail."""
    cand = corpus.filter(F.col(emb_col).isNotNull()).select(
        F.col(id_col).alias("c_id"),
        F.col(emb_col).alias("c_emb"),
        F.sqrt(_dot(emb_col, emb_col)).alias("_cn"),
    )
    ranked = F.broadcast(short).join(cand, "c_id").withColumn(
        "cos_sim",
        F.round(_dot("q_emb", "c_emb") / (F.col("_qn") * F.col("_cn")), 6),
    )
    wr = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        ranked.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "rank", "cos_sim")
    )


def ivf_pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    codebook: "list | None" = None,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    kc: int = 16,
    shortlist: int = 32,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ — the production ANN serving layout (Jegou et al. 2011,
    the FAISS IVFPQ shape): a coarse n_cells quantizer scopes the scan
    (equi-join on the int cell id — the crossJoin in plain pq_topk never
    materializes), PQ codes make the scan inside each probed cell m
    lookups per pair over 32x-compressed rows, exact cosine reranks the
    shortlist. Per-probe cost: n_probe/n_cells of the corpus at m
    lookups/row — the knob pair that holds latency flat while the corpus
    grows 100x.

    Codes are PQ over RAW vectors (not residuals): the planted-twin
    determinism argument then carries verbatim — an identical vector
    lands in the identical cell AND its codes are the per-subspace
    argmins for the query, so it survives both the probe and the ADC
    shortlist under ANY quantizer, and exact rerank pins rank 1."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = vectors.sparkSession
    if codebook is None:
        codebook = pq_train(vectors, m=m, k=kc, emb_col=emb_col)
    vec = vectors.filter(F.col(emb_col).isNotNull()).withColumn(
        "_v", array_to_vector(F.col(emb_col))
    )
    # bounded maxIter like every other scoping quantizer here (ADVICE
    # r7: the default 20 iterations doubles fit cost with no recall
    # benefit — convergence is irrelevant to the planted-twin argument)
    coarse = KMeans(
        k=n_cells, seed=7, maxIter=8, featuresCol="_v", predictionCol="_cell"
    ).fit(vec)
    enc = pq_encode_udf(codebook)
    codes = coarse.transform(vec).select(
        F.col(id_col).alias("c_id"),
        F.col("_cell").alias("cell"),
        enc(F.col(emb_col)).alias("codes"),
    )
    ctr = spark.createDataFrame(
        [
            (i, [float(x) for x in c])
            for i, c in enumerate(coarse.clusterCenters())
        ],
        "cell int, ctr array<double>",
    )
    table, adc = _adc_expr(codebook)
    d2 = F.aggregate(
        F.zip_with(
            F.col("q_emb"), F.col("ctr"), lambda x, y: (x.cast("double") - y) ** 2
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    wp = Window.partitionBy("q_id").orderBy(F.asc("_d2"), F.asc("cell"))
    qs = (
        queries.filter(F.col(emb_col).isNotNull())
        .select(
            F.col(id_col).alias("q_id"),
            F.col(emb_col).alias("q_emb"),
            F.sqrt(_dot(emb_col, emb_col)).alias("_qn"),
        )
        .withColumn("_t", table)
        .crossJoin(F.broadcast(ctr))
        .withColumn("_d2", d2)
        .withColumn("_pr", F.row_number().over(wp))
        .filter(F.col("_pr") <= n_probe)
        .select("q_id", "q_emb", "_qn", "_t", "cell")
    )
    ws = Window.partitionBy("q_id").orderBy(F.asc("_adc"), F.asc("c_id"))
    short = (
        qs.join(codes, "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("_adc", adc)
        .withColumn("_sr", F.row_number().over(ws))
        .filter(F.col("_sr") <= shortlist)
        .select("q_id", "q_emb", "_qn", "c_id")
    )
    return _pq_rerank(short, vectors, k, id_col, emb_col)
