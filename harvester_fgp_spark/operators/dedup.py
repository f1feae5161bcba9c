"""Deduplication operators for training-data pipelines.

- exact: hash-groupBy (pure native — see __spark_entry__ dedup_exact)
- MinHash + LSH banding: shingle -> minhash signature -> band buckets ->
  bucket equi-join -> exact-Jaccard verify. The candidate join is an
  equi-join on (band, band_hash) so Catalyst shuffles once on a compact
  key; the verify step re-computes Jaccard ONLY on candidate pairs.
- SimHash: 64-bit signature + banded buckets for Hamming-neighbor lookup.

Scale notes: signatures are fixed-width (NUM_PERM longs / one long), so
shuffle width is bounded regardless of document size; band tables are
(id, band, hash) — the classic sub-quadratic near-dup layout. All Python
is Arrow-batched pandas UDFs over numpy (no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType

NUM_PERM = 32
NUM_BANDS = 8  # 4 rows per band
SHINGLE_K = 3

_MERSENNE = (1 << 61) - 1
_rng = np.random.default_rng(1234)
_PERM_A = _rng.integers(1, _MERSENNE, size=NUM_PERM, dtype=np.int64)
_PERM_B = _rng.integers(0, _MERSENNE, size=NUM_PERM, dtype=np.int64)


def _shingle_hashes(text: str) -> np.ndarray:
    """Word k-shingles -> uint64 hashes (blake2b digest_size=8 — C-speed;
    a per-byte Python hash loop here was the original bench hot spot)."""
    import hashlib

    words = text.lower().split()
    if not words:
        return np.empty(0, dtype=np.uint64)
    if len(words) < SHINGLE_K:
        grams = [" ".join(words)]
    else:
        grams = [
            " ".join(words[i : i + SHINGLE_K])
            for i in range(len(words) - SHINGLE_K + 1)
        ]
    buf = b"".join(
        hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest() for g in grams
    )
    return np.frombuffer(buf, dtype=">u8").astype(np.uint64)


def _minhash_signature(text: str | None) -> list[int] | None:
    if text is None:
        return None
    sh = _shingle_hashes(text)
    if len(sh) == 0:
        return [0] * NUM_PERM
    x = (sh & np.uint64((1 << 61) - 1)).astype(np.int64)
    # (a*x + b) mod p for all perms x all shingles, then min per perm
    vals = (
        x[None, :].astype(np.uint64) * _PERM_A[:, None].astype(np.uint64)
        + _PERM_B[:, None].astype(np.uint64)
    ) % np.uint64(_MERSENNE)
    return vals.min(axis=1).astype(np.int64).tolist()


@pandas_udf(ArrayType(LongType()))
def minhash_udf(text: pd.Series) -> pd.Series:
    return text.map(_minhash_signature)


def _jaccard(a: str, b: str) -> float:
    sa = set(_shingle_hashes(a).tolist())
    sb = set(_shingle_hashes(b).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# NB: DataType object, not "double" DDL — string types need the JVM to
# parse, which breaks when the Python WORKER re-imports this module.
@pandas_udf(DoubleType())
def jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([_jaccard(x, y) for x, y in zip(a, b)])


def band_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, band, bh) — the ONLY columns that cross the LSH band shuffle.

    Fixed-width by construction (two longs + an int per row x NUM_BANDS):
    at 100 TB the band self-join moves O(corpus_rows x NUM_BANDS x 20 B),
    not corpus bytes. tests/test_dedup_scale.py::test_band_table_carries_no_text
    asserts no string column ever enters this table.
    """
    rows_per_band = NUM_PERM // NUM_BANDS
    sig = docs.select(F.col(id_col), minhash_udf(F.col(text_col)).alias("sig"))
    return sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
                        ).alias("bh"),
                    )
                    for b in range(NUM_BANDS)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bh")


def minhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    broadcast_candidates: bool = True,
) -> DataFrame:
    """All (id_a < id_b) pairs with verified shingle-Jaccard >= threshold.

    Plan: signature -> (id, band, bh) band table -> self-equi-join on
    (band, band_hash) -> distinct candidate ID pairs -> texts joined back
    ONLY for the candidate set -> exact-Jaccard verify.

    Round-1 defect fixed here: the band self-join used to carry full
    document text on both sides (~2 x NUM_BANDS x corpus bytes through
    the shuffle). Now the candidate generation shuffles only compact keys;
    texts are fetched via a broadcast semi-join on the candidate id set,
    which is far smaller than the corpus by construction (LSH banding
    exists precisely to make it so).
    """
    bands = band_table(docs, id_col, text_col)
    left = bands.select(F.col(id_col).alias("id_a"), "band", "bh")
    right = bands.select(F.col(id_col).alias("id_b"), "band", "bh")
    cands = (
        left.join(right, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Candidate id set is USUALLY small (LSH banding exists precisely to
    # make it so) -> broadcast it; the two text fetches are then broadcast
    # hash joins that STREAM docs (no text shuffle at all). But it is
    # O(candidate pairs), NOT bounded: on a duplicate-heavy corpus the
    # broadcast can blow the driver limit. `broadcast_candidates=False`
    # drops the hint — the semi-join plans as a shuffled join (AQE may
    # still convert it back to broadcast at runtime if the built side
    # turns out small); results are identical either way
    # (tests/test_round3_fixes.py).
    ids = (
        cands.select(F.col("id_a").alias("_id"))
        .unionByName(cands.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    if broadcast_candidates:
        ids = F.broadcast(ids)
    needed = docs.join(
        ids, docs[id_col] == ids["_id"], "left_semi"
    ).select(id_col, text_col)
    ta = needed.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("text_a"))
    tb = needed.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("text_b"))
    verify = cands.join(ta, "id_a").join(tb, "id_b")
    return (
        verify.withColumn("jaccard", jaccard_udf("text_a", "text_b"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def duplicate_span_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens: int = 20,
    min_occurrences: int = 2,
) -> DataFrame:
    """Repeated-span detection (exact substring dedup, re-expressed
    Spark-first): per document, how many of its n_tokens-word windows
    also occur elsewhere in the corpus.

    The suffix-array formulation of train-data span dedup doesn't
    distribute; the equivalent corpus-scale shape is a rolling window
    hash: every document emits one xxhash64 per token window (native
    transform/sequence/slice — no Python), repeated windows fall out of
    one groupBy on the hash, and a second equi-join attributes them back
    to documents. Cost is O(total tokens) rows through two shuffles on an
    8-byte key — no text leaves the scan stage.

    Output: (id, n_windows, n_dup_windows) per document that has >= 1
    window; callers drop or trim documents above a duplication ratio.
    """
    w = F.split(F.col(text_col), " ")
    occ = (
        docs.filter(F.size(w) >= n_tokens)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(w) - n_tokens),
                    lambda i: F.xxhash64(
                        F.concat_ws(" ", F.slice(w, i + 1, n_tokens))
                    ),
                )
            ).alias("wh"),
        )
    )
    dup = (
        occ.groupBy("wh")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= min_occurrences)
        .select("wh")
    )
    return (
        occ.join(dup, "wh", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_dup_windows"))
        .join(
            occ.groupBy(id_col).agg(F.count("*").alias("n_windows")),
            id_col,
            "right",
        )
        .select(
            id_col,
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
        )
    )


# --- SimHash -----------------------------------------------------------------


def _simhash(text: str | None) -> int:
    if not text:
        return 0
    sh = _shingle_hashes(text)
    if len(sh) == 0:
        return 0
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    acc = (2 * bits - 1).sum(axis=0)
    val = 0
    for i in np.nonzero(acc > 0)[0]:
        val |= 1 << int(i)
    return val & ((1 << 63) - 1)


@pandas_udf(LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    return text.map(_simhash)


def simhash_buckets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", band_bits: int = 16
) -> DataFrame:
    """(id, simhash, band, bucket) — banded Hamming-neighbor index."""
    sig = docs.select(F.col(id_col), simhash_udf(F.col(text_col)).alias("simhash"))
    bands = []
    for b in range(64 // band_bits):
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), b * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("bucket"),
            )
        )
    return sig.select(
        id_col, "simhash", F.explode(F.array(*bands)).alias("bb")
    ).select(id_col, "simhash", "bb.band", "bb.bucket")


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard via explode + group (no signatures): for each
    pair sharing >= 1 gram, |A ∩ B| / (|A| + |B| - |A ∩ B|). Native set
    algebra — quadratic in shared-gram pairs, so for bounded corpora /
    post-LSH verification, not the 10^12 path."""
    grams = docs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.lit(0), F.size(F.split(F.col(text_col), " ")) - n
                    ),
                ),
                lambda i: F.xxhash64(
                    F.concat_ws(
                        " ", F.slice(F.split(F.col(text_col), " "), i + 1, n)
                    )
                ),
            )
        ).alias("gram"),
    ).distinct()
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = grams.select(F.col(id_col).alias("id_a"), "gram")
    b = grams.select(F.col(id_col).alias("id_b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
