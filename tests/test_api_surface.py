"""Exercise the public API surface that has no other caller yet, so every
exported helper is equivalence-checked against its primary implementation
(nothing in the package is dead-by-construction)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from harvester_fgp_spark.geo import cells as C
from harvester_fgp_spark.geo import tiles as T
from harvester_fgp_spark.operators import geo as G


def test_cell_encode_udf_matches_native(spark):
    pdf = pd.DataFrame(
        {
            "lon": np.random.default_rng(3).uniform(-179, 179, 200),
            "lat": np.random.default_rng(4).uniform(-89, 89, 200),
        }
    )
    df = spark.createDataFrame(pdf)
    out = df.select(
        G.cell_encode_col(F.col("lon"), F.col("lat"), 12).alias("native"),
        G.cell_encode_udf(12)(F.col("lon"), F.col("lat")).alias("numpy"),
    ).collect()
    assert all(r.native == r.numpy for r in out)


def test_with_cell_wrapper(spark):
    df = spark.createDataFrame(pd.DataFrame({"lon": [10.0], "lat": [20.0]}))
    row = G.with_cell(df, level=8).first()
    assert row.cell_id == int(C.encode(np.array([10.0]), np.array([20.0]), 8)[0])


def test_cover_udf_matches_kernel(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"w": [-100.0], "s": [45.0], "e": [-95.0], "n": [50.0]}
        )
    )
    got = df.select(
        G.cover_udf(5)(F.col("w"), F.col("s"), F.col("e"), F.col("n")).alias("c")
    ).first()["c"]
    exp = C.cover_bboxes_batch(
        np.array([-100.0]), np.array([45.0]), np.array([-95.0]), np.array([50.0]), 5
    )[0]
    assert sorted(got) == sorted(exp.tolist())


def test_nfc_udf_normalizes(spark):
    import unicodedata

    from harvester_fgp_spark.operators.extract import nfc_udf

    decomposed = "Montréal"  # e + combining accent
    df = spark.createDataFrame(pd.DataFrame({"s": [decomposed]}))
    out = df.select(nfc_udf(F.col("s")).alias("n")).first()["n"]
    assert out == unicodedata.normalize("NFC", decomposed) == "Montréal"


def test_with_extracted_payloads_matches_fused_counts(spark):
    """The modular (unfused) E1+E2 path mines the same payload multiset as
    the scalar kernel — it is the documented alternative, not dead code."""
    from harvester_fgp_spark.functions.text import mine_payloads
    from harvester_fgp_spark.operators.extract import with_extracted_payloads
    from harvester_fgp_spark.synth import generate_pages, pages_df

    pages = pages_df(spark, 300, seed=42)
    got = with_extracted_payloads(pages).count()
    pdf = generate_pages(300, seed=42)
    assert got == sum(len(mine_payloads(t)) for t in pdf["text"])


def test_tile_bounds_roundtrip():
    rng = np.random.default_rng(6)
    for _ in range(50):
        lon = float(rng.uniform(-179, 179))
        lat = float(rng.uniform(-80, 80))
        x, y = T.point_to_tile(np.array([lon]), np.array([lat]), 8)
        w, s, e, n = T.tile_bounds(int(x[0]), int(y[0]), 8)
        assert w <= lon <= e and s <= lat <= n


def test_read_all_testdata(spark, sf_dir):
    from harvester_fgp_spark.sources.tables import read_all_testdata

    tables = read_all_testdata(spark, sf_dir)
    assert {"lineitem", "documents", "embeddings"} <= set(tables)
    assert tables["documents"].count() > 0


def test_cosine_sim_col_matches_numpy(spark):
    from harvester_fgp_spark.operators.similarity import cosine_sim_col

    a = [1.0, 2.0, 3.0]
    b = [0.5, -1.0, 2.0]
    df = spark.createDataFrame(
        pd.DataFrame({"a": [a], "b": [b]})
    ).select(
        F.col("a").cast("array<float>").alias("a"),
        F.col("b").cast("array<float>").alias("b"),
    )
    got = df.select(cosine_sim_col("a", "b").alias("c")).first()["c"]
    va, vb = np.array(a, dtype=np.float32), np.array(b, dtype=np.float32)
    exp = float(
        np.dot(va.astype(float), vb.astype(float))
        / (np.linalg.norm(va.astype(float)) * np.linalg.norm(vb.astype(float)))
    )
    assert abs(got - exp) < 1e-9


def test_url_canonicalization_idempotent(spark):
    """canon(canon(u)) == canon(u) over messy deterministic urls."""
    from harvester_fgp_spark.operators.textops import canonical_url_col

    rows = [
        "HTTPS://A.Example.COM/Path/X?utm_source=a&keep=1&fbclid=z#frag",
        "http://b.example.ca/only/path/",
        "https://C.example.org/?utm_a=1&utm_b=2",
        "ftp://Mixed.Case.Host/File.TXT?gclid=9",
        "https://d.example.com",
    ]
    df = spark.createDataFrame(pd.DataFrame({"u": rows}))
    once = df.select(canonical_url_col(F.col("u")).alias("c1"))
    twice = once.select(
        F.col("c1"), canonical_url_col(F.col("c1")).alias("c2")
    ).collect()
    for r in twice:
        assert r.c1 == r.c2, r
    got = [r.c1 for r in once.collect()]
    assert got[0] == "https://a.example.com/Path/X?keep=1"
    assert got[1] == "http://b.example.ca/only/path"
    assert got[2] == "https://c.example.org"
    assert got[4] == "https://d.example.com"


def test_pii_scrub_idempotent_and_complete(spark):
    from harvester_fgp_spark.operators.textops import scrub_pii_col

    rows = [
        "mail me at a.b+c@x-y.co.uk or call +1-555-0100 thanks",
        "two mails p@q.io r@s.de and digits 1234567890",
        "clean text with no pii at all",
    ]
    df = spark.createDataFrame(pd.DataFrame({"t": rows}))
    once = df.select(scrub_pii_col(F.col("t")).alias("s1"))
    twice = once.select(
        "s1", scrub_pii_col(F.col("s1")).alias("s2")
    ).collect()
    for r in twice:
        assert r.s1 == r.s2
        assert "@" not in r.s1 or "[EMAIL]" in r.s1
    got = [r.s1 for r in once.collect()]
    assert got[0] == "mail me at [EMAIL] or call [PHONE] thanks"
    assert got[1] == "two mails [EMAIL] [EMAIL] and digits [PHONE]"
    assert got[2] == rows[2]
