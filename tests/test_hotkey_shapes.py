"""Round-4: the corpus-wide text ops must not funnel a hot key through
one window partition (VERDICT r3 wrong-#1/#2).

Windows have NO map-side partial aggregation: at 100 TB a cookie-banner
line in 10^8 documents, or the term "the", lands ALL its rows in a
single task. The fixed shapes are (a) plain groupBy counts — hash
aggregation DOES partial combine, so a hot key sends one partial row
per map task — joined back on a compact key where AQE can broadcast or
skew-split, and (b) two-phase top-k whose phase-1 window partitions on
(term, salt) so no partition exceeds ~1/n_salts of a hot term.

Asserted here: the PLAN (no Window over a raw corpus key; partial
aggregate modes present; phase-1 window carries the salt) and planted
hot-key fixtures (one line/span/term in >= 50% of docs) staying exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import plan_string as _plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- plan shapes -------------------------------------------------------------


def test_dedup_lines_plan_has_no_window_and_partial_agg(spark):
    from harvester_fgp_spark.operators.textops import remove_duplicate_lines

    docs = _docs(
        spark,
        [(i, f"cookie banner. unique line {i}. tail {i * 7}") for i in range(40)],
    )
    out = remove_duplicate_lines(docs, sep=". ", min_occurrences=10)
    out.count()  # finalize AQE so the executed plan is the real one
    plan = _plan(out)
    assert "Window" not in plan, plan[:800]
    # the dup-line count must be a hash aggregate with a partial mode
    assert "partial_count" in plan, plan[:800]


def test_span_counts_plan_has_no_window_and_partial_agg(spark):
    from harvester_fgp_spark.operators.dedup import duplicate_span_counts

    span = " ".join(f"w{j}" for j in range(20))
    docs = _docs(
        spark,
        [
            (i, f"{span} filler{i} " + " ".join(f"x{i}y{j}" for j in range(25)))
            for i in range(30)
        ],
    )
    out = duplicate_span_counts(docs, n_tokens=20, min_occurrences=2)
    out.count()
    plan = _plan(out)
    assert "Window" not in plan, plan[:800]
    assert "partial_count" in plan, plan[:800]


def test_postings_phase1_window_is_salted(spark):
    """The only window that sees corpus-sized input partitions on
    (term, _salt) — never on term alone."""
    from harvester_fgp_spark.operators.textops import (
        salted_partial_topk,
        term_frequencies,
    )

    docs = _docs(spark, [(i, f"the quick fox {i}") for i in range(20)])
    tf = term_frequencies(docs)
    plan = _plan(salted_partial_topk(tf, k=3, n_salts=8))
    assert "Window" in plan
    # every windowspecdefinition in the phase-1 plan carries the salt key
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan[:800]
    for spec in specs:
        assert "_salt" in spec, spec


def test_postings_final_window_only_sees_bounded_survivors(spark):
    """The returned plan's window runs over the localCheckpointed
    survivor frame (<= n_salts*k rows per term), never the raw tf."""
    from harvester_fgp_spark.operators.textops import inverted_postings

    docs = _docs(spark, [(i, f"the quick fox f{i % 5}") for i in range(20)])
    out = inverted_postings(docs, k=2, min_df=2, n_salts=4)
    plan = _plan(out)
    # post-checkpoint plan starts from the materialized survivors: the
    # tokenize/explode scan is NOT re-run under the final window
    assert "regexp_extract_all" not in plan, plan[:800]
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan, plan[:800]


# --- planted hot keys stay exact --------------------------------------------


def test_dedup_lines_hot_line_exact(spark):
    from harvester_fgp_spark.operators.textops import remove_duplicate_lines

    # one boilerplate line in EVERY doc (100%), uniques elsewhere
    docs = _docs(
        spark, [(i, f"accept all cookies. body {i}") for i in range(50)]
    )
    rows = {
        r["doc_id"]: r["clean_text"]
        for r in remove_duplicate_lines(
            docs, sep=". ", min_occurrences=10
        ).collect()
    }
    assert rows == {i: f"body {i}" for i in range(50)}


def test_span_counts_hot_span_exact(spark):
    from harvester_fgp_spark.operators.dedup import duplicate_span_counts

    span = " ".join(f"s{j}" for j in range(20))
    rows = []
    for i in range(40):
        uniq = " ".join(f"u{i}x{j}" for j in range(20))
        # 50% of docs carry the hot span
        rows.append((i, f"{span} {uniq}" if i % 2 == 0 else uniq))
    out = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
        for r in duplicate_span_counts(
            _docs(spark, rows), n_tokens=20, min_occurrences=2
        ).collect()
    }
    for i in range(40):
        if i % 2 == 0:
            # 40 tokens -> 21 windows; only the pure hot window (pos 0)
            # repeats across docs — mixed hot/unique windows are unique
            assert out[i] == (21, 1), (i, out[i])
        else:
            assert out[i] == (1, 0), (i, out[i])


def test_postings_hot_term_exact(spark):
    from harvester_fgp_spark.operators.textops import inverted_postings

    # "the" occurs in every doc with tf = 1 + (doc % 3); top-2 by
    # (tf desc, doc asc) -> docs 2 and 5 (tf 3); df = 60
    docs = _docs(
        spark,
        [(i, " ".join(["the"] * (1 + i % 3)) + f" only{i}") for i in range(60)],
    )
    out = {
        r["term"]: (r["df"], r["postings"])
        for r in inverted_postings(docs, k=2, min_df=2, n_salts=8).collect()
    }
    assert out["the"] == (60, "2:3,5:3")
    # unique terms (df=1) are filtered by min_df
    assert not any(t.startswith("only") for t in out)
