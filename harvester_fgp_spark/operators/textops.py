"""Text-analysis operators for training-data pipelines.

Language-ID / quality / token counting / fingerprinting over a documents
table — wraps the pure kernels in functions.text as Arrow-batched pandas
UDFs plus native expressions where Spark builtins suffice (whitespace
tokens, char counts stay JVM-side).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..functions import text as _text


@pandas_udf(StringType())
def detect_lang_udf(text: pd.Series) -> pd.Series:
    return _text.detect_lang_batch(text)


@pandas_udf(DoubleType())
def quality_udf(text: pd.Series) -> pd.Series:
    return _text.quality_score_batch(text)


_LANG_QUALITY_TYPE = StructType(
    [
        StructField("detected_lang", StringType(), True),
        StructField("quality", DoubleType(), True),
    ]
)


@pandas_udf(_LANG_QUALITY_TYPE)
def lang_quality_udf(text: pd.Series) -> pd.DataFrame:
    """Fused lang-ID + quality in ONE Python pass (the production path).

    Measured on 5000 driver docs (round 3): scalar kernels are 0.083s +
    0.095s; the findall regex scan is ~90% of each, and the np.isin-based
    batch twins came out 6x SLOWER (object-array materialization costs
    more than the per-row set lookups they replace). Fusing shares the
    single dominant findall between both outputs — the only real win.
    """
    # per-row-ok: measured — Python-set stopword membership is C-speed
    # dict probing; every batch reconstruction tried (np.isin on object
    # and on siphashed uint64 arrays) lost to it. See functions.text
    # batch kernels for the property-tested alternatives + numbers.
    pairs = text.map(_text.lang_quality)
    return pd.DataFrame(
        {
            "detected_lang": [p[0] for p in pairs],
            "quality": [p[1] for p in pairs],
        }
    )


# The same BPE-ish pattern runs in three engines: here (Java regex), the
# Python kernel functions.text._TOKEN_RE (the pytest oracle), and the
# DuckDB twin's regexp_extract_all (RE2). The driver documents are ASCII,
# where Java's ASCII \d/\s agree with Python's unicode classes; the
# cross-engine equality is itself oracle-checked (text_token_stats).
TOKEN_RE = r"[a-zA-ZÀ-ɏ]+|\d+|[^\sa-zA-Z\d]"


def token_count_col(text: Column) -> Column:
    """BPE-ish token count, fully NATIVE (whole-stage codegen): replaces
    the former per-row Python ``token_count_udf`` — Spark's
    regexp_extract_all is the same construct the DuckDB oracle always
    used, so no Python needs to run per batch at all."""
    n = F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0)))
    return F.when(text.isNull(), F.lit(0)).otherwise(n).cast("int")


def fingerprint64_col(text: Column) -> Column:
    """Stable 63-bit document fingerprint, fully NATIVE: first 8 bytes of
    sha1 as a signed long, masked to 63 bits — bit-identical to the
    Python kernel functions.text.fingerprint64 (two's-complement low bits
    are the same whether the 64-bit prefix is read signed or unsigned)."""
    signed = F.conv(F.substring(F.sha1(text), 1, 16), 16, -10).cast("long")
    masked = signed.bitwiseAND(F.lit((1 << 63) - 1))
    return F.when(text.isNull(), F.lit(0)).otherwise(masked).cast("long")


TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)="


def canonical_url_col(url: Column) -> Column:
    """Canonical URL form for web-corpus dedup keys — fully native (E-family):

    drop fragment -> rebuild the query string without tracking params
    (split/filter/array_join, not regex lookbehind: portable to engines
    without PCRE) -> lowercase scheme+host only (path/query are
    case-sensitive per RFC 3986) -> trim trailing slashes.
    """
    # F.get (0-based) is null-safe out of bounds, unlike element_at under ANSI
    no_frag = F.get(F.split(url, "#", 2), 0)
    base = F.get(F.split(no_frag, r"\?", 2), 0)
    q = F.get(F.split(no_frag, r"\?", 2), 1)
    kept = F.filter(
        F.split(q, "&"), lambda p: ~p.rlike(TRACKING_PARAM_RE)
    )
    canon_q = F.array_join(kept, "&")
    with_q = F.when(
        q.isNull() | (canon_q == ""), base
    ).otherwise(F.concat(base, F.lit("?"), canon_q))
    head = F.regexp_extract(with_q, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", 0)
    rest = with_q.substr(F.length(head) + 1, F.lit(1_000_000))
    return F.regexp_replace(F.concat(F.lower(head), rest), "/+$", "")


# RE2-compatible (no lookaround/backrefs) so the same patterns run in
# Spark (Java regex), DuckDB, and any RE2-based scrubber downstream.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d\-]{6,}\d"


def scrub_pii_col(text: Column) -> Column:
    """PII scrubbing for training corpora: emails -> [EMAIL], then
    phone-shaped digit runs -> [PHONE] (email first so its digits can't
    half-match the phone pattern). Native regexp_replace — replaces every
    occurrence, stays in whole-stage codegen."""
    no_email = F.regexp_replace(text, EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(no_email, PHONE_RE, "[PHONE]")


def with_text_analysis(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents + (detected_lang, quality, n_tokens, fingerprint).

    n_tokens and fingerprint are native expressions (no Python at all);
    lang + quality come from ONE fused pandas UDF (one findall pass, one
    Arrow struct column back)."""
    t = F.col(text_col)
    return (
        docs.withColumn("_lq", lang_quality_udf(t))
        .withColumn("detected_lang", F.col("_lq.detected_lang"))
        .withColumn("quality", F.col("_lq.quality"))
        .drop("_lq")
        .withColumn("n_tokens", token_count_col(t))
        .withColumn("fingerprint", fingerprint64_col(t))
    )
