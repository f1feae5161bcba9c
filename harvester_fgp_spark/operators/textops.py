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
from pyspark.sql.types import DoubleType, IntegerType, LongType, StringType

from ..functions import text as _text


@pandas_udf(StringType())
def detect_lang_udf(text: pd.Series) -> pd.Series:
    return text.map(_text.detect_lang)


@pandas_udf(DoubleType())
def quality_udf(text: pd.Series) -> pd.Series:
    return text.map(_text.quality_score)


@pandas_udf(IntegerType())
def token_count_udf(text: pd.Series) -> pd.Series:
    return text.map(_text.token_count)


@pandas_udf(LongType())
def fingerprint_udf(text: pd.Series) -> pd.Series:
    return text.map(_text.fingerprint64)


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
    """documents + (detected_lang, quality, n_tokens, fingerprint)."""
    t = F.col(text_col)
    return (
        docs.withColumn("detected_lang", detect_lang_udf(t))
        .withColumn("quality", quality_udf(t))
        .withColumn("n_tokens", token_count_udf(t))
        .withColumn("fingerprint", fingerprint_udf(t))
    )
