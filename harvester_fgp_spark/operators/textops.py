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


def with_text_analysis(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents + (detected_lang, quality, n_tokens, fingerprint)."""
    t = F.col(text_col)
    return (
        docs.withColumn("detected_lang", detect_lang_udf(t))
        .withColumn("quality", quality_udf(t))
        .withColumn("n_tokens", token_count_udf(t))
        .withColumn("fingerprint", fingerprint_udf(t))
    )
