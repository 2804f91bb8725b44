"""Text-analysis operators: tokenization, quality scoring, language-ID,
fingerprinting — reusable column builders (the q18-q21 plans consume the
same semantics; these are the library API an ingest pipeline calls).

All hot-path functions are built-in column expressions. One Arrow-batched
``pandas_udf`` (:func:`rolling_fingerprint`) demonstrates the vectorized
Python path for logic that genuinely can't be expressed with built-ins
(a stateful rolling hash) — per SURVEY §2.9, pandas UDFs are the only
sanctioned Python escape hatch (10-100× over row-at-a-time UDFs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

STOPWORDS = ("the", "a", "of", "and", "to")
LANG_MARKERS = {
    "en": ("the", "a", "and"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
    "de": ("der", "die", "und"),
}


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def regex_token_count(text: Column | str, pattern: str = "[a-z]+") -> Column:
    """BPE-ish tokenization: count of lowercase letter runs."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(pattern), F.lit(0)))


def stopword_count(text: Column | str, stopwords=STOPWORDS) -> Column:
    lst = ", ".join(repr(w) for w in stopwords)
    name = text if isinstance(text, str) else "text"
    return F.expr(f"size(filter(split({name}, ' '), x -> x IN ({lst})))")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_tokens / n_stopwords / stop_ratio / alpha_ratio / quality_flag."""
    t = F.col(text_col)
    out = (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("n_stopwords", stopword_count(text_col))
        .withColumn(
            "n_alpha", F.length(F.regexp_replace(t, "[^a-z]", ""))
        )
    )
    return (
        out.withColumn("stop_ratio", F.col("n_stopwords") / F.col("n_tokens"))
        .withColumn("alpha_ratio", F.col("n_alpha") / F.length(t))
        .withColumn(
            "quality_flag",
            (F.col("n_tokens").between(20, 200) & (F.col("n_stopwords") > 0)).cast("int"),
        )
    )


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append s_<lang> marker-hit counts and pred_lang (fixed precedence)."""
    for lang, words in LANG_MARKERS.items():
        lst = ", ".join(repr(w) for w in words)
        df = df.withColumn(
            f"s_{lang}",
            F.expr(f"size(filter(split({text_col}, ' '), x -> x IN ({lst})))"),
        )
    pred = (
        F.when(
            (F.col("s_en") > 0) & (F.col("s_en") >= F.greatest("s_fr", "s_es", "s_de")),
            F.lit("en"),
        )
        .when((F.col("s_fr") > 0) & (F.col("s_fr") >= F.greatest("s_es", "s_de")), F.lit("fr"))
        .when((F.col("s_es") > 0) & (F.col("s_es") >= F.col("s_de")), F.lit("es"))
        .when(F.col("s_de") > 0, F.lit("de"))
        .otherwise(F.lit("unknown"))
    )
    return df.withColumn("pred_lang", pred)


def fingerprint(text: Column | str, length: int = 16) -> Column:
    """Normalized-md5 document fingerprint (the q21 semantics)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.substring(
        F.md5(F.regexp_replace(F.lower(c), "[^a-z ]", "")), 1, length
    )


def rolling_fingerprint(col: Column | str) -> Column:
    """Polynomial rolling hash over characters (Arrow-batched pandas UDF).

    Stateful per-character accumulation has no built-in equivalent;
    this is the sanctioned vectorized-Python path. Built as a local
    closure (pickled by value) so executors never need this package on
    their import path.
    """

    @pandas_udf(LongType())
    def _udf(texts: pd.Series) -> pd.Series:
        MOD = (1 << 61) - 1
        BASE = 257

        def roll(s: str) -> int:
            h = 0
            for ch in s:
                h = (h * BASE + ord(ch)) % MOD
            return h

        return texts.fillna("").map(roll)

    return _udf(F.col(col) if isinstance(col, str) else col)
