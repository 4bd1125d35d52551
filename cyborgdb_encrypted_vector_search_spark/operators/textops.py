"""Document-table text-analysis operators (profile, filter, fingerprint).

Composes functions.text / functions.hashing into whole-table operators
over the ``documents`` schema (doc_id, text, lang, source, n_chars).
All scan→project pipelines: no shuffle except where a groupBy is the
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cyborgdb_encrypted_vector_search_spark.functions import hashing as H
from cyborgdb_encrypted_vector_search_spark.functions import text as X


def profile(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document text metrics: tokens, chars, punct ratio, stopword
    ratio, quality score, heuristic language, fingerprint.

    Tokens and punct ratio are materialized in a first projection, then
    every metric reads the attributes — tokenization runs once per row,
    not once per metric (~8x less regex/split work than naive inlining).
    """
    t = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        t.alias("__text"),
        X.tokens(t).alias("__toks"),
        X.punct_ratio(t).alias("__punct"),
    )
    toks = F.col("__toks")
    tc = F.size(toks)
    quality = F.round(
        F.least(tc.cast("double") / F.lit(20.0), F.lit(1.0))
        * (F.lit(1.0) - F.col("__punct")),
        6,
    )
    return staged.select(
        F.col(id_col),
        tc.alias("n_tokens"),
        X.char_count(F.col("__text")).alias("n_chars_computed"),
        F.round(F.col("__punct"), 7).alias("punct_ratio"),
        F.round(X.stopword_ratio_from(toks), 7).alias("stopword_ratio"),
        quality.alias("quality"),
        X.lang_id_from(toks).alias("lang_pred"),
        H.fingerprint_md5(F.col("__text")).alias("fingerprint"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_punct_ratio: float = 0.3,
) -> DataFrame:
    """Keep documents passing basic pretraining-quality gates."""
    t = F.col(text_col)
    return df.filter(
        (X.token_count(t) >= min_tokens) & (X.punct_ratio(t) <= max_punct_ratio)
    )


def lang_distribution(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus language histogram from the heuristic classifier."""
    return (
        df.select(X.lang_id(F.col(text_col)).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
