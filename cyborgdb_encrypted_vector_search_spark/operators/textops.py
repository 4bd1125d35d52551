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
    ratio, quality score, heuristic language, fingerprint."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        X.token_count(t).alias("n_tokens"),
        X.char_count(t).alias("n_chars_computed"),
        F.round(X.punct_ratio(t), 7).alias("punct_ratio"),
        F.round(X.stopword_ratio(t), 7).alias("stopword_ratio"),
        X.quality_score(t).alias("quality"),
        X.lang_id(t).alias("lang_pred"),
        H.fingerprint_md5(t).alias("fingerprint"),
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
