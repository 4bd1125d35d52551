"""Cross-encoder rerank seam + deterministic lexical default.

Production RAG retrieval is a funnel: a cheap first stage (BM25 or
ANN) produces a candidate shortlist, then an expensive PAIRWISE model
— a cross-encoder scoring (query, document) together — reorders the
shortlist. The funnel is what makes the expensive model affordable:
it sees k candidates per query, never the corpus.

Like the embedding seam (functions/embed.py, reference
src/app.py:30-50's pluggable override hook), the heavy model is a
swap-in: ``make_cross_encoder_udf`` wraps any batch (query, doc) →
score callable as an Arrow-batched pandas UDF whose model loads once
per executor process via the module registry. The shipped default is a
deterministic lexical scorer — token-set Jaccard — expressible in SQL,
so the whole two-stage pipeline is oracle-checkable end to end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cyborgdb_encrypted_vector_search_spark.functions import text as X

# Executor-process-local registry: module globals survive task
# re-deserialization inside a reused Python worker (closure state does
# not), so a heavy cross-encoder genuinely loads ONCE per worker.
_MODEL_REGISTRY: dict[str, object] = {}


def cross_score(query_col: Column | str, doc_col: Column | str) -> Column:
    """Default deterministic pairwise relevance: Jaccard similarity of
    the two texts' distinct token sets, rounded to 7 dp; 0.0 when both
    are empty. Pure built-in array functions — JVM-side, no UDF."""
    q = F.array_distinct(X.tokens(query_col))
    d = F.array_distinct(X.tokens(doc_col))
    return cross_score_arrays(q, d)


def cross_score_arrays(q_toks: Column, d_toks: Column) -> Column:
    """cross_score over PRE-TOKENIZED distinct-token arrays. In a
    candidates × queries join, tokenize each side ONCE below the join
    (a projection per doc / per query) and pay only the set
    intersect/union per pair — same values as cross_score on the raw
    texts, linear tokenization instead of per-pair."""
    union = F.size(F.array_union(q_toks, d_toks))
    inter = F.size(F.array_intersect(q_toks, d_toks))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        F.round(inter.cast("double") / union.cast("double"), 7)
    )


def sql_cross_score(q_expr: str, d_expr: str) -> str:
    """DuckDB twin of cross_score (for two-sided oracles)."""
    q = f"list_distinct({X.sql_tokens(q_expr)})"
    d = f"list_distinct({X.sql_tokens(d_expr)})"
    return (
        f"CASE WHEN len(list_distinct(list_concat({q}, {d}))) = 0 THEN 0.0 "
        f"ELSE round(CAST(len(list_intersect({q}, {d})) AS DOUBLE) "
        f"/ len(list_distinct(list_concat({q}, {d}))), 7) END"
    )


def make_cross_encoder_udf(model_loader, tag: str):
    """Arrow-batched pandas UDF scoring (query, document) pairs with a
    real model.

    ``model_loader`` is a zero-arg callable returning an object with
    ``predict(list[tuple[str, str]]) -> list[float]`` — the
    sentence-transformers ``CrossEncoder`` surface. It runs lazily,
    once per executor Python worker (cached in the module registry
    under ``tag``); each Arrow batch is one predict call. Swapping the
    default lexical scorer for e.g. ms-marco-MiniLM is:

        udf = make_cross_encoder_udf(
            lambda: CrossEncoder("cross-encoder/ms-marco-MiniLM-L-6-v2"),
            tag="msmarco-minilm")
        reranked = candidates.withColumn("score", udf("query_text", "text"))
    """
    @pandas_udf("double")
    def _score(q: pd.Series, d: pd.Series) -> pd.Series:
        model = _MODEL_REGISTRY.get(tag)
        if model is None:
            model = model_loader()
            _MODEL_REGISTRY[tag] = model
        preds = model.predict(list(zip(q.tolist(), d.tolist())))
        return pd.Series([float(p) for p in preds])

    return _score
