"""Retrieval-quality evaluation metrics (MRR, NDCG@k) as dataflows.

The reference demonstrates retrieval but never scores it; any pipeline
that tunes an index (nprobe, PQ bits, BM25 k1/b) or compares retrievers
needs ranking metrics computed AT CORPUS SCALE — per-query, over
millions of queries, without collecting rankings to the driver. These
operators take a (query, rank, relevant) frame — produced by any of the
engine's retrieval paths joined to ground-truth labels — and reduce it
to per-query metrics with one map-side-combinable aggregate.

- MRR: 1 / rank of the first relevant hit (0 when nothing relevant).
- NDCG@k: DCG with the standard 1/log2(rank+1) discount, normalized by
  the ideal DCG for the query's number of relevant hits in the top-k.

Scale shape: one groupBy on the query id — partial aggregation does the
per-rank sums map-side, so the shuffle carries |queries| rows, never
|queries| x k. No UDFs; log2 and the conditional sums are codegen
expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _log2(col):
    return F.log(2.0, col)


def retrieval_metrics(
    ranked: DataFrame,
    k: int,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "relevant",
) -> DataFrame:
    """Per-query MRR and NDCG@k from a (query, rank, relevant) frame.

    ``rank`` must be 1-based and unique per query (the engine's top-k
    operators guarantee this); rows with rank > k are ignored. Returns
    (query, n_rel, mrr, ndcg) with the metrics as raw doubles — round
    at the presentation boundary, not here.

    The ideal DCG is computed from n_rel in closed form as
    ``sum_{i=1..min(n_rel,k)} 1/log2(i+1)`` via an unrolled sequence
    aggregate — still a column expression, no second pass over the
    data.
    """
    r = ranked.filter(F.col(rank_col) <= k)
    rel = F.col(rel_col).cast("int")
    gain = rel / _log2(F.col(rank_col).cast("double") + F.lit(1.0))
    first_rel = F.min(F.when(rel == 1, F.col(rank_col)))
    agg = r.groupBy(F.col(query_col)).agg(
        F.sum(rel).cast("bigint").alias("n_rel"),
        F.sum(gain).alias("__dcg"),
        first_rel.alias("__first"),
    )
    # ideal DCG: positions 1..min(n_rel, k) all relevant
    ideal = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_rel").cast("int"), F.lit(k))),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / _log2(i.cast("double") + F.lit(1.0)),
    )
    return agg.select(
        F.col(query_col),
        "n_rel",
        F.when(F.col("__first").isNull(), F.lit(0.0))
        .otherwise(F.lit(1.0) / F.col("__first").cast("double"))
        .alias("mrr"),
        F.when(F.col("n_rel") == 0, F.lit(0.0))
        .otherwise(F.col("__dcg") / ideal)
        .alias("ndcg"),
    )
