"""Unit/property coverage for the second-wave round-5 operators:
temperature sampling, kNN classification, retrieval metrics."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from cyborgdb_encrypted_vector_search_spark.operators import ranking_eval, sampling
from cyborgdb_encrypted_vector_search_spark.operators.knn import classify_by_vote


# ------------------------------------------------------------ temperature


def _sources(spark, sizes):
    rows = []
    nid = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((nid, src))
            nid += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_temperature_quotas_flatten_the_mix(spark):
    """T=0.5 gives the small source a larger share of the budget than
    its share of the corpus, and the big source a smaller one; quotas
    are capped at group size and sum to ~budget."""
    df = _sources(spark, {"big": 900, "small": 100})
    q = {
        r["grp"]: r
        for r in sampling.temperature_quotas(df, 100, 0.5).collect()
    }
    big, small = q["big"]["quota"], q["small"]["quota"]
    assert big + small in (99, 100, 101)  # rounding never drifts far
    # corpus share of small = 10%; sqrt-weighted share = 25%
    assert small >= 20
    assert small / (big + small) > 100 / 1000
    for r in q.values():
        assert r["quota"] <= r["n_total"]


def test_temperature_quota_caps_at_group_size(spark):
    """A budget larger than the corpus keeps every row (quota = n)."""
    df = _sources(spark, {"a": 30, "b": 10})
    q = {r["grp"]: r["quota"] for r in sampling.temperature_quotas(df, 10_000, 0.5).collect()}
    assert q == {"a": 30, "b": 10}


def test_temperature_sample_fills_quotas_deterministically(spark):
    """Selected counts equal the quotas, and the selection is identical
    across recomputation and repartitioning (pure function of the
    key)."""
    df = _sources(spark, {"a": 200, "b": 50})
    quotas = {
        r["grp"]: r["quota"]
        for r in sampling.temperature_quotas(df, 60, 0.5).collect()
    }
    sel = sampling.temperature_sample(df, 60, 0.5)
    got = {
        r["source"]: r["n"]
        for r in sel.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got == quotas
    ids1 = sorted(r["doc_id"] for r in sel.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in sampling.temperature_sample(df.repartition(13), 60, 0.5).collect()
    )
    assert ids1 == ids2


# ------------------------------------------------------------- knn votes


def test_classify_by_vote_majority_and_ties(spark):
    """Majority label wins; a 50/50 split prefers the label of the
    nearer witness."""
    corpus = spark.createDataFrame(
        [
            # label 1 cluster near +x
            (10, [1.0, 0.0], 1),
            (11, [0.99, 0.05], 1),
            (12, [0.98, 0.08], 1),
            # label 2 cluster near +y
            (20, [0.0, 1.0], 2),
            (21, [0.05, 0.99], 2),
            (22, [0.08, 0.98], 2),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    queries = spark.createDataFrame(
        [(1, [0.9, 0.1]), (2, [0.1, 0.9])],
        "query_id long, query_vec array<double>",
    )
    out = {
        r["query_id"]: r
        for r in classify_by_vote(queries, corpus, k=3).collect()
    }
    assert out[1]["predicted"] == 1 and out[1]["n_votes"] == 3
    assert out[2]["predicted"] == 2 and out[2]["n_votes"] == 3

    # k=4: query 1 gets 3 votes for label 1 and 1 for label 2
    out4 = {r["query_id"]: r for r in classify_by_vote(queries, corpus, k=4).collect()}
    assert out4[1]["predicted"] == 1 and out4[1]["n_votes"] == 3

    # 2-vs-2 tie at k=4 on an equidistant query: nearest witness decides
    eq = spark.createDataFrame(
        [(9, [1.0, 1.0])], "query_id long, query_vec array<double>"
    )
    tie = classify_by_vote(
        eq,
        spark.createDataFrame(
            [
                (1, [1.0, 0.0], 7),
                (2, [0.0, 1.0], 8),
                (3, [0.9, 0.1], 7),
                (4, [0.1, 0.9], 8),
            ],
            "vec_id long, embedding array<double>, label int",
        ),
        k=4,
    ).collect()[0]
    assert tie["n_votes"] == 2
    # all four scores tie pairwise; rank ties broke on vec_id, so the
    # best-ranked witness is vec_id 1 -> label 7
    assert tie["predicted"] == 7


# -------------------------------------------------------------- metrics


def _ranked(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, rank int, relevant int"
    )


def test_retrieval_metrics_hand_computed(spark):
    """MRR and NDCG match hand-computed values on a 3-item ranking."""
    # relevant at ranks 2 and 3, k=3
    df = _ranked(spark, [(1, 1, 0), (1, 2, 1), (1, 3, 1)])
    m = ranking_eval.retrieval_metrics(df, k=3).collect()[0]
    assert m["n_rel"] == 2
    assert abs(m["mrr"] - 0.5) < 1e-12
    dcg = 1 / math.log2(3) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert abs(m["ndcg"] - dcg / idcg) < 1e-12


def test_retrieval_metrics_edges(spark):
    """No relevant -> both metrics 0; perfect prefix -> both 1."""
    none = ranking_eval.retrieval_metrics(
        _ranked(spark, [(1, 1, 0), (1, 2, 0)]), k=10
    ).collect()[0]
    assert none["mrr"] == 0.0 and none["ndcg"] == 0.0 and none["n_rel"] == 0

    perfect = ranking_eval.retrieval_metrics(
        _ranked(spark, [(2, 1, 1), (2, 2, 1), (2, 3, 0)]), k=3
    ).collect()[0]
    assert perfect["mrr"] == 1.0
    assert abs(perfect["ndcg"] - 1.0) < 1e-12


def test_retrieval_metrics_ignores_past_k(spark):
    """Rows with rank > k contribute nothing."""
    m = ranking_eval.retrieval_metrics(
        _ranked(spark, [(1, 1, 0), (1, 2, 1), (1, 11, 1)]), k=10
    ).collect()[0]
    assert m["n_rel"] == 1
    assert abs(m["mrr"] - 0.5) < 1e-12
