"""Pins the iterative search harness: determinism, reference constants,
early-stop, and merge semantics (SURVEY.md §2.9, §5.5)."""

from __future__ import annotations

import random

import pytest

from cyborgdb_encrypted_vector_search_spark.functions import embed as E
from cyborgdb_encrypted_vector_search_spark.operators import search as S


def test_embed_deterministic_and_normalized():
    a = E.embed_text("spark table join")
    b = E.embed_text("spark table join")
    assert a == b
    assert abs(sum(x * x for x in a) - 1.0) < 1e-9
    assert E.embed_text("") == [0.0] * 64


def test_embed_locality():
    # shared tokens → higher cosine than disjoint tokens
    import numpy as np

    base = np.array(E.embed_text("spark table join filter group"))
    near = np.array(E.embed_text("spark table join filter sort"))
    far = np.array(E.embed_text("zebra yodel quartz nimbus vex"))
    assert float(base @ near) > float(base @ far)


def test_mutations_deterministic():
    r1, r2 = random.Random("k"), random.Random("k")
    assert S.mutate_charwise("hello world", r1) == S.mutate_charwise("hello world", r2)
    r1, r2 = random.Random("k"), random.Random("k")
    assert S.mutate_wordwise("a b c", r1) == S.mutate_wordwise("a b c", r2)
    assert S.mutate_wordwise("", random.Random(1)) in S.WORD_SEEDS


def test_reference_constants():
    # BASELINE.md: defaults must match the reference workload constants
    import inspect

    evo = inspect.signature(S.evolutionary_search).parameters
    assert evo["pop_size"].default == 60
    assert evo["generations"].default == 120
    assert evo["elite_frac"].default == 0.2
    assert evo["early_stop"].default == 0.995
    assert evo["top_n"].default == 30
    gr = inspect.signature(S.greedy_search).parameters
    assert gr["restarts"].default == 12
    assert gr["iters"].default == 200
    assert gr["jump_p"].default == 0.01
    # reference src/app.py:62 verbatim: 62 alphanumerics + space + ,.-'"?!
    assert S.ALPHABET == (
        "abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789 ,.-'\"?!"
    )
    assert len(S.WORD_SEEDS) == 14


@pytest.fixture(scope="module")
def target_and_seeds():
    target = E.embed_text("spark table join filter group sort data")
    seeds = ["data table", "query vector", "join scan", "stream batch"]
    return target, seeds


def test_evolutionary_improves_and_replays(spark, target_and_seeds):
    target, seeds = target_and_seeds
    run1 = S.evolutionary_search(
        spark, target, seeds, pop_size=12, generations=3, seed=7, top_n=5
    ).collect()
    run2 = S.evolutionary_search(
        spark, target, seeds, pop_size=12, generations=3, seed=7, top_n=5
    ).collect()
    assert [(r["text"], r["score"]) for r in run1] == [
        (r["text"], r["score"]) for r in run2
    ]
    base_best = max(
        float(__import__("numpy").dot(E.embed_text(s), target)) for s in seeds
    )
    assert run1[0]["score"] >= base_best - 1e-9  # search never loses to seeds


def test_evolutionary_early_stop(spark, target_and_seeds):
    target, seeds = target_and_seeds
    # early_stop below any achievable score → must exit after gen 0,
    # returning only the first generation's elites
    out = S.evolutionary_search(
        spark, target, seeds, pop_size=8, generations=50, early_stop=-2.0,
        seed=1, top_n=30,
    ).collect()
    assert 0 < len(out) <= 8


def test_greedy_replays_and_beats_seed(spark, target_and_seeds):
    target, seeds = target_and_seeds
    r1 = S.greedy_search(spark, target, seeds, restarts=2, iters=15, seed=3, top_n=5).collect()
    r2 = S.greedy_search(spark, target, seeds, restarts=2, iters=15, seed=3, top_n=5).collect()
    assert [(r["text"], r["score"]) for r in r1] == [(r["text"], r["score"]) for r in r2]
    assert len(r1) >= 1


def test_greedy_batched_replays_and_beats_seed(spark, target_and_seeds):
    # batch_size>1 embeds all speculative candidates in one call per
    # iteration; still deterministic and still a hill climb.
    target, seeds = target_and_seeds
    kw = dict(restarts=2, iters=15, seed=3, top_n=5, batch_size=4)
    r1 = S.greedy_search(spark, target, seeds, **kw).collect()
    r2 = S.greedy_search(spark, target, seeds, **kw).collect()
    assert [(r["text"], r["score"]) for r in r1] == [(r["text"], r["score"]) for r in r2]
    # the climb never ends below its best seed's starting score
    import numpy as np

    from cyborgdb_encrypted_vector_search_spark.functions import vector as V

    ut = np.array(V.normalize_py(list(target)))
    seed_best = max(float(np.array(E.embed_text(s)) @ ut) for s in seeds[:2])
    assert max(r["score"] for r in r1) >= seed_best


def test_invert_embedding_modes(spark, target_and_seeds):
    target, seeds = target_and_seeds
    small = {"pop_size": 8, "generations": 2}
    gsmall = {"restarts": 2, "iters": 8}
    both = S.invert_embedding(
        spark, target, seeds, mode="both", seed=5, top_n=5,
        evo_kwargs=small, greedy_kwargs=gsmall,
    ).collect()
    evo = S.invert_embedding(
        spark, target, seeds, mode="evo", seed=5, top_n=5, evo_kwargs=small
    ).collect()
    assert len(both) >= 1 and len(evo) >= 1
    with pytest.raises(ValueError):
        S.invert_embedding(spark, target, seeds, mode="bogus")


def test_operator_validations(spark):
    from cyborgdb_encrypted_vector_search_spark.operators import ann, dedup, knn

    df = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="k must be"):
        knn.topk_against_target(df, [1.0, 0.0], k=0)
    q = spark.createDataFrame([(1, [1.0, 0.0])], "query_id long, query_vec array<double>")
    with pytest.raises(ValueError, match="k must be"):
        knn.knn_join(q, df, k=-1)
    with pytest.raises(ValueError, match="metric"):
        knn.knn_join(q, df, k=1, metric="manhattan")
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divisible"):
        dedup.lsh_candidate_pairs(docs, num_hashes=8, num_bands=3)
    with pytest.raises(ValueError, match="n_planes"):
        ann.hyperplanes(64, 63)


def test_merge_keeps_max_per_text(spark):
    evo = spark.createDataFrame([("a", 0.5), ("b", 0.9)], "text string, score double")
    gr = spark.createDataFrame([("a", 0.7), ("c", 0.1)], "text string, score double")
    merged = {r["text"]: r["score"] for r in S.merge_results(evo, gr).collect()}
    assert merged == {"a": 0.7, "b": 0.9, "c": 0.1}
