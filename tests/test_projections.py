"""Embedding-space transforms: Gram/PCA statistics, JL random
projection, MMR diversified selection (operators/projections.py)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from cyborgdb_encrypted_vector_search_spark.operators import projections as PJ
from cyborgdb_encrypted_vector_search_spark.plans.catalog import entries

SF = "/root/testdata/sf0.001"


def _toy(spark, n=7, dim=5, seed=11):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return x, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_gram_matches_numpy_and_is_partition_invariant(spark):
    x, df = _toy(spark)
    q = np.round(x.astype(np.float64) * PJ.Q_SCALE).astype(np.int64)
    want = q.T @ q
    for parts in (1, 3):
        got = {
            (r["i"], r["j"]): r["gram_q"]
            for r in PJ.gram_matrix(df.repartition(parts), dim=5).collect()
        }
        assert len(got) == 5 * 6 // 2
        for (i, j), v in got.items():
            assert i <= j
            assert v == want[i, j], (i, j)


def test_principal_axes_are_descending_and_sign_fixed(spark):
    x, df = _toy(spark, n=30)
    gram = PJ.gram_matrix(df, dim=5)
    vals, axes = PJ.principal_axes_from_gram(gram, dim=5, top=5)
    assert np.all(np.diff(vals) <= 1e-9)  # descending
    assert np.all(vals >= -1e-6)  # Gram is PSD
    for a in axes:
        assert np.isclose(np.linalg.norm(a), 1.0)
        nz = np.flatnonzero(np.abs(a) > 1e-12)
        assert a[nz[0]] > 0  # deterministic sign convention


def test_projection_matrix_is_md5_seeded_pm1():
    r = PJ.projection_matrix(4, 3)
    assert len(r) == 3 and all(len(row) == 4 for row in r)
    for k in range(3):
        for i in range(4):
            lead = hashlib.md5(f"{i}_{k}".encode()).hexdigest()[0]
            assert r[k][i] == (1 if lead in "01234567" else -1)


def test_random_project_matches_manual(spark):
    x, df = _toy(spark, n=6, dim=5)
    r = np.array(PJ.projection_matrix(5, 2))
    q = np.round(x.astype(np.float64) * PJ.Q_SCALE).astype(np.int64)
    want = q @ r.T
    got = (
        PJ.random_project(df, dim=5, out_dim=2)
        .orderBy("vec_id")
        .select("y_0", "y_1")
        .collect()
    )
    for i, row in enumerate(got):
        assert row["y_0"] == want[i, 0]
        assert row["y_1"] == want[i, 1]


def test_mmr_greedy_prefers_diverse_over_redundant():
    # c1 best rel; c2 slightly lower rel but near-duplicate of c1;
    # c3 lower rel, orthogonal. MMR must pick c1 then c3.
    cands = [(1, 100), (2, 95), (3, 60)]
    sims = {
        (1, 2): 90, (2, 1): 90,
        (1, 3): 0, (3, 1): 0,
        (2, 3): 0, (3, 2): 0,
    }
    sel = PJ.mmr_greedy(cands, sims, k=2)
    assert [(r[0], r[1]) for r in sel] == [(1, 1), (2, 3)]
    # rank-1 mmr is rel; rank-2 mmr is rel - max sim to selected
    assert sel[0][3] == 100 and sel[1][3] == 60


def test_mmr_greedy_tie_breaks_on_lower_id():
    cands = [(5, 10), (2, 10), (9, 10)]
    sims = {(a, b): 0 for a in (5, 2, 9) for b in (5, 2, 9) if a != b}
    sel = PJ.mmr_greedy(cands, sims, k=3)
    assert [r[1] for r in sel] == [2, 5, 9]


def test_mmr_catalog_entry_shape_and_determinism(spark):
    e = entries()["knn_mmr_rerank"]
    a = e.fn(spark, SF).collect()
    b = e.fn(spark, SF).collect()
    assert a == b
    assert [r["rank"] for r in a] == [1, 2, 3, 4, 5]
    assert len({r["cid"] for r in a}) == 5
    assert a[0]["mmr"] == a[0]["rel"]  # rank 1 pays no penalty
    # rank 1 is the relevance argmax of the shortlist, so no later
    # pick can beat its rel (sim penalties are signed, so mmr itself
    # may exceed rel when the nearest selected neighbor is negative)
    assert a[0]["rel"] == max(r["rel"] for r in a)


def test_quantize_vector_matches_python(spark):
    vals = [0.1, -0.25, 0.5 / PJ.Q_SCALE, -1.5e-5, 0.4999]
    df = spark.createDataFrame([([float(v) for v in vals],)], "v array<float>")
    got = df.select(PJ.quantize_vector("v").alias("q")).collect()[0]["q"]
    want = PJ.quantize_py(np.array(vals, dtype=np.float32))
    assert list(got) == want


def test_catalog_gram_entry_runs(spark):
    rows = entries()["embed_pca_gram"].fn(spark, SF).collect()
    assert len(rows) == 64 * 65 // 2
    diag = {r["i"]: r["gram_q"] for r in rows if r["i"] == r["j"]}
    assert all(v >= 0 for v in diag.values())  # squared sums


def test_catalog_random_projection_entry_runs(spark):
    rows = entries()["embed_random_projection"].fn(spark, SF).collect()
    assert sorted(r["k"] for r in rows) == list(range(8))
    n = {r["n_vecs"] for r in rows}
    assert len(n) == 1 and n.pop() > 0
    for r in rows:
        assert r["min_y"] <= r["max_y"]


# ------------------------------------------------------------ plan shapes


def test_gram_plan_is_mapinpandas_plus_one_exchange(spark, sf_dir):
    from cyborgdb_encrypted_vector_search_spark.plans import explain as X
    from cyborgdb_encrypted_vector_search_spark.sources.registry import load

    df = PJ.gram_matrix(load(spark, "embeddings", sf_dir), dim=64)
    plan = X.physical_plan(df)
    assert "MapInPandas" in plan
    # the only exchange is the dim²-sized partial-Gram merge; the
    # embedding rows themselves never shuffle, and nothing explodes
    assert plan.count("Exchange") == 1
    X.assert_not_in_plan(df, "Generate", "SortMergeJoin")


def test_random_projection_entry_plan_is_narrow(spark, sf_dir):
    from cyborgdb_encrypted_vector_search_spark.plans import explain as X

    df = entries()["embed_random_projection"].fn(spark, sf_dir)
    # pure JVM fold: no per-element explode of the embedding array, no
    # Python, and the single-row global agg is the only exchange (the
    # one Generate allowed is the 8-row stack unpivot ABOVE the agg)
    X.assert_not_in_plan(
        df, "explode", "MapInPandas", "BatchEvalPython", "ArrowEvalPython"
    )
    plan = X.physical_plan(df)
    assert plan.count("Exchange") <= 1
    assert "Generate stack" in plan


def test_mmr_shortlist_plans_as_takeordered_no_shuffle(spark, sf_dir):
    from pyspark.sql import functions as F

    from cyborgdb_encrypted_vector_search_spark.plans import explain as X
    from cyborgdb_encrypted_vector_search_spark.sources.registry import load

    emb = load(spark, "embeddings", sf_dir)
    target = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    qt = F.array(
        *[F.lit(v).cast("long") for v in PJ.quantize_py(target[0])]
    )
    shortlist = (
        emb.filter(F.col("vec_id") != 0)
        .withColumn("__qv", PJ.quantize_vector("embedding"))
        .withColumn("rel", PJ.quantized_dot("__qv", qt))
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(12)
    )
    X.assert_in_plan(shortlist, "TakeOrderedAndProject")
    X.assert_not_in_plan(shortlist, "Exchange", "SortMergeJoin")


def test_centered_pca_matches_numpy_covariance_eigs(spark):
    x, df = _toy(spark, n=40, dim=5)
    q = np.round(x.astype(np.float64) * PJ.Q_SCALE).astype(np.int64)
    gram = PJ.gram_matrix(df, dim=5)
    sums = q.sum(axis=0)
    vals, axes = PJ.principal_axes_from_gram(
        gram, dim=5, top=5, mean_sums=[int(s) for s in sums], count=40
    )
    centered = q - q.mean(axis=0)
    want = np.linalg.eigvalsh(centered.T @ centered)[::-1]
    assert np.allclose(vals, want, rtol=1e-9)
    # axes orthonormal
    assert np.allclose(axes @ axes.T, np.eye(5), atol=1e-9)
