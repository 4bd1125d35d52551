"""Pins the vector-expression semantics, incl. the reference's exact
-1.0 zero-norm sentinel (reference src/app.py:52-59)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cyborgdb_encrypted_vector_search_spark.functions import vector as V


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        (1, [0.0, 0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]),  # zero-norm left
        (2, [1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0]),  # zero-norm right
        (3, [1.0, 0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]),  # identical
        (4, [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]),  # orthogonal
        (5, [1.0, 2.0, 3.0, 4.0], [4.0, 3.0, 2.0, 1.0]),  # generic
        (6, [1.0, 0.0, 0.0, 0.0], [-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    return spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    )


def collect_map(df, col):
    return {r["id"]: r[col] for r in df.collect()}


def test_cosine_zero_norm_sentinel(vec_df):
    got = collect_map(
        vec_df.withColumn("c", V.cosine("a", "b")), "c"
    )
    assert got[1] == -1.0  # sentinel, not NaN/null — src/app.py:57-58
    assert got[2] == -1.0
    assert got[3] == pytest.approx(1.0)
    assert got[4] == pytest.approx(0.0)
    assert got[5] == pytest.approx(20.0 / 30.0)
    assert got[6] == pytest.approx(-1.0)


def test_dot_and_norm(vec_df):
    got = collect_map(vec_df.withColumn("d", V.dot("a", "b")), "d")
    assert got[5] == pytest.approx(4 + 6 + 6 + 4)
    got_n = collect_map(vec_df.withColumn("n", V.norm("a")), "n")
    assert got_n[5] == pytest.approx(math.sqrt(30.0))
    assert got_n[1] == 0.0


def test_l2_distance(vec_df):
    got = collect_map(vec_df.withColumn("d", V.l2_distance("a", "b")), "d")
    assert got[3] == 0.0
    assert got[4] == pytest.approx(math.sqrt(2.0))


def test_l2_normalize(vec_df):
    got = collect_map(vec_df.withColumn("u", V.l2_normalize("a")), "u")
    assert got[5] == pytest.approx([x / math.sqrt(30.0) for x in [1, 2, 3, 4]])
    assert got[1] == [0.0, 0.0, 0.0, 0.0]  # zero vector passes through


def test_dim_check(vec_df):
    n_ok = vec_df.filter(V.dim_check("a", 4)).count()
    assert n_ok == 6
    assert vec_df.filter(V.dim_check("a", 64)).count() == 0


def test_literal_vector_scoring(vec_df):
    df = vec_df.withColumn("s", V.cosine("b", V.literal_vector([1.0, 0.0, 0.0, 0.0])))
    got = collect_map(df, "s")
    assert got[3] == pytest.approx(1.0)
    assert got[6] == pytest.approx(-1.0)
    assert got[2] == -1.0  # zero-norm operand → sentinel


def test_cosine_range_and_symmetry(vec_df):
    sym = vec_df.select(
        (F.abs(V.cosine("a", "b") - V.cosine("b", "a")) < 1e-12).alias("ok")
    ).collect()
    assert all(r["ok"] for r in sym)
