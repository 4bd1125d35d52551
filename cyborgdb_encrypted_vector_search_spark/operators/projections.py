"""Embedding-space transforms: exact Gram/PCA statistics, seeded
Johnson-Lindenstrauss random projection, and MMR (maximal marginal
relevance) diversified selection.

These are the dimensionality-reduction and diversification stages of a
large-scale embedding pipeline, built to the same two-sided-oracle
discipline as the rest of the engine (nothing here exists in the
reference — it stops at brute-force cosine over chromadb,
src/chromadb_store.py — but a 100 TB corpus needs cheaper geometry
before it needs exact cosine).

Determinism contract — fixed-point quantization with an ODD scale
------------------------------------------------------------------
Every operator quantizes float32 embeddings to int64 fixed point with
``Q_SCALE = 4099`` (odd) before any arithmetic. A float32 value times
an odd integer can never land exactly on a .5 rounding tie: the tie
would require the value to equal (2z+1)/(2*4099), a rational with an
odd factor in the denominator, which no binary float represents. So
round-half-up (Spark, DuckDB) and round-half-even (numpy) agree on
every input, and everything downstream is order-independent int64
arithmetic — bit-exact across engines, partitionings, and batch sizes.
float32→float64 widening and the ×4099 product are both exact in
doubles (24-bit mantissa + 13 bits < 53), so the pre-rounding value is
itself exact.

Overflow headroom: |q| ≤ ~2.5e3 for unit-scale embeddings, so a Gram
entry per row is ≤ ~6e6 and int64 holds the sum past 1e12 rows; the
catalog gates cast the final sums to BIGINT on both engines so the
compare layer never sees engine-specific wide types (the
q_table_fingerprint lesson).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Q_SCALE = 4099  # odd ⇒ no representable .5 ties ⇒ rounding-mode-proof


def quantize_vector(col: Column | str) -> Column:
    """array<float> → array<bigint> fixed-point at Q_SCALE (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c, lambda v: F.round(v.cast("double") * F.lit(Q_SCALE)).cast("long")
    )


def quantize_py(vec: Sequence[float]) -> list[int]:
    """The same quantization in Python (for bounded driver-side work).

    np.round is half-even vs the engines' half-up, but the odd scale
    makes ties unrepresentable, so all three agree (module docstring).
    """
    q = np.round(np.asarray(vec, dtype=np.float64) * Q_SCALE)
    return [int(v) for v in q]


def quantized_dot(a: Column | str, b: Column) -> Column:
    """Exact int64 inner product of two quantized array<bigint> columns."""
    ac = F.col(a) if isinstance(a, str) else a
    return F.aggregate(
        F.zip_with(ac, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


# ------------------------------------------------------------------ Gram


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Distributed X^T X over quantized embeddings: the single-pass
    sufficient statistic behind PCA / whitening / linear probes.

    Shape: mapInPandas emits one dim*(dim+1)/2-row upper-triangular
    partial Gram per Arrow batch (a dense int64 matmul — the classic
    tall-skinny distributed PCA layout), then ONE tiny hash aggregate
    over (i, j) merges the partials. The shuffle is O(batches × dim²)
    — independent of row count — so the plan is scan-bound at any
    corpus size; no per-row explode, no d²-factor join.

    Returns (i, j, gram_q) for i ≤ j, gram_q = Σ q_i·q_j exactly.
    """
    iu, ju = np.triu_indices(dim)

    def per_batch(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.round(x * Q_SCALE).astype(np.int64)
            g = q.T @ q
            yield pd.DataFrame(
                {"i": iu, "j": ju, "partial": g[iu, ju]}
            )

    partials = df.select(vec_col).mapInPandas(
        per_batch, schema="i int, j int, partial long"
    )
    return partials.groupBy("i", "j").agg(
        F.sum("partial").alias("gram_q")
    )


def principal_axes_from_gram(
    gram_df: DataFrame,
    dim: int = 64,
    top: int = 8,
    mean_sums: Sequence[int] | None = None,
    count: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side eigendecomposition of the (bounded, dim²-sized)
    Gram matrix: the cheap final step of distributed PCA. Returns
    (eigenvalues desc, axes [top × dim]) with a deterministic sign
    convention (first nonzero component positive).

    Uncentered by default (eigen of X^T X). Pass the per-dim quantized
    sums and the row count to get CENTERED PCA: eigen of the scatter
    matrix X^T X − n·μμ^T, the standard covariance-eigenvector form —
    both statistics come from the same single distributed pass."""
    g = np.zeros((dim, dim), dtype=np.float64)
    for r in gram_df.collect():  # bounded: dim*(dim+1)/2 rows
        g[r["i"], r["j"]] = r["gram_q"]
        g[r["j"], r["i"]] = r["gram_q"]
    if mean_sums is not None:
        if not count:
            raise ValueError("centered PCA needs the row count")
        mu = np.asarray(mean_sums, dtype=np.float64) / count
        g = g - count * np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(g)
    order = np.argsort(vals)[::-1][:top]
    axes = vecs[:, order].T
    for a in axes:
        nz = np.flatnonzero(np.abs(a) > 1e-12)
        if len(nz) and a[nz[0]] < 0:
            a *= -1.0
    return vals[order], axes


# ------------------------------------------- JL random projection (±1)


def projection_matrix(dim: int, out_dim: int) -> list[list[int]]:
    """Seeded Achlioptas ±1 projection matrix: entry (k, i) is +1 iff
    the first hex digit of md5("{i}_{k}") is 0–7. md5 is the one hash
    both engines (and Python) share bit-for-bit, so the oracle can
    regenerate the identical matrix in pure SQL."""
    return [
        [
            1
            if hashlib.md5(f"{i}_{k}".encode()).hexdigest()[0] in "01234567"
            else -1
            for i in range(dim)
        ]
        for k in range(out_dim)
    ]


def random_project(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    out_dim: int = 8,
    out_prefix: str = "y_",
) -> DataFrame:
    """Johnson-Lindenstrauss sketch: project each embedding onto
    out_dim seeded ±1 axes. Pure narrow projection — zip_with +
    aggregate fold per component, zero shuffles, zero UDFs — so it
    composes with any downstream filter/agg at full scan speed.
    y_k = Σ_i q_i · r_ki exactly (int64)."""
    r = projection_matrix(dim, out_dim)
    qv = quantize_vector(vec_col)
    cols = {
        f"{out_prefix}{k}": quantized_dot(
            qv, F.array([F.lit(v).cast("long") for v in r[k]])
        )
        for k in range(out_dim)
    }
    return df.withColumns(cols)


# --------------------------------------------------- MMR diversification


def mmr_greedy(
    candidates: Sequence[tuple[int, int]],
    sims: dict[tuple[int, int], int],
    k: int,
) -> list[tuple[int, int, int, int]]:
    """Greedy maximal-marginal-relevance selection over a BOUNDED
    candidate shortlist (exact integer arithmetic end to end).

    λ = 0.5, scaled by 2 so scores stay integral:
    step 1 picks argmax rel; step n>1 picks argmax
    (rel(c) − max_{s∈selected} sim(c, s)). Ties → lower id first.

    Returns [(rank, cid, rel, mmr), ...] with rank 1-based and
    mmr(rank 1) ≡ rel.
    """
    selected: list[tuple[int, int, int]] = []
    remaining = dict(candidates)
    while remaining and len(selected) < k:
        best_key = None
        best = None
        for cid in sorted(remaining):
            rel = remaining[cid]
            if selected:
                pen = max(sims[(cid, s[0])] for s in selected)
                mmr = rel - pen
            else:
                mmr = rel
            key = (-mmr, cid)
            if best_key is None or key < best_key:
                best_key = key
                best = (cid, rel, mmr)
        assert best is not None
        selected.append(best)
        del remaining[best[0]]
    return [
        (rank, cid, rel, mmr)
        for rank, (cid, rel, mmr) in enumerate(selected, start=1)
    ]
