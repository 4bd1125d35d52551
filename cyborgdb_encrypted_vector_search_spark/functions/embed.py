"""Text embedding interface + deterministic stub embedder.

The reference's central UDF is SentenceTransformer all-MiniLM-L6-v2
(``model.encode(texts).tolist()``, reference src/embeddings.py:3-6, with
a pluggable user override hook at src/app.py:30-50). Heavy model
libraries aren't available here, so the engine ships the same *shape*
with a deterministic stand-in (FIXTURES.md: "deterministic stub
embedder"):

- a **bag-of-token hash embedding**: each token hashes (md5) to a seed
  for a unit Gaussian direction; a text embeds as the L2-normalized sum
  of its token vectors. Deterministic across processes, cheap, and —
  critically for the search harness — texts sharing tokens land near
  each other, so hill-climbing has real signal (unlike a raw text hash,
  which would have no locality).
- exposed both as a plain Python function (driver/pandas-side use, the
  grouped sequential loops of greedy search) and as a ``pandas_udf``
  (Arrow-batched, model-state cached per executor — mirroring the
  reference's batched encode call, src/app.py:133).

A real model plugs in by swapping ``embed_texts``; every consumer
(search harness, collections ingest) goes through this interface.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import numpy as np
import pandas as pd

DEFAULT_DIM = 64

# Executor-local token-vector cache: the "model" that loads once per
# executor (reference loads SentenceTransformer once at import,
# src/embeddings.py:3).
_TOKEN_CACHE: dict[tuple[str, int], np.ndarray] = {}

# Executor-process-local model registry for make_embed_udf factories,
# keyed by the factory's serialized bytes. Module globals survive task
# re-deserialization inside a reused Python worker (closure state does
# NOT — each task gets a fresh copy of the closure), so this is what
# makes a heavy model genuinely load ONCE per worker process, the
# reference's load-at-import semantics (src/embeddings.py:3).
_MODEL_REGISTRY: dict[str, object] = {}


def _token_vector(token: str, dim: int) -> np.ndarray:
    key = (token, dim)
    v = _TOKEN_CACHE.get(key)
    if v is None:
        seed = int.from_bytes(
            hashlib.md5(token.encode("utf-8")).digest()[:4], "big"
        )
        v = np.random.RandomState(seed).randn(dim)
        _TOKEN_CACHE[key] = v
    return v


def embed_text(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Deterministic 1-text embedding (the greedy loop's single-item
    call, reference src/app.py:192)."""
    tokens = text.lower().split()
    if not tokens:
        return [0.0] * dim
    acc = np.zeros(dim)
    for t in tokens:
        acc += _token_vector(t, dim)
    n = float(np.linalg.norm(acc))
    if n == 0.0:
        return [0.0] * dim
    return [float(x) for x in acc / n]


def embed_texts(texts: Iterable[str], dim: int = DEFAULT_DIM) -> list[list[float]]:
    """Batch embedding (the evolutionary loop's per-generation batched
    call, reference src/app.py:133)."""
    return [embed_text(t, dim) for t in texts]


def make_embed_udf(
    dim: int = DEFAULT_DIM,
    model_factory=None,
    batch_size: int | None = None,
):
    """Arrow-batched pandas_udf: text column -> array<double> embedding.

    This is SURVEY.md D1: the one place the engine crosses into Python
    on purpose, batched per Arrow block, model state cached per
    executor process.

    ``model_factory`` is the real-model seam (reference
    src/embeddings.py:3-6 loads SentenceTransformer at import; here the
    load is explicit and worker-side): a zero-arg callable returning an
    object with ``encode(list[str]) -> sequence of vectors`` — the
    SentenceTransformer surface. It is invoked lazily on the FIRST
    Arrow batch each executor process sees and cached in a
    process-level registry for the worker's lifetime (surviving task
    re-deserialization, so N tasks on one worker still load once);
    only the factory closure is serialized to workers, never model
    weights or the (possibly unpicklable) model object. Swap in the
    reference's model:

        udf = make_embed_udf(
            384,
            model_factory=lambda: SentenceTransformer(
                "sentence-transformers/all-MiniLM-L6-v2"
            ),
        )

    ``batch_size`` caps rows per ``encode`` call inside an Arrow batch
    (GPU/host-memory bound for big models); None encodes each Arrow
    batch whole.
    """
    from pyspark.sql.functions import pandas_udf

    if model_factory is None:

        @pandas_udf("array<double>")
        def embed(col: pd.Series) -> pd.Series:
            return pd.Series(embed_texts(col.fillna("").tolist(), dim))

        return embed

    # Registry key = hash of the factory's serialized form: identical
    # factories share one loaded model per worker; distinct factories
    # (different dim/model) never collide.
    from pyspark import cloudpickle as _cp

    registry_key = hashlib.md5(_cp.dumps(model_factory)).hexdigest()

    @pandas_udf("array<double>")
    def embed_model(col: pd.Series) -> pd.Series:
        # Resolve the WORKER's module singleton at call time: cloudpickle
        # snapshots referenced globals by value into each task's closure,
        # so touching _MODEL_REGISTRY directly here would give every task
        # its own dict and reload the model per task, not per process.
        from cyborgdb_encrypted_vector_search_spark.functions import (
            embed as _worker_mod,
        )

        registry = _worker_mod._MODEL_REGISTRY
        model = registry.get(registry_key)
        if model is None:
            model = registry[registry_key] = model_factory()
        texts = col.fillna("").tolist()
        out: list[list[float]] = []
        step = batch_size if batch_size and batch_size > 0 else max(len(texts), 1)
        for i in range(0, len(texts), step):
            for v in model.encode(texts[i : i + step]):
                out.append([float(x) for x in v])
        return pd.Series(out)

    return embed_model
