"""Chat-model seam for the kNN->LLM reconstruction funnel (SURVEY D2).

The reference's reconstruction stage (src/cod.py:144-175) builds a
candidate prompt and would send it to an OpenRouter-backed chat model
(``ChatHuggingFace(model_name=..., openrouter_api_key=...)`` with the
actual ``chat([...])`` call commented out, src/cod.py:161-162). This
module makes that stage a real, testable dataflow:

- ``ChatModel`` is the minimal interface a real client must satisfy —
  ``invoke(prompt) -> str`` (LangChain chat models expose exactly
  this), so a genuine OpenRouter/OpenAI client drops in unchanged.
- ``StubChatModel`` is a deterministic in-process "LLM" that follows
  the prompt's own instruction ("If the original is present in a
  snippet, reproduce it", src/cod.py:149): it parses the candidate
  sections back out of the prompt and returns the top-ranked
  candidate verbatim. Deterministic => the funnel's END RESULT is
  oracle-checkable in SQL while the plumbing (prompt build -> model
  call -> answer compare) is the real thing.
- ``make_chat_udf`` is the distributed execution seam: an
  Arrow-batched pandas_udf whose model is constructed once per worker
  PROCESS via the same process-level registry pattern as the embedding
  seam (functions/embed.py) — only the zero-arg factory is pickled,
  never the (typically unpicklable) client object.

Prompt format: ``build_reconstruction_prompt`` mirrors the reference's
prompt verbatim in structure (header, ``--- Candidate i ---`` sections,
closing instruction — src/cod.py:147-159) as a pure Spark expression,
so prompt construction stays JVM-side; only the model call crosses into
Python.
"""

from __future__ import annotations

import hashlib
import re
from typing import Protocol

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

PROMPT_HEADER = (
    "You are given a set of candidate text snippets returned by vector "
    "similarity for a single original document.\n"
    "Use the snippets to reconstruct the original document as faithfully "
    "as possible. If the original is present in a snippet, reproduce "
    "it.\n\nCandidates:\n"
)
PROMPT_FOOTER = (
    "\n\nNow produce the reconstructed text (only the reconstructed "
    "text, no commentary).\nIf you are uncertain about missing parts, "
    "try to produce the most plausible reconstruction."
)
_CANDIDATE_RE = re.compile(
    r"\n--- Candidate (\d+) ---\n(.*?)(?=\n--- Candidate \d+ ---\n|\n\nNow produce)",
    re.DOTALL,
)

# One client per worker process, keyed by factory bytes (see
# functions/embed.py:46 for the rationale).
_CHAT_REGISTRY: dict[str, object] = {}


class ChatModel(Protocol):
    def invoke(self, prompt: str) -> str: ...


class StubChatModel:
    """Deterministic stand-in for the OpenRouter chat model: return the
    top-ranked candidate snippet verbatim (the prompt instructs exactly
    that when the original is among the candidates, which is the demo's
    premise — the target's own neighborhood contains near-verbatim
    text). Parsing the prompt (rather than taking the candidates as a
    side channel) proves the prompt string itself carries everything
    the model needs."""

    def invoke(self, prompt: str) -> str:
        # No .strip(): the regex capture already excludes the section
        # delimiters, so the candidate text comes back byte-exact — a
        # document with leading/trailing whitespace must round-trip
        # verbatim or the oracle's exact-recovery comparison diverges.
        cands = sorted(
            (int(i), txt) for i, txt in _CANDIDATE_RE.findall(prompt)
        )
        return cands[0][1] if cands else ""


def build_reconstruction_prompt(candidates: Column) -> Column:
    """JVM-side prompt assembly from an ARRAY<STRUCT<rnk,text>> column
    (rank-ordered candidate snippets): the reference's prompt format,
    one row per target, no UDF. ``candidates`` must already be sorted
    by rank (array_sort on the struct gives that for free)."""
    body = F.aggregate(
        candidates,
        F.lit(""),
        lambda acc, s: F.concat(
            acc,
            F.lit("\n--- Candidate "),
            s["rnk"].cast("string"),
            F.lit(" ---\n"),
            s["text"],
        ),
    )
    return F.concat(F.lit(PROMPT_HEADER), body, F.lit(PROMPT_FOOTER))


def make_chat_udf(model_factory=None):
    """Arrow-batched pandas_udf: prompt column -> reconstruction column.

    ``model_factory`` is a zero-arg callable returning a ``ChatModel``;
    defaults to ``StubChatModel``. The instance is created on the first
    Arrow batch each worker process sees and cached in the module-level
    registry for the process lifetime — swap in a real client with

        udf = make_chat_udf(lambda: ChatOpenAI(model="...", ...))

    and nothing else in the funnel changes.
    """
    from pyspark import cloudpickle as _cp
    from pyspark.sql.functions import pandas_udf

    factory = model_factory or StubChatModel
    registry_key = hashlib.md5(_cp.dumps(factory)).hexdigest()

    @pandas_udf("string")
    def chat(col: pd.Series) -> pd.Series:
        # Resolve the worker's module singleton at call time (see
        # functions/embed.py:137-143: cloudpickle copies referenced
        # globals by value, so the direct name would be per-task).
        from cyborgdb_encrypted_vector_search_spark.functions import (
            llm as _worker_mod,
        )

        registry = _worker_mod._CHAT_REGISTRY
        model = registry.get(registry_key)
        if model is None:
            model = registry[registry_key] = factory()
        return col.fillna("").map(lambda p: model.invoke(p))

    return chat
