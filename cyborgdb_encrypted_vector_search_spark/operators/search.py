"""Iterative inversion-search harness: evolutionary + greedy hill-climb.

Re-creates the reference's two search dataflows (SURVEY.md §2.9) —
the loops that, given a target embedding, evolve candidate strings
toward it by embed → score → rank → mutate:

- **I1 evolutionary** (reference src/app.py:100-171): population of 60,
  <=120 generations, 20% elitism, crossover p=0.12, early-stop at
  cosine > 0.995. Here each generation is one declarative batch:
  candidates DataFrame → Arrow-batched embed UDF → cosine column expr →
  TakeOrderedAndProject for elites; children are generated
  distributedly (explode over elites + seeded mutation UDF). The driver
  only collects one max-score scalar per generation for the early-stop
  check.
- **I2 greedy** (reference src/app.py:174-202): 12 restarts x 200
  sequential accept-if-better iterations with 1% random-jump teleports.
  The inner loop is inherently sequential, so it runs inside
  ``applyInPandas`` — one group per restart, restarts parallel across
  executors (the Spark-correct shape for "embarrassingly parallel
  sequential loops").
- **I4 merge** (reference src/app.py:246-255): union both strategies'
  outputs → keep max score per distinct text → global top-30.

Determinism: every mutation draws from ``random.Random(f"{seed}:...")``
keyed on (run seed, generation, slot, parent text), so runs replay
exactly — the discipline SURVEY.md §5.5 prescribes for the
reference's unseeded RNG.
"""

from __future__ import annotations

import random
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cyborgdb_encrypted_vector_search_spark.functions import embed as E
from cyborgdb_encrypted_vector_search_spark.functions import vector as V

# Reference workload constants (BASELINE.md):
# pop 60 / gens <=120 / elite 0.2 / early-stop 0.995 (src/app.py:102-104,145)
# char mutation p_ins 0.12, p_del 0.08, p_sub 0.18 (src/app.py:65)
# crossover p 0.12 (src/app.py:163); greedy 12x200, jump p 0.01
# (src/app.py:175-176,197); top-30 reporting (src/app.py:171,254).
# the reference's mutation alphabet verbatim (src/app.py:62):
# 62 alphanumerics + space + ,.-'"?! = 70 chars
ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 ,.-'\"?!"
)
WORD_SEEDS = [
    "the", "a", "I", "you", "it", "is", "are", "like", "love", "enjoy",
    "this", "example", "test", "model",
]  # the reference's WORD_SEEDS list verbatim (src/app.py:63)


def mutate_charwise(
    s: str,
    rng: random.Random,
    p_ins: float = 0.12,
    p_del: float = 0.08,
    p_sub: float = 0.18,
) -> str:
    """At-most-one-edit-of-each-kind char mutation (reference
    src/app.py:65-79 semantics, matched exactly): one coin flip per
    edit KIND — delete a random char w.p. p_del, then substitute a
    random position w.p. p_sub, then insert a random char at a random
    gap w.p. p_ins — in that order, each edit seeing the previous
    edit's result. An empty string can only gain an insert."""
    s_list = list(s)
    if s_list and rng.random() < p_del:
        del s_list[rng.randrange(len(s_list))]
    if s_list and rng.random() < p_sub:
        s_list[rng.randrange(len(s_list))] = rng.choice(ALPHABET)
    if rng.random() < p_ins:
        s_list.insert(rng.randrange(len(s_list) + 1), rng.choice(ALPHABET))
    return "".join(s_list)


def mutate_wordwise(s: str, rng: random.Random, max_words: int = 40) -> str:
    """Replace/insert/delete one word (reference src/app.py:81-97
    semantics, matched exactly): empty input -> random seed word;
    op<0.33 replace a random word with a seed word OR a copy of an
    existing word; op<0.66 insert a seed word at any of len+1 gaps
    (capped at 40 words); else delete a random word (never below 1)."""
    words = s.split()
    if not words:
        return rng.choice(WORD_SEEDS)
    op = rng.random()
    if op < 0.33:
        i = rng.randrange(len(words))
        words[i] = rng.choice(WORD_SEEDS + [rng.choice(words)])
    elif op < 0.66 and len(words) < max_words:
        i = rng.randrange(len(words) + 1)
        words.insert(i, rng.choice(WORD_SEEDS))
    elif len(words) > 1:
        i = rng.randrange(len(words))
        del words[i]
    return " ".join(words)


def crossover(a: str, b: str, rng: random.Random) -> str:
    """Prefix/suffix splice at a random split point (reference
    src/app.py:162-166)."""
    if not a or not b:
        return a or b
    sa = rng.randrange(1, len(a) + 1)
    sb = rng.randrange(0, len(b) + 1)
    return a[:sa] + b[sb:]


def _mutate_child(parent: str, mate: str, seed_key: str) -> str:
    rng = random.Random(seed_key)
    child = parent
    if mate and rng.random() < 0.12:
        child = crossover(child, mate, rng)
    if rng.random() < 0.5:
        child = mutate_charwise(child, rng)
    else:
        child = mutate_wordwise(child, rng)
    return child


def _score_col(unit_target: Sequence[float]) -> Column:
    """Cosine vs pre-normalized literal target: one fold per row (the
    embed UDF already L2-normalizes, so dot == cosine; zero vectors
    score -1.0, the reference sentinel)."""
    t = V.literal_vector(unit_target)
    zero = F.size(F.filter("embedding", lambda x: x != F.lit(0.0))) == 0
    return F.when(zero, F.lit(-1.0)).otherwise(V.dot("embedding", t))


def _generation_width(pop_size: int) -> int:
    """Partition width of one generation's embed/score batch: ~8 texts
    per partition, capped at 8 partitions — wide enough that the Arrow
    embed UDF runs as one parallel batch, narrow enough that a 60-row
    population doesn't pay 32 task launches per generation."""
    return max(1, min(8, pop_size // 8))


def _generation_scored(
    spark: SparkSession,
    pop: Sequence[str],
    embed_udf,
    unit_target: Sequence[float],
) -> DataFrame:
    """One generation's population scored against the target: embed
    (Arrow-batched UDF) + cosine fold + projection, planned as a single
    narrow stage over ``_generation_width`` partitions. Split out of
    the generation loop so the stage's plan shape is test-pinnable
    (VERDICT r10 task 6 — the generation-loop analogue of the greedy
    restart-parallelism pin). The width is planted with an explicit
    ``parallelize(rows, width)`` — exact and shuffle-free at any
    session parallelism (the old ``coalesce`` could only NARROW, so a
    low-defaultParallelism session silently ran generations at fewer
    partitions than the target width), and with no exchange there is
    nothing for AQE to coalesce onto one core."""
    pop_df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(t,) for t in pop], _generation_width(len(pop))
        ),
        "text string",
    )
    return (
        pop_df.withColumn("embedding", embed_udf("text"))
        .withColumn("score", _score_col(unit_target))
        .select("text", "score")
    )


def evolutionary_search(
    spark: SparkSession,
    target_emb: Sequence[float],
    seed_candidates: Sequence[str],
    pop_size: int = 60,
    generations: int = 120,
    elite_frac: float = 0.2,
    early_stop: float = 0.995,
    seed: int = 0,
    dim: int = E.DEFAULT_DIM,
    top_n: int = 30,
) -> DataFrame:
    """I1: returns (text, score) of the final top_n candidates."""
    unit_target = V.normalize_py(list(target_emb))
    embed_udf = E.make_embed_udf(dim)
    n_elite = max(1, int(pop_size * elite_frac))

    # init population: seeds + 1-4 stacked mutations (reference
    # src/app.py:117-128)
    rng = random.Random(f"{seed}:init")
    pop = list(seed_candidates)
    while len(pop) < pop_size:
        base = rng.choice(seed_candidates)
        for _ in range(rng.randint(1, 4)):
            base = _mutate_child(base, rng.choice(seed_candidates), f"{seed}:init:{rng.random()}")
        pop.append(base)
    pop = pop[:pop_size]

    best_rows: list[tuple[str, float]] = []
    mutate_udf = F.udf(_mutate_child, T.StringType())

    for gen in range(generations):
        scored = _generation_scored(spark, pop, embed_udf, unit_target)
        elites = scored.orderBy(F.desc("score"), F.asc("text")).limit(n_elite).collect()
        best_rows.extend((r["text"], r["score"]) for r in elites)
        if elites and elites[0]["score"] > early_stop:
            break
        if gen == generations - 1:
            break
        # regenerate: keep elites, fill with mutated/crossed children —
        # distributable shape: explode children slots over elite rows
        elite_texts = [r["text"] for r in elites]
        elites_df = spark.createDataFrame(
            [(t, elite_texts[(i + 1) % len(elite_texts)]) for i, t in enumerate(elite_texts)],
            "text string, mate string",
        )
        n_children = pop_size - len(elite_texts)
        per_parent = (n_children + len(elite_texts) - 1) // len(elite_texts)
        children = (
            elites_df.select(
                "text",
                "mate",
                F.explode(F.sequence(F.lit(1), F.lit(per_parent))).alias("slot"),
            )
            .withColumn(
                "child",
                mutate_udf(
                    "text",
                    "mate",
                    F.concat_ws(":", F.lit(seed), F.lit(gen), F.col("slot"), F.col("text")),
                ),
            )
            .select("child")
            .limit(n_children)
        )
        pop = elite_texts + [r["child"] for r in children.collect()]

    # I4-style dedup-max over everything seen, final top-n
    out = spark.createDataFrame(best_rows, "text string, score double")
    return (
        out.groupBy("text")
        .agg(F.max("score").alias("score"))
        .orderBy(F.desc("score"), F.asc("text"))
        .limit(top_n)
    )


GREEDY_SCHEMA = T.StructType(
    [
        T.StructField("restart", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def greedy_search(
    spark: SparkSession,
    target_emb: Sequence[float],
    seed_candidates: Sequence[str],
    restarts: int = 12,
    iters: int = 200,
    jump_p: float = 0.01,
    seed: int = 0,
    dim: int = E.DEFAULT_DIM,
    top_n: int = 30,
    batch_size: int = 1,
) -> DataFrame:
    """I2: restarts fan out as groups; each group runs its sequential
    accept-if-better climb inside applyInPandas (reference
    src/app.py:174-202 — single-candidate embed per iteration, 1%
    teleport probability).

    ``batch_size=1`` reproduces the reference exactly (one embed call
    per iteration — its stated anti-pattern, src/app.py:192).
    ``batch_size>1`` speculatively derives that many candidates from
    the current state per iteration, embeds them in ONE ``embed_texts``
    call (one model/matrix invocation), and accepts the best improving
    one — same hill-climb semantics, 1/batch_size the per-call
    overhead when a real encoder backs the embedder."""
    import numpy as np
    import pandas as pd

    unit_target = np.array(V.normalize_py(list(target_emb)))
    seeds_b = spark.sparkContext.broadcast(list(seed_candidates))

    def climb(pdf: pd.DataFrame) -> pd.DataFrame:
        r = int(pdf["restart"].iloc[0])
        rng = random.Random(f"{seed}:restart:{r}")
        seeds = seeds_b.value
        cur = seeds[r % len(seeds)]

        def score_of(text: str) -> float:
            v = np.array(E.embed_text(text, dim))
            if not v.any():
                return -1.0
            return float(np.dot(v, unit_target))

        cur_score = score_of(cur)
        if batch_size <= 1:
            for it in range(iters):
                if rng.random() < jump_p:  # teleport (src/app.py:197-199)
                    cand = rng.choice(seeds)
                else:
                    cand = _mutate_child(cur, rng.choice(seeds), f"{seed}:{r}:{it}:{cur}")
                cand_score = score_of(cand)
                if cand_score > cur_score:  # accept-if-better (src/app.py:194-195)
                    cur, cur_score = cand, cand_score
        else:
            for it in range(iters):
                cands = []
                for b in range(batch_size):
                    if rng.random() < jump_p:
                        cands.append(rng.choice(seeds))
                    else:
                        cands.append(
                            _mutate_child(
                                cur, rng.choice(seeds), f"{seed}:{r}:{it}:{b}:{cur}"
                            )
                        )
                mat = np.array(E.embed_texts(cands, dim))  # one batched call
                scores = mat @ unit_target
                scores[~mat.any(axis=1)] = -1.0
                j = int(np.argmax(scores))
                if scores[j] > cur_score:
                    cur, cur_score = cands[j], float(scores[j])
        return pd.DataFrame({"restart": [r], "text": [cur], "score": [cur_score]})

    restarts_df = spark.createDataFrame(
        [(r,) for r in range(restarts)], "restart int"
    ).repartition(restarts, "restart")
    results = restarts_df.groupBy("restart").applyInPandas(climb, GREEDY_SCHEMA)
    return (
        results.groupBy("text")
        .agg(F.max("score").alias("score"))
        .orderBy(F.desc("score"), F.asc("text"))
        .limit(top_n)
    )


def merge_results(evo: DataFrame, greedy: DataFrame, top_n: int = 30) -> DataFrame:
    """I4: union -> dedup-keep-max -> top-n (reference src/app.py:246-255)."""
    return (
        evo.unionByName(greedy)
        .groupBy("text")
        .agg(F.max("score").alias("score"))
        .orderBy(F.desc("score"), F.asc("text"))
        .limit(top_n)
    )


def invert_embedding(
    spark: SparkSession,
    target_emb: Sequence[float],
    seed_candidates: Sequence[str],
    mode: str = "both",
    seed: int = 0,
    top_n: int = 30,
    evo_kwargs: dict | None = None,
    greedy_kwargs: dict | None = None,
) -> DataFrame:
    """The reference's full inversion entry point (src/app.py:231-255):
    run evolutionary and/or greedy search against a target embedding and
    merge the result sets (``--mode evo|greedy|both``, default both).
    """
    if mode not in ("evo", "greedy", "both"):
        raise ValueError(f"mode must be evo|greedy|both, got {mode!r}")
    parts = []
    if mode in ("evo", "both"):
        parts.append(
            evolutionary_search(
                spark, target_emb, seed_candidates, seed=seed, top_n=top_n,
                **(evo_kwargs or {}),
            )
        )
    if mode in ("greedy", "both"):
        parts.append(
            greedy_search(
                spark, target_emb, seed_candidates, seed=seed, top_n=top_n,
                **(greedy_kwargs or {}),
            )
        )
    if len(parts) == 1:
        return parts[0]
    return merge_results(parts[0], parts[1], top_n)
