"""Round-6 second-wave operators: edit-distance join, CMS heavy
hitters, small-file compaction."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from cyborgdb_encrypted_vector_search_spark.operators import dedup
from cyborgdb_encrypted_vector_search_spark.plans.explain import physical_plan


@pytest.fixture(scope="module")
def cat():
    from cyborgdb_encrypted_vector_search_spark.plans.catalog import entries

    return entries()


# ---------------------------------------------------------------- editdist


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_editdist_pairs_finds_exactly_the_close_pairs(spark):
    base = "the quick brown fox jumps over the lazy dog " * 3  # 135 chars
    rows = [
        (1, base),
        (2, base + "xy"),            # distance 2 (two inserts)
        (3, base[:-1] + "Q"),        # distance 1 (one substitute)
        (4, base[10:] + base[:10]),  # rotation: far from base
        (5, "z" * 100),              # unrelated
    ]
    got = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in dedup.editdist_pairs(
            _corpus(spark, rows), max_dist=2, window=25
        ).collect()
    }
    assert (1, 2, 2) in got
    assert (1, 3, 1) in got
    # docs 2 and 3 differ by 3 edits (xy suffix vs Q substitute) — out
    assert not any(a == 2 and b == 3 for a, b, _ in got)
    assert not any(4 in (a, b) or 5 in (a, b) for a, b, _ in got)


def test_editdist_pairs_survives_repetitive_text(spark):
    # a doc of one repeated char has ONE distinct window — a count
    # filter over distinct shared strings would drop this true pair;
    # the positional count bound must keep it
    rows = [(1, "z" * 100), (2, "z" * 100 + "qq")]
    got = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in dedup.editdist_pairs(
            _corpus(spark, rows), max_dist=2, window=25
        ).collect()
    }
    assert got == {(1, 2, 2)}


def test_editdist_pairs_excludes_below_length_floor(spark):
    # length < (d+1)*w + d = 77: ineligible even though identical
    rows = [(1, "short text " * 5), (2, "short text " * 5)]
    assert len(rows[0][1]) < 77
    assert (
        dedup.editdist_pairs(_corpus(spark, rows), max_dist=2, window=25)
        .collect()
        == []
    )


def test_editdist_plan_has_no_cartesian(spark, cat, sf_dir):
    plan = physical_plan(cat["dedup_editdist_pairs"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------- CMS heavy hitters


def test_cms_estimates_never_underestimate(spark, cat, sf_dir):
    rows = cat["q_heavy_hitters_cms"].fn(spark, sf_dir).collect()
    assert rows, "top-20 must be non-empty"
    for r in rows:
        assert r["cms_estimate"] >= r["exact_n"]
        assert r["overest"] is True


def test_cms_cells_are_mergeable_partial_sums(spark):
    # the sketch built from a split corpus, cell-summed, must equal the
    # sketch of the whole — additivity is what makes it a 100 TB sketch
    from cyborgdb_encrypted_vector_search_spark.plans import catalog as C

    ev = spark.createDataFrame(
        [(i, i % 7) for i in range(200)], "event_id long, user_id long"
    )

    def cells_of(df):
        keyed = df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("exact_n")
        ).select(
            "user_id",
            "exact_n",
            F.explode(
                F.array(*[F.lit(i) for i in range(C._CMS_DEPTH)])
            ).alias("j"),
        ).withColumn(
            "bucket",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("j").cast("string"),
                                F.lit(":"),
                                F.col("user_id").cast("string"),
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("bigint"),
                F.lit(C._CMS_WIDTH),
            ),
        )
        return {
            (r["j"], r["bucket"]): r["c"]
            for r in keyed.groupBy("j", "bucket")
            .agg(F.sum("exact_n").cast("bigint").alias("c"))
            .collect()
        }

    whole = cells_of(ev)
    a = cells_of(ev.filter(F.col("event_id") < 97))
    b = cells_of(ev.filter(F.col("event_id") >= 97))
    merged: dict = {}
    for part in (a, b):
        for k, v in part.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == whole


# ------------------------------------------------------------- compaction


def test_compaction_reduces_files_and_is_shuffle_free(spark, cat, sf_dir):
    # run the gate once so both layouts exist
    cat["q_compact_small_files"].fn(spark, sf_dir).collect()
    import hashlib
    import tempfile

    from cyborgdb_encrypted_vector_search_spark.plans.catalog import (
        _content_tag,
    )

    ctag = _content_tag(spark, sf_dir, "events", "event_id")
    tag = hashlib.md5(f"{sf_dir}:compact_v1:{ctag}".encode()).hexdigest()[:10]
    frag = os.path.join(tempfile.gettempdir(), f"events_frag_{tag}")
    comp = os.path.join(tempfile.gettempdir(), f"events_compact_{tag}")

    def files_per_dir(root):
        out = {}
        for d in glob.glob(os.path.join(root, "event_date=*")):
            out[os.path.basename(d)] = len(
                glob.glob(os.path.join(d, "*.parquet"))
            )
        return out

    f_frag, f_comp = files_per_dir(frag), files_per_dir(comp)
    assert sorted(f_frag) == sorted(f_comp)  # same partition dirs
    assert max(f_frag.values()) > 4  # the pathology is real
    assert max(f_comp.values()) <= 4  # and compaction fixed it
    assert sum(f_comp.values()) < sum(f_frag.values())
    # the compaction READ+coalesce plan is narrow — no Exchange
    plan = physical_plan(spark.read.parquet(frag).coalesce(4))
    assert "Exchange" not in plan
    assert "Coalesce" in plan


# ------------------------------------------------------------------ graph


def test_triangle_count_on_known_graph(spark):
    from cyborgdb_encrypted_vector_search_spark.operators import graph as G

    # K4 plus a pendant vertex: C(4,3)=4 triangles, 7 edges
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "src long, dst long",
    )
    row = G.triangle_count(edges).head()
    assert (row["n_edges"], row["n_triangles"]) == (7, 4)


def test_pagerank_fixedpoint_mass_and_order(spark):
    from cyborgdb_encrypted_vector_search_spark.operators import graph as G

    # star graph: center 1 linked to 2..5 — center must outrank leaves,
    # leaves tie exactly (identical integer arithmetic)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5)], "src long, dst long"
    )
    r = {
        row["v"]: row["rank_fp"]
        for row in G.pagerank_fixedpoint(edges, iterations=3).collect()
    }
    assert len(r) == 5
    leaves = {r[v] for v in (2, 3, 4, 5)}
    assert len(leaves) == 1  # exact tie, not approximately equal
    assert r[1] > r[2]
    # total fixed-point mass stays within floor-division slack of 1.0
    assert abs(sum(r.values()) - G.RANK_SCALE) < 100 * len(r)


def test_graph_gates_single_scan_shapes(spark, cat, sf_dir):
    # triangle plan: no CartesianProduct (wedge join is keyed)
    plan = physical_plan(cat["q_graph_triangles"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_cms_fact_scanned_once_via_cached_aggregate(spark, cat, sf_dir):
    # the sketch is derived from the persisted per-user aggregate, so
    # the plan reuses the cached frame instead of re-scanning the fact
    plan = physical_plan(cat["q_heavy_hitters_cms"].fn(spark, sf_dir))
    assert "InMemoryTableScan" in plan


def test_triangle_count_empty_and_triangle_free(spark):
    from cyborgdb_encrypted_vector_search_spark.operators import graph as G

    empty = spark.createDataFrame([], "src long, dst long")
    row = G.triangle_count(empty).head()
    assert (row["n_edges"], row["n_triangles"]) == (0, 0)
    # path graph 1-2-3-4: 3 edges, no triangle
    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    row = G.triangle_count(path).head()
    assert (row["n_edges"], row["n_triangles"]) == (3, 0)


def test_gapfill_grid_is_dense_and_forward_filled(spark, cat, sf_dir):
    import pandas as pd

    pdf = cat["q_events_gapfill_hourly"].fn(spark, sf_dir).toPandas()
    # dense: every (type, hour) cell present exactly once
    per_type = pdf.groupby("event_type")["hour"].nunique()
    assert per_type.nunique() == 1  # same grid for every type
    assert len(pdf) == per_type.iloc[0] * pdf["event_type"].nunique()
    # gap rows exist (count 0) and their ff_avg is carried forward,
    # i.e. non-null whenever any earlier hour of that type had data
    gaps = pdf[pdf["n_events"] == 0]
    assert len(gaps) > 0
    pdf = pdf.sort_values(["event_type", "hour"])
    seen = set()
    for r in pdf.itertuples():
        if r.event_type in seen and r.n_events == 0:
            assert not pd.isna(r.ff_avg)
        if r.n_events > 0:
            seen.add(r.event_type)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_editdist_pairs_matches_bruteforce_property(spark):
    # deterministic pseudo-random corpus with planted near-dups; the
    # blocked operator must reproduce the exact brute-force pair set
    import hashlib
    import random

    rng = random.Random(42)
    words = ["alpha", "bravo", "casa", "delta", "echo", "furl", "gamma"]
    docs = {}
    for i in range(14):
        base = " ".join(rng.choice(words) for _ in range(22))  # ~110 chars
        docs[i] = base
    # planted variants: delete 1 char, swap-sub 2 chars, append 2
    docs[100] = docs[0][:-1]
    docs[101] = "Q" + docs[1][1:-1] + "Q"
    docs[102] = docs[2] + "xy"
    docs[103] = docs[3][:50] + docs[4][50:]  # chimera: far from both
    corpus = _corpus(spark, list(docs.items()))
    got = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in dedup.editdist_pairs(corpus, max_dist=2, window=25).collect()
    }
    eligible = {k: v for k, v in docs.items() if len(v) >= 77}
    want = set()
    for a in sorted(eligible):
        for b in sorted(eligible):
            if a < b:
                d = _lev(eligible[a], eligible[b])
                if d <= 2:
                    want.add((a, b, d))
    assert got == want


def test_pagerank_fixedpoint_tracks_float_reference(spark):
    from cyborgdb_encrypted_vector_search_spark.operators import graph as G

    # small deterministic graph; fixed-point ranks must match a float
    # power-iteration reference to ~1e-9 relative (fixed-point floor
    # loss only)
    import random

    rng = random.Random(7)
    edges = sorted({tuple(sorted(rng.sample(range(12), 2))) for _ in range(30)})
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["v"]: r["rank_fp"] / G.RANK_SCALE
        for r in G.pagerank_fixedpoint(edf, iterations=3).collect()
    }
    # float reference
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        adj.setdefault(d, []).append(s)
    n = len(adj)
    r = {v: 1.0 / n for v in adj}
    for _ in range(3):
        nxt = {v: 0.15 / n for v in adj}
        for u, nbrs in adj.items():
            share = r[u] / len(nbrs)
            for v in nbrs:
                nxt[v] += 0.85 * share
        r = nxt
    assert set(got) == set(r)
    for v in r:
        assert abs(got[v] - r[v]) < 1e-6


def test_triangle_count_matches_bruteforce_property(spark):
    from itertools import combinations
    import random

    from cyborgdb_encrypted_vector_search_spark.operators import graph as G

    rng = random.Random(11)
    for trial in range(3):
        nodes = list(range(13))
        edges = sorted(
            {tuple(sorted(rng.sample(nodes, 2))) for _ in range(28 + trial * 7)}
        )
        eset = set(edges)
        want = sum(
            1
            for a, b, c in combinations(nodes, 3)
            if (a, b) in eset and (a, c) in eset and (b, c) in eset
        )
        edf = spark.createDataFrame(edges, "src long, dst long")
        row = G.triangle_count(edf).head()
        assert (row["n_edges"], row["n_triangles"]) == (len(edges), want)


# --------------------------------------------------------------- EMA fold


def test_ema_fixedpoint_matches_hand_fold_and_input_order(spark):
    from cyborgdb_encrypted_vector_search_spark.operators import (
        timeseries as T,
    )

    rows = [(1, i, (i * 37) % 11, 10_000 * (i + 1)) for i in range(9)]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, x long"
    )
    want = None
    for _, _, _, x in sorted(rows, key=lambda r: (r[1], r[2])):
        want = x if want is None else (85 * want + 15 * x) // 100
    got = T.ema_fixedpoint(df, "user_id", ["ts", "event_id"], "x").head()
    assert (got["user_id"], got["n_events"], got["ema_fp"]) == (1, 9, want)
    # partition-order independence: shuffled input, same exact integers
    got2 = T.ema_fixedpoint(
        df.orderBy(F.desc("event_id")).repartition(5),
        "user_id",
        ["ts", "event_id"],
        "x",
    ).head()
    assert got2["ema_fp"] == want


def test_edge_support_on_known_graph(spark):
    from cyborgdb_encrypted_vector_search_spark.operators import graph as G

    # K4 + pendant: every K4 edge sits in exactly 2 triangles; the
    # pendant edge (4,5) in none (absent from the output)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "src long, dst long",
    )
    got = {
        (r["src"], r["dst"]): r["support"]
        for r in G.edge_triangle_support(edges).collect()
    }
    assert got == {
        (1, 2): 2, (1, 3): 2, (1, 4): 2,
        (2, 3): 2, (2, 4): 2, (3, 4): 2,
    }
