"""Round-13 optimization pins.

- The truss peeler's decrement-delta broadcast is now gated on the
  computable bound 3 * Σ support(dropped) (VERDICT r12 "what's wrong"
  #1): a forced-over-bound round must route the decrement attach
  through the shuffled join and still restore the exact support
  invariant.
- The wedge link predictors' packed (u << 32 | v) group key: exact
  equality to the two-column key on graphs that allow it, and the
  probe must refuse it for ids outside [0, 2^31).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cyborgdb_encrypted_vector_search_spark.operators import dedup as D
from cyborgdb_encrypted_vector_search_spark.operators import graph as G


def _py_support(es):
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return {(a, b): len(adj[a] & adj[b]) for (a, b) in es}


def _py_tris(es):
    """Each triangle once as its three canonical (a<b) sides."""
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = []
    for a, b in es:
        for c in sorted(adj[a] & adj[b]):
            if c > b:
                out.append((a, b, a, c, b, c))
    return out


def _k7_plus_spokes():
    """K7 (21 edges, support 5 each) plus vertex 8 joined to 1..5
    (5 edges, support 4 each). peel(thr=5) drops exactly the 5 spoke
    edges: n_drop=5, sup_drop=20 -> the delta bound 3*20=60 exceeds a
    cap of 10 while n_keep=21 > n_drop (no shell collapse) and
    n_removed + n_drop = 5 <= 10 (no compaction) — the round is
    decremental with a SHUFFLED delta join."""
    k7 = [(a, b) for a in range(1, 8) for b in range(a + 1, 8)]
    spokes = [(i, 8) for i in range(1, 6)]
    return k7 + spokes


def _peel_once(spark, edges, thr):
    df = spark.createDataFrame(edges, "src long, dst long").localCheckpoint()
    tris = spark.createDataFrame(
        _py_tris(edges), "a1 long, b1 long, a2 long, b2 long, a3 long, b3 long"
    ).localCheckpoint()
    peeler = G._TrussPeeler(df, tris)
    peeler.peel(thr)
    return peeler


def _py_peel_once(edges, thr):
    sup = _py_support(edges)
    keep = {e for e in edges if sup[e] >= thr}
    return _py_support(sorted(keep)) if keep else {}


def test_peeler_over_bound_delta_routes_shuffled_and_matches(
    spark, monkeypatch
):
    edges = _k7_plus_spokes()
    monkeypatch.setattr(G, "_REMOVED_BROADCAST_CAP", 10)
    peeler = _peel_once(spark, edges, thr=5)
    # the round took the DECREMENTAL branch (not compaction/collapse):
    assert peeler.removed is not None and peeler.n_removed == 5
    got = {(r["src"], r["dst"]): r["support"] for r in peeler.sup.collect()}
    assert got == _py_peel_once(edges, 5)


def test_peeler_in_bound_delta_same_result(spark):
    edges = _k7_plus_spokes()
    peeler = _peel_once(spark, edges, thr=5)  # default cap: broadcast
    assert peeler.removed is not None and peeler.n_removed == 5
    got = {(r["src"], r["dst"]): r["support"] for r in peeler.sup.collect()}
    assert got == _py_peel_once(edges, 5)


def test_packed_key_refused_for_oversized_and_negative_ids(spark):
    assert G._ids_pack(0, 2**31 - 1)
    assert not G._ids_pack(-1, 10)
    assert not G._ids_pack(0, 2**31)
    assert not G._ids_pack("a", "z")
    # negative ids: the two-column fallback still yields exact counts
    edges = [(-5, 1), (-5, 2), (1, 7), (2, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["u"], r["v"]): r["cn"]
        for r in G.common_neighbor_candidates(df, min_common=1).collect()
    }
    assert got == {(1, 2): 2, (-5, 7): 2}
    from cyborgdb_encrypted_vector_search_spark.caching import release_all

    release_all()


def test_driver_closure_matches_star_contraction(spark):
    """_driver_closure_rows labels identically to
    connected_components_star (component = min reachable id) on random
    graphs including duplicates."""
    for seed in (3, 11):
        rnd = random.Random(seed)
        pairs = [
            (rnd.randrange(30), rnd.randrange(30)) for _ in range(60)
        ]
        pairs = [(a, b) for a, b in pairs if a != b] + pairs[:5]
        df = spark.createDataFrame(
            [p for p in pairs if p[0] != p[1]], "a long, b long"
        )
        want = {
            (r["node"], r["component"])
            for r in D.connected_components_star(df, "a", "b").collect()
        }
        got = set(
            D._driver_closure_rows([p for p in pairs if p[0] != p[1]])
        )
        assert got == want
        from cyborgdb_encrypted_vector_search_spark.caching import (
            release_all,
        )

        release_all()


def _er_fixture(spark):
    """A miniature variant corpus in the gate's shape."""
    rows = []
    for k in range(1, 25):
        rows.append((k, f"name{k:03d} SEG", f"P{k * 7919}", k % 3))
        rows.append((k + 100, f"name{k:03d} seg", f"P{k * 7919}", k % 3))
        if k % 4 == 0:
            rows.append(
                (k + 200, f"name{k:03d} SEGX", f"Q{k * 7919}", k % 3)
            )
    return spark.createDataFrame(
        rows, "id long, name string, phone string, nation long"
    )


def _er_passes():
    return [
        (["phone"], lambda a, b: F.lit(True)),
        (
            [F.col("nation"), F.substring("name", 1, 7)],
            lambda a, b: F.levenshtein(a["name"], b["name"]) <= 2,
        ),
    ]


def test_resolve_entities_over_cap_routes_distributed(spark, monkeypatch):
    """Forcing the driver-closure cap to 0 must route BOTH entity-
    resolution paths through the scale-safe shuffle joins + the
    distributed star-contraction closure, with identical labels."""
    recs = _er_fixture(spark)
    base = {
        (r["id"], r["entity"])
        for r in D.resolve_entities(recs, "id", _er_passes()).collect()
    }
    from cyborgdb_encrypted_vector_search_spark.caching import release_all

    release_all()
    monkeypatch.setattr(D, "_ER_DRIVER_CLOSURE_CAP", 0)
    forced = {
        (r["id"], r["entity"])
        for r in D.resolve_entities(recs, "id", _er_passes()).collect()
    }
    assert forced == base
    release_all()


def test_resolve_incremental_over_cap_matches_rebuild(spark, monkeypatch):
    recs = _er_fixture(spark)
    want = {
        (r["id"], r["entity"])
        for r in D.resolve_entities(recs, "id", _er_passes()).collect()
    }
    from cyborgdb_encrypted_vector_search_spark.caching import release_all

    release_all()

    def absorb():
        old = recs.filter(F.col("id") % 2 != 0)
        new = recs.filter(F.col("id") % 2 == 0)
        ol = D.resolve_entities(old, "id", _er_passes()).localCheckpoint()
        merged = D.resolve_entities_incremental(
            old, ol, new, "id", _er_passes()
        )
        return {(r["id"], r["entity"]) for r in merged.collect()}

    assert absorb() == want  # small path (driver closure + broadcasts)
    release_all()
    monkeypatch.setattr(D, "_ER_DRIVER_CLOSURE_CAP", 0)
    assert absorb() == want  # over-cap: shuffle joins + distributed CC
    release_all()


def test_packed_key_boundary_ids_roundtrip(spark):
    """Ids at the extremes of the packable range survive the
    shift/mask roundtrip: the largest packable id 2^31 - 1 and 0."""
    m = 2**31 - 1
    edges = [(0, 1), (0, m), (1, 2), (2, m)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["u"], r["v"]): r["cn"]
        for r in G.common_neighbor_candidates(df, min_common=1).collect()
    }
    assert got == {(1, m): 2, (0, 2): 2}
    scores = {
        (r["u"], r["v"]): (r["cn"], r["ra_fp"], r["aa_fp"])
        for r in G.weighted_link_scores(df, min_common=1).collect()
    }
    S = G.LINKPRED_SCALE
    # apexes 0 and 2 (degree 2 each) witness (1, m); apexes 1 and m
    # witness (0, 2)
    term = (S // 2, S // 2)
    assert scores == {
        (1, m): (2, 2 * term[0], 2 * term[1]),
        (0, 2): (2, 2 * term[0], 2 * term[1]),
    }
    from cyborgdb_encrypted_vector_search_spark.caching import release_all

    release_all()
