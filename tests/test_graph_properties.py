"""Property differentials for the iterative graph operators: the
distributed DataFrame formulations must agree with independent
pure-Python reference implementations on randomized small graphs —
the same algorithmic-differential discipline the oracle gates apply,
but over many graph shapes instead of one dataset."""

from __future__ import annotations

import itertools

from hypothesis import given, settings, strategies as st

from cyborgdb_encrypted_vector_search_spark import caching
from cyborgdb_encrypted_vector_search_spark.operators import graph as G

# Random graphs over <= 9 vertices: each possible edge independently
# present. Dense enough for triangles, small enough for brute force.
edge_sets = st.sets(
    st.tuples(st.integers(1, 9), st.integers(1, 9)).map(
        lambda p: (min(p), max(p))
    ).filter(lambda p: p[0] < p[1]),
    min_size=3,
    max_size=18,
)


def _py_support(edges: set[tuple[int, int]]) -> dict[tuple[int, int], int]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return {
        (a, b): len(adj[a] & adj[b])
        for a, b in edges
    }


def _py_ktruss(edges: set[tuple[int, int]], k: int) -> set[tuple[int, int]]:
    cur = set(edges)
    while True:
        sup = _py_support(cur)
        nxt = {e for e in cur if sup[e] >= k - 2}
        if nxt == cur:
            return cur
        cur = nxt


def _py_scan(edges: set[tuple[int, int]], eps_num: int, eps_den: int, mu: int):
    """Reference SCAN: returns {v: (cluster, is_core)} for members."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    sup = _py_support(edges)
    # sup covers every edge (cn=0 included), so zero-support edges can
    # still qualify as strong on tiny graphs — same as the operator
    strong = {
        (a, b)
        for (a, b), cn in sup.items()
        if (cn + 2) ** 2 * eps_den**2
        >= eps_num**2 * (len(adj[a]) + 1) * (len(adj[b]) + 1)
    }
    sdeg: dict[int, int] = {}
    for a, b in strong:
        sdeg[a] = sdeg.get(a, 0) + 1
        sdeg[b] = sdeg.get(b, 0) + 1
    cores = {v for v, d in sdeg.items() if d + 1 >= mu}
    # components over core-core strong edges, min-label
    label = {v: v for v in cores}
    changed = True
    while changed:
        changed = False
        for a, b in strong:
            if a in cores and b in cores:
                m = min(label[a], label[b])
                if label[a] != m or label[b] != m:
                    label[a] = label[b] = m
                    changed = True
    members = {v: (label[v], True) for v in cores}
    for a, b in itertools.chain(strong, ((y, x) for x, y in strong)):
        if a in cores and b not in cores:
            prev = members.get(b)
            c = label[a]
            members[b] = (min(prev[0], c) if prev else c, False)
    return members


@settings(max_examples=10, deadline=None)
@given(edge_sets, st.integers(min_value=3, max_value=5))
def test_ktruss_fixed_point_matches_python_peeling(spark, edges, k):
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {
        (r["src"], r["dst"]) for r in G.ktruss_edges(df, k=k).collect()
    }
    assert got == _py_ktruss(edges, k)
    caching.release_all()


def _py_trussness(edges: set[tuple[int, int]]) -> dict[tuple[int, int], int]:
    cur, out, k = set(edges), {}, 3
    while cur:
        surv = _py_ktruss(cur, k)
        for e in cur - surv:
            out[e] = k - 1
        cur = surv
        k += 1
    return out


@settings(max_examples=8, deadline=None)
@given(edge_sets)
def test_trussness_matches_python_level_peeling(spark, edges):
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {
        (r["src"], r["dst"]): r["trussness"]
        for r in G.edge_trussness(df).collect()
    }
    assert got == _py_trussness(edges)
    caching.release_all()


@settings(max_examples=8, deadline=None)
@given(edge_sets)
def test_scan_members_match_python_reference(spark, edges):
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {
        r["v"]: (r["cluster"], r["is_core"])
        for r in G.scan_clusters(df, 6, 10, mu=3).collect()
    }
    assert got == _py_scan(edges, 6, 10, 3)
    caching.release_all()


def _py_bfs(
    edges: set[tuple[int, int]], seeds: set[int], max_hops: int
) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for hop in range(1, max_hops + 1):
        nxt = set()
        for v in frontier:
            nxt |= adj.get(v, set())
        nxt -= dist.keys()
        if not nxt:
            break
        for v in nxt:
            dist[v] = hop
        frontier = nxt
    return dist


@settings(max_examples=10, deadline=None)
@given(
    edge_sets,
    st.sets(st.integers(1, 9), min_size=1, max_size=3),
    st.integers(min_value=0, max_value=4),
)
def test_bfs_levels_match_python_reference(spark, edges, seeds, max_hops):
    """r11: the distributed frontier expansion must agree with a plain
    Python BFS on randomized graphs, seed sets and hop bounds — min
    hop per vertex, unreachable vertices absent, seeds at hop 0 even
    when isolated."""
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in sorted(seeds)], "v long")
    got = {
        r["v"]: r["hops"]
        for r in G.bfs_levels(df, sdf, max_hops=max_hops).collect()
    }
    assert got == _py_bfs(edges, seeds, max_hops)
    caching.release_all()
