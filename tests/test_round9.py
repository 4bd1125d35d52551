"""Round-9 regression tests: ADVICE fixes (string-id min-label
convergence probe, star-contraction converged flag) plus the new
operators added this round (tests appended as they land)."""

from __future__ import annotations

import logging

import pytest
from pyspark.sql import functions as F

from cyborgdb_encrypted_vector_search_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)


def _labels(df):
    return {r["node"]: r["component"] for r in df.collect()}


class TestStringIdComponents:
    def test_min_label_string_ids_full_propagation(self, spark):
        """The r8 decimal-sum probe cast string ids to NULL in non-ANSI
        mode, declaring convergence after one round; a 4-hop chain of
        string doc ids needs 3+ propagation rounds — every node must
        still reach the lexicographic minimum."""
        pairs = spark.createDataFrame(
            [
                ("doc_a", "doc_b"),
                ("doc_b", "doc_c"),
                ("doc_c", "doc_d"),
                ("doc_d", "doc_e"),
                ("doc_x", "doc_y"),
            ],
            "doc_a string, doc_b string",
        )
        got = _labels(connected_components(pairs))
        assert got == {
            "doc_a": "doc_a",
            "doc_b": "doc_a",
            "doc_c": "doc_a",
            "doc_d": "doc_a",
            "doc_e": "doc_a",
            "doc_x": "doc_x",
            "doc_y": "doc_x",
        }

    def test_min_label_string_ids_matches_star(self, spark):
        pairs = spark.createDataFrame(
            [("u%02d" % i, "u%02d" % (i + 1)) for i in range(0, 8)]
            + [("v1", "v2"), ("v2", "v0")],
            "doc_a string, doc_b string",
        )
        ml = _labels(connected_components(pairs))
        st = _labels(connected_components_star(pairs))
        assert ml == st


class TestStarConvergedWarning:
    def test_no_spurious_warning_on_exact_round_convergence(
        self, spark, caplog
    ):
        """connected_components_star used to warn 'not converged' when
        the fixed point landed exactly on round == max_iter even though
        the anti-join probe proved convergence."""
        pairs = spark.createDataFrame(
            [(2, 1), (3, 1), (4, 1)], "doc_a long, doc_b long"
        )
        # a star converges in 1 round; max_iter=1 hits rounds == max_iter
        with caplog.at_level(
            logging.WARNING,
            logger="cyborgdb_encrypted_vector_search_spark.operators.dedup",
        ):
            got = _labels(connected_components_star(pairs, max_iter=1))
        assert got == {1: 1, 2: 1, 3: 1, 4: 1}
        assert not [
            r for r in caplog.records if "not converged" in r.message
        ]

    def test_genuine_nonconvergence_still_warns(self, spark, caplog):
        # a 16-node path cannot converge in a single contraction round
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 16)], "doc_a long, doc_b long"
        )
        with caplog.at_level(
            logging.WARNING,
            logger="cyborgdb_encrypted_vector_search_spark.operators.dedup",
        ):
            connected_components_star(pairs, max_iter=1).collect()
        assert [
            r for r in caplog.records if "not converged" in r.message
        ]


class TestTrussOracleConvergenceGuard:
    """The trussness oracle's per-level round constants are now proven
    inside the SQL: the level CTE yields zero rows unless the last two
    unrolled rounds are count-identical (monotone peeling => identical
    sets). Under-unrolling must therefore fail LOUDLY (empty level),
    never silently diverge."""

    # triangle strip 1..8: edges (i,i+1) support 2 inside, (i,i+2)
    # support 1 -- at k=4 (thr=2) the strip unravels over several
    # cascading rounds before emptying.
    STRIP = ", ".join(
        f"({i}, {i + 1})" for i in range(1, 8)
    ) + ", " + ", ".join(f"({i}, {i + 2})" for i in range(1, 7))

    def _run(self, rounds: int):
        import duckdb

        from cyborgdb_encrypted_vector_search_spark.plans import catalog as C

        old = dict(C._TRUSS_HIST_ROUNDS)
        C._TRUSS_HIST_ROUNDS[4] = rounds
        try:
            sql_blocks, final = C._truss_level_sql("edges", 4)
        finally:
            C._TRUSS_HIST_ROUNDS.clear()
            C._TRUSS_HIST_ROUNDS.update(old)
        q = (
            f"WITH edges(src, dst) AS (VALUES {self.STRIP}),\n"
            + sql_blocks
            + f"\nSELECT count(*) FROM {final}"
        )
        return duckdb.connect().execute(q).fetchone()[0]

    def test_under_unroll_empties_the_level(self):
        # the strip needs >2 rounds to reach its (empty) fixed point;
        # 2 unrolled rounds are not yet converged -> guard yields 0 by
        # CONSTRUCTION of the guard, and the pre-guard rounds disagree
        assert self._run(rounds=2) == 0

    def test_sufficient_unroll_passes_through(self):
        # plenty of rounds: fixed point (empty set here) is reached and
        # the guard passes it through -- 0 edges is the CORRECT answer,
        # so distinguish via a level that survives: use a clique
        import duckdb

        from cyborgdb_encrypted_vector_search_spark.plans import catalog as C

        old = dict(C._TRUSS_HIST_ROUNDS)
        C._TRUSS_HIST_ROUNDS[4] = 3
        try:
            sql_blocks, final = C._truss_level_sql("edges", 4)
        finally:
            C._TRUSS_HIST_ROUNDS.clear()
            C._TRUSS_HIST_ROUNDS.update(old)
        # K5 clique: every edge has support 3 >= thr=2 -> 4-truss is the
        # whole clique, converged in round 1; guard must pass all 10
        clique = ", ".join(
            f"({a}, {b})" for a in range(1, 6) for b in range(a + 1, 6)
        )
        q = (
            f"WITH edges(src, dst) AS (VALUES {clique}),\n"
            + sql_blocks
            + f"\nSELECT count(*) FROM {final}"
        )
        assert duckdb.connect().execute(q).fetchone()[0] == 10


class TestWeightedLinkScores:
    def test_matches_bruteforce_on_random_graph(self, spark):
        import itertools
        import random

        rng = random.Random(97)
        n = 24
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(n), rng.randrange(n)) for _ in range(70)
                )
                if a != b
            }
        )
        from cyborgdb_encrypted_vector_search_spark.operators.graph import (
            LINKPRED_SCALE,
            weighted_link_scores,
        )

        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        expected = {}
        for u, v in itertools.combinations(sorted(adj), 2):
            if v in adj[u]:
                continue
            common = adj[u] & adj[v]
            if not common:
                continue
            cn = len(common)
            ra = sum(LINKPRED_SCALE // len(adj[w]) for w in common)
            aa = sum(
                LINKPRED_SCALE // (len(adj[w]).bit_length())
                for w in common
            )
            expected[(u, v)] = (cn, ra, aa)
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            (r["u"], r["v"]): (r["cn"], r["ra_fp"], r["aa_fp"])
            for r in weighted_link_scores(df, min_common=1).collect()
        }
        assert got == expected

    def test_hub_cap_drops_apex_wedges(self, spark, caplog):
        from cyborgdb_encrypted_vector_search_spark.operators.graph import (
            weighted_link_scores,
        )

        # star: hub 0 with 6 spokes; every spoke pair's only common
        # neighbor is the hub -> capping at degree 5 kills all pairs
        edges = [(0, i) for i in range(1, 7)]
        df = spark.createDataFrame(edges, "src long, dst long")
        with caplog.at_level(
            logging.WARNING,
            logger="cyborgdb_encrypted_vector_search_spark.operators.graph",
        ):
            rows = weighted_link_scores(
                df, min_common=1, max_apex_degree=5
            ).collect()
        assert rows == []
        assert any("dropped 1 apex" in r.message for r in caplog.records)


class TestSkewFixtureOrientedRoute:
    """The skew gates exist to put driver CORRECTNESS rows on the
    oriented kernel's AUTO route — so the route itself is pinned here:
    the cost probe must pick 'oriented' on the gate fixture at the
    gated scale factor."""

    def test_skew_fixture_routes_oriented(self, spark):
        from cyborgdb_encrypted_vector_search_spark.operators.graph import (
            _support_stats,
        )
        from cyborgdb_encrypted_vector_search_spark.plans.catalog import (
            _skew_edges,
        )

        edges = _skew_edges(spark, "/root/testdata/sf0.01")
        stats = _support_stats(edges)
        assert stats["kernel"] == "oriented"
        assert stats["int_ids"] is True

    def test_copurchase_graph_routes_fulladj(self, spark):
        # the contrast that makes the probe a real decision: the
        # near-regular co-purchase gate graph stays on fulladj
        from cyborgdb_encrypted_vector_search_spark.operators.graph import (
            _support_stats,
        )
        from cyborgdb_encrypted_vector_search_spark.plans.catalog import (
            _graph_edges,
        )

        edges = _graph_edges(spark, "/root/testdata/sf0.01")
        assert _support_stats(edges)["kernel"] == "fulladj"

    def test_skew_ktruss_fixed_point_is_k32(self, spark):
        # the surviving 5-truss of the fixture is the K32 completion
        # (hub + orderkeys 1..31, all pairs): 32 nodes, 496 edges —
        # structurally non-trivial, pinned independent of the oracle
        from cyborgdb_encrypted_vector_search_spark.operators.graph import (
            ktruss_edges,
        )
        from cyborgdb_encrypted_vector_search_spark.plans.catalog import (
            _skew_edges,
        )

        kept = ktruss_edges(
            _skew_edges(spark, "/root/testdata/sf0.01"), k=5, rounds=4
        )
        rows = kept.collect()
        nodes = {r["src"] for r in rows} | {r["dst"] for r in rows}
        assert len(rows) == 32 * 31 // 2
        assert nodes == set(range(32))
