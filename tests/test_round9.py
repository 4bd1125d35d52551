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
