"""Oriented-route scale curve: the hub-dominated skew fixture at
1x / 4x / 16x replicas (replica-disjoint — one hub per id-offset
block), timing the three skew gates' curve twins and printing the
AUTO cost probe's routing decision at every scale, so the O(m^1.5)
claim behind the oriented kernel is measured, not argued (r9 verdict
task 1). Reuses scale_curve.py's materialized blowup dirs (same
_BASE.json staleness guard).

Usage: python tools/skew_curve.py [base_sf_dir] [scales]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

_spec = importlib.util.spec_from_file_location(
    "scale_curve", Path(__file__).resolve().parent / "scale_curve.py"
)
_sc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_sc)


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scales = [
        int(s)
        for s in (sys.argv[2] if len(sys.argv) > 2 else "1,4,16").split(",")
    ]
    tmp = os.environ.get("TMPDIR", "/tmp")

    from cyborgdb_encrypted_vector_search_spark.caching import release_all
    from cyborgdb_encrypted_vector_search_spark.operators import graph as G
    from cyborgdb_encrypted_vector_search_spark.plans import catalog as C
    from cyborgdb_encrypted_vector_search_spark.session import get_spark

    spark = get_spark(
        app_name="cyborgdb-skew-curve",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    twins = {
        "graph_skew_triangles_curve": C.graph_skew_triangles_curve,
        "graph_skew_support_curve": C.graph_skew_support_curve,
        "graph_skew_ktruss_curve": C.graph_skew_ktruss_curve,
        # r11: the full SCAN chain (strong edges -> cores -> star-
        # contraction CC -> borders), the q_graph_skew_scan weak's
        # missing growth measurement
        "graph_skew_scan_curve": C.graph_skew_scan_curve,
    }

    for scale in scales:
        sf_dir = (
            base if scale == 1 else os.path.join(tmp, f"scale_curve_{scale}x")
        )
        if scale != 1:
            _sc.materialize(spark, base, scale, sf_dir)
        # the routing decision IS part of the evidence: the fixture
        # must stay on the oriented kernel at every measured scale
        edges = C._skew_curve_edges(spark, sf_dir).persist()
        stats = G._support_stats(edges)
        n_edges = edges.count()
        edges.unpersist()
        print(
            json.dumps(
                {
                    "scale": scale,
                    "n_edges": n_edges,
                    "route": stats["kernel"],
                }
            )
        )
        for name, fn in twins.items():
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
                release_all()
            print(
                json.dumps(
                    {"scale": scale, "query": name, "sec": round(best, 3)}
                )
            )
    spark.stop()


if __name__ == "__main__":
    main()
