"""Measured plan-cost inventory for the headline queries.

For every bench.py HEADLINE query this prints one JSON line with the
physical-plan facts that determine cluster-scale cost:

- shuffles          count of Exchange hashpartitioning/rangepartitioning
                    (each is a full network redistribution at scale)
- broadcasts        BroadcastExchange count (small side shipped to every
                    executor instead of shuffling the big side)
- bhj / smj         BroadcastHashJoin vs SortMergeJoin occurrences
- topk              TakeOrderedAndProject present (global top-k without a
                    full sort)
- codegen_spans     WholeStageCodegen regions (wider = more of the plan
                    fused into JVM loops)
- pushed_filters    a parquet scan carries PushedFilters: [non-empty]
- python_stages     ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas
                    stages (the deliberate Python islands)

Numbers are read from the pre-execution plan with AQE DISABLED for the
analysis session only: AdaptiveSparkPlan's toString hides codegen-span
annotations until runtime, and AQE at runtime only ever removes cost
(coalesces partitions, demotes SMJ to BHJ) — so these counts are the
worst case of what production (AQE on) executes. docs/COSTS.md
interprets them against the per-query candidate-set formulas.
Usage: python tools/plan_costs.py [sf_dir]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def analyze(plan: str) -> dict:
    return {
        "shuffles": len(
            re.findall(r"Exchange (?:hash|range)partitioning", plan)
        ),
        "broadcasts": plan.count("BroadcastExchange"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "topk": "TakeOrderedAndProject" in plan,
        # executedPlan toString marks codegen'd operators "*(n) Op";
        # distinct n = fused JVM-loop regions
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed_filters": bool(
            re.search(r"PushedFilters: \[[^\]]", plan)
        ),
        "python_stages": sum(
            plan.count(s)
            for s in ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas")
        ),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from bench import HEADLINE
    from cyborgdb_encrypted_vector_search_spark.plans.catalog import entries
    from cyborgdb_encrypted_vector_search_spark.plans.explain import physical_plan
    from cyborgdb_encrypted_vector_search_spark.session import get_spark

    spark = get_spark(
        app_name="cyborgdb-plan-costs", master="local[8]", shuffle_partitions=8
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    cat = entries()
    for name in HEADLINE:
        df = cat[name].fn(spark, sf_dir)
        facts = {"query": name, **analyze(physical_plan(df))}
        print(json.dumps(facts))
    spark.stop()


if __name__ == "__main__":
    main()
