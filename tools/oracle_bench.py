"""DuckDB-oracle timing twin of bench.py.

Times each HEADLINE query's oracle SQL on DuckDB (32 threads, warm,
min of 2 runs) over the same parquet tables bench.py uses, and prints
ONE JSON line mirroring bench.py's shape:

  {"metric": "oracle_total_headline_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, "engine": "duckdb"}

Queries without an oracle (non-SQL-expressible) and the serve-only
bench twins are skipped and listed under "skipped". Run after (or
independently of) bench.py; the pair makes the BASELINE 2x-bar
auditable from artifacts alone:

    python bench.py           > BENCH.json
    python tools/oracle_bench.py > ORACLE_BENCH.json
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb

from bench import HEADLINE
from cyborgdb_encrypted_vector_search_spark.plans.catalog import entries
from cyborgdb_encrypted_vector_search_spark.sources.registry import TABLES


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    con = duckdb.connect()
    con.execute(f"SET threads TO {int(cpus)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    cat = entries()
    # Oracles whose SQL formulation is structurally expensive (the
    # trussness oracle re-enumerates ~30M triangles per unrolled peel
    # round — 13 rounds of MATERIALIZED CTEs; the CC oracle unrolls 28
    # min-label rounds): timed ONCE instead of min-of-2 so the twin
    # run stays bounded. Caveat for readers: a single run can only
    # OVERSTATE DuckDB's time vs the warm-min-2 protocol, which
    # flatters Spark's ratio on exactly these rows — read them as
    # order-of-magnitude only. (Spark wins both by >4x either way;
    # warm-vs-cold does not change that verdict.)
    single_run = {"q_graph_trussness_hist", "dedup_components_star"}
    timings: dict[str, float] = {}
    skipped: list[str] = []
    for name in HEADLINE:
        sql = cat[name].sql if name in cat else None
        if not sql:
            skipped.append(name)
            continue
        best = float("inf")
        for _ in range(1 if name in single_run else 2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sys.stdout.write(
        json.dumps(
            {
                "metric": "oracle_total_headline_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "engine": "duckdb",
                "mode": (
                    "warm (min of 2 runs/query; rows listed in "
                    "single_run timed once, cold)"
                ),
                # rows NOT under the min-of-2 protocol (timed once,
                # cold — see the single_run comment above); the
                # artifact must self-describe the exception or a
                # reader auditing it alone is misled on exactly the
                # two rows that dominate the total
                "single_run": sorted(single_run & set(timings)),
                "skipped": skipped,
            }
        )
        + "\n"
    )


if __name__ == "__main__":
    main()
