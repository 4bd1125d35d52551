"""Dump `.explain("formatted")` for named catalog queries to files.

Usage:
    python tools/explain_dump.py <outdir> <suffix> q1,q2,...

Writes <outdir>/<query>_<suffix>.txt for each named query — the plan
evidence the optimization rounds commit (plans/r12/...). The plan is
captured at $SPARK_GRAFT_SF_DIR (default sf0.1) on the same session
factory the bench uses, so PushedFilters / join strategies / exchange
counts match the bench run. NOTE: iterative operators (peeling loops,
CC rounds) execute eagerly while the query function builds; the dumped
plan is the FINAL assembled plan — per-round internals are documented
in OPTIMIZATION_r12.md instead.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from cyborgdb_encrypted_vector_search_spark.caching import release_all
    from cyborgdb_encrypted_vector_search_spark.plans.catalog import entries
    from cyborgdb_encrypted_vector_search_spark.session import get_spark

    spark = get_spark(
        app_name="explain-dump",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    cat = entries()
    for name in names:
        df = cat[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        release_all()
        print(f"[ok] {name} -> {name}_{suffix}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
