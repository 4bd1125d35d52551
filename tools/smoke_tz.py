"""Prove registry.load's events.ts normalization is session-tz independent.

The normalization branches exist precisely for FOREIGN sessions (the
round driver's plain getOrCreate), which may run on a non-UTC driver.
This script builds a session pinned to America/New_York and checks all
three ts shapes the registry can see:

1. NANOS parquet (the real testdata events table) -> Spark reads
   TIMESTAMP_NTZ; epoch micros must match DuckDB (tz-independent).
2. LTZ micros parquet (a foreign writer's shape) -> the LTZ branch
   must rebuild the exact instant, not shift it by the session tz.
3. BIGINT nanos (a nanosAsLong-built session's shape) -> integer math.

Usage: python tools/smoke_tz.py [sf_dir]
Exit 0 = all exact; 1 = any mismatch (printed as JSON).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

EPOCH_DIFF = (
    "CAST(timestampdiff(MICROSECOND,"
    " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS BIGINT)"
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import duckdb
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cyborgdb_encrypted_vector_search_spark.sources import registry

    errors: dict[str, str] = {}

    # 1) Real NANOS-parquet events table vs DuckDB (tz-independent).
    ev = registry.load(spark, "events", sf_dir)
    got = ev.selectExpr(
        f"min({EPOCH_DIFF}) AS mn",
        f"max({EPOCH_DIFF}) AS mx",
        "count(*) AS n",
    ).collect()[0]
    want = duckdb.sql(
        "SELECT CAST(min(epoch_ns(ts) // 1000) AS BIGINT),"
        " CAST(max(epoch_ns(ts) // 1000) AS BIGINT), count(*)"
        f" FROM read_parquet('{os.path.join(sf_dir, 'events.parquet')}')"
    ).fetchone()
    if (got["mn"], got["mx"], got["n"]) != want:
        errors["nanos_ntz"] = f"spark {tuple(got)} != duckdb {want}"

    # 2) + 3) Synthetic events.parquet in LTZ-micros / bigint shapes:
    # known epoch micros spanning a DST boundary (2024-03-10 US spring
    # forward) where a session-tz cast would visibly shift values.
    base = 1710050400_000_000  # 2024-03-10 06:00:00 UTC (01:00 EST)
    micros = [base + i * 1800_000_000 for i in range(8)]  # 30-min steps
    for shape in ("timestamp", "bigint"):
        with tempfile.TemporaryDirectory() as tmp:
            src = spark.createDataFrame(
                [(m,) for m in micros], "us BIGINT"
            )
            if shape == "timestamp":
                out = src.select(F.timestamp_micros("us").alias("ts"))
            else:
                out = src.select((F.col("us") * 1000).alias("ts"))
            out.write.parquet(os.path.join(tmp, "events.parquet"))
            ev2 = registry.load(spark, "events", tmp)
            dt = dict(ev2.dtypes)["ts"]
            if dt != "timestamp_ntz":
                errors[f"{shape}_dtype"] = dt
                continue
            got2 = sorted(
                r[0]
                for r in ev2.selectExpr(f"{EPOCH_DIFF} AS e").collect()
            )
            if got2 != micros:
                errors[shape] = (
                    f"first deltas {[g - m for g, m in zip(got2, micros)][:3]}"
                )

    print(json.dumps({"sf_dir": sf_dir, "errors": errors}))
    spark.stop()
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
