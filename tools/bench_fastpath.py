"""Fast-path hash benchmark: md5 (oracle-portable) vs xxhash64 (the
variant you run at 100 TB) over the same dedup pipelines at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

The correctness-gated catalog queries use md5 so DuckDB can verify them
bit-for-bit; this tool quantifies what the xxhash64 twins buy at scale
(no 32-char hex materialization, 8-byte shuffle keys, one hash per
token). Prints one JSON line per pipeline pair.

Usage: python tools/bench_fastpath.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def timed(fn, runs: int = 2) -> tuple[float, int]:
    best, rows = float("inf"), 0
    for _ in range(runs):
        t0 = time.perf_counter()
        rows = len(fn().collect())
        best = min(best, time.perf_counter() - t0)
    return round(best, 3), rows


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from cyborgdb_encrypted_vector_search_spark.functions import hashing as H
    from cyborgdb_encrypted_vector_search_spark.operators import dedup
    from cyborgdb_encrypted_vector_search_spark.plans.catalog import _corpus2x
    from cyborgdb_encrypted_vector_search_spark.session import get_spark

    spark = get_spark(
        app_name="cyborgdb-bench-fastpath",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    exact = _corpus2x(spark, sf_dir, near=False)
    near = _corpus2x(spark, sf_dir, near=True)

    def exact_md5():
        return dedup.exact_duplicates(exact, "doc_id", "text")

    def exact_xx():
        return (
            exact.select(
                "doc_id", H.fingerprint_xxhash(F.col("text")).alias("fp")
            )
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .filter(F.col("n_docs") > 1)
        )

    # MinHash: time the hash-dominated stage (shingle -> signature ->
    # banded rows); the pair-join cost downstream depends on candidate
    # counts, which are a property of the data + family draw, not of
    # the hash primitive. Candidate-pair counts are reported separately.
    def minhash_md5():
        return dedup.band_index(near)

    def minhash_xx():
        from pyspark.sql import functions as FF

        shingled = near.select(
            "doc_id", H.word_shingles(FF.col("text"), 3).alias("__sh")
        )
        sig = shingled.select(
            "doc_id", H.minhash_xxhash(FF.col("__sh"), 8).alias("signature")
        )
        return sig.select(
            "doc_id",
            FF.explode(H.minhash_bands_xxhash(FF.col("signature"), 4, 2)).alias(
                "band"
            ),
        )

    def simhash_md5():
        return dedup.simhash_fingerprints(near)

    def simhash_xx():
        return dedup.simhash_fingerprints_xxhash(near, num_bits=32)

    def simhash_xx64():
        return dedup.simhash_fingerprints_xxhash(near, num_bits=64)

    pairs = [
        ("exact_fingerprint_groups", exact_md5, exact_xx),
        ("minhash_band_index", minhash_md5, minhash_xx),
        ("simhash_fingerprints_32", simhash_md5, simhash_xx),
        ("simhash_fingerprints_md5_32_vs_xx_64", simhash_md5, simhash_xx64),
    ]
    results = {}
    for name, md5_fn, xx_fn in pairs:
        t_md5, n_md5 = timed(md5_fn)
        t_xx, n_xx = timed(xx_fn)
        results[name] = {
            "md5_sec": t_md5,
            "xxhash64_sec": t_xx,
            "speedup": round(t_md5 / t_xx, 2) if t_xx > 0 else None,
            "rows_md5": n_md5,
            "rows_xxhash64": n_xx,
        }
        spark.catalog.clearCache()

    # Candidate-pair counts (recall/noise profile of each family draw
    # on this corpus; true near-dup pairs = one per doc = corpus/2).
    pair_counts = {
        "md5": dedup.lsh_candidate_pairs(near).count(),
        "xxhash64": dedup.lsh_candidate_pairs_xxhash(near).count(),
    }
    spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "pipelines": results,
                "minhash_candidate_pairs": pair_counts,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
