"""SparkSession factory with scale-appropriate defaults.

The reference initializes its "session" via side-effectful imports
(model load + collection creation at import time, reference
src/embeddings.py:3, src/chromadb_store.py:3-4). Here session init is
explicit, and the defaults are chosen for a real cluster:

- AQE on (runtime re-plan, skew-join handling, partition coalescing).
- Arrow enabled for every pandas interchange (the embed/mutate UDF path).
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- Shuffle partitions sized by caller (32 for local bench; a cluster
  deployment would size this to ~2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cyborgdb-encrypted-vector-search-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults applied."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE sizes coalesced reads by SHUFFLE BYTES and cannot see a
        # downstream operator's fan-out or per-row CPU: the graph
        # kernels' adjacency joins (a few MB of arrays that explode
        # into O(Σd²) intersect work) were measured collapsing to ONE
        # post-shuffle partition, serializing the whole stage on one
        # core (q_graph_triangles 5.5 s -> 2.4 s at sf0.1 with this
        # floor). 64k keeps small-but-CPU-dense shuffles parallel; at
        # real data scale partitions dwarf the floor and the setting
        # is inert.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Shuffled-hash-join preference was A/B'd in r12
        # (preferSortMergeJoin=false + adaptive
        # maxShuffledHashJoinLocalMapThreshold=128m, guide §3.1/§9) and
        # REJECTED: −7% on a 16-query join-heavy relational subset, but
        # the dup-key banded self-joins of the dedup family degraded
        # multi-fold (dedup_simhash_groups 2.3 -> 10.5s, minhash/
        # substring/streaming-dedup 1.5-3x) — SHJ builds per-partition
        # multi-maps over heavily duplicated band keys where SMJ merges
        # sorted runs. Engine-wide the defaults win; a per-query SHUFFLE_HASH
        # hint is the right tool if a specific relational plan ever needs it.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Small local driver UIs are useless in CI and cost startup time.
        .config("spark.ui.enabled", "false")
        # Console progress bars write carriage-return frames that can
        # interleave with (and corrupt) machine-read stdout — see
        # BENCH_r06.json "parsed": null. Progress belongs in the UI/logs.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
