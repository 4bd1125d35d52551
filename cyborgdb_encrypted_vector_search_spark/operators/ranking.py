"""Scalable global-ranking operators (row_number / rank / dense_rank /
percent_rank / ntile over a TOTAL order, without a single-partition
sort).

A plain ``Window.orderBy(...)`` with no partitionBy plans as ONE
partition sorting ALL rows — fine when the window's input is an
aggregate's small output (the shape ``q_rank_family_orders`` pins), a
scale-killer over raw 100 TB rows. This module implements the
formulation docs/COSTS.md sketches, as real operators:

1. ``repartitionByRange`` on the sort key — Spark's rangepartitioning
   exchange places each row in a key-ordered partition (boundaries from
   a reservoir sample), so partition i's rows all sort before
   partition i+1's.
2. ``sortWithinPartitions`` + a thin Arrow ``mapInPandas`` enumerator —
   each partition numbers its own rows 1..n_i in parallel, ZERO extra
   shuffle (a window partitioned by spark_partition_id would re-shuffle
   the whole table just to regroup what the range exchange already
   grouped).
3. per-partition counts -> prefix-sum offsets -> broadcast offset join:
   ``global_rn = local_rn + offset``. The prefix sum is a window over P
   COUNTER rows (one per partition), not data rows. The enumerated
   frame is persisted so the counts branch and the data branch read ONE
   InMemoryRelation: spark_partition_id() is a nondeterministic
   expression, so the two branches' range exchanges do NOT canonicalize
   equal and would otherwise each sample their own boundaries —
   inconsistent pid->count vs pid->rows and scrambled numbering. One
   materialized pass is the same contract RDD.zipWithIndex ships with;
   it is the price of a global total order.

``rank`` then falls out as ``min(global_rn)`` over a HASH-partitioned
window keyed by the rank columns (a keyed shuffle that scales),
``dense_rank`` by applying the same row-number machinery recursively to
the (much smaller) distinct-key representatives, and
``percent_rank``/``ntile`` are closed-form expressions over
``global_rn``/``rank`` and the 1-row broadcast total.

Determinism: callers must supply a tiebreaker that makes the order
total; range-boundary placement then only affects partition sizes,
never the numbering.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from cyborgdb_encrypted_vector_search_spark.caching import track

OrderSpec = Sequence[tuple[str, bool]]  # (column, ascending)


def _sort_cols(order: OrderSpec) -> list:
    return [F.asc(c) if asc else F.desc(c) for c, asc in order]


def scalable_row_number(
    df: DataFrame,
    order: OrderSpec,
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global 1-based row_number over a total order, with no
    single-partition sort: rangepartitioning exchange -> parallel
    per-partition enumeration -> broadcast offset merge.

    ``order`` is [(col, ascending), ...] and MUST be a total order
    (include a unique tiebreaker) for the numbering to be well-defined.
    """
    if not order:
        raise ValueError("order must name at least one column")
    sort_exprs = _sort_cols(order)
    n_parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = (
        df.repartitionByRange(n_parts, *sort_exprs)
        .sortWithinPartitions(*sort_exprs)
        .withColumn("__pid", F.spark_partition_id())
    )

    out_schema = StructType(
        ranged.schema.fields + [StructField("__local_rn", LongType(), False)]
    )

    def enumerate_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        # Rows stream through in sortWithinPartitions order; a running
        # counter across Arrow batches numbers the whole partition.
        seen = 0
        for b in batches:
            b = b.copy()
            b["__local_rn"] = range(seen + 1, seen + len(b) + 1)
            seen += len(b)
            yield b

    # persist(): both consumers below must see the SAME boundary
    # sample — see the module docstring. StorageLevel default
    # (MEMORY_AND_DISK) spills rather than recomputes. The cache must
    # outlive the caller's action (unpersisting earlier would recompute
    # the two branches against DIFFERENT boundary samples), so it is
    # registered with caching.track for the query driver to release
    # between queries — see caching.release_all.
    numbered = track(
        ranged.mapInPandas(enumerate_partition, schema=out_schema).persist()
    )

    # Offsets: P (partition, count) counter rows -> running prefix sum.
    # The window is "global" but over P counter rows, never data rows.
    counts = numbered.groupBy("__pid").agg(
        F.max("__local_rn").alias("__n")
    )
    prefix_w = (
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__n").over(prefix_w), F.lit(0)).alias("__offset"),
    )
    return (
        numbered.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__local_rn") + F.col("__offset"))
        .drop("__pid", "__local_rn", "__offset")
    )


def scalable_rank_family(
    df: DataFrame,
    rank_order: OrderSpec,
    tiebreak: OrderSpec,
    ntile_buckets: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """rank / dense_rank / percent_rank / ntile over a global order,
    every stage either embarrassingly parallel or a keyed shuffle.

    ``rank_order`` defines the ranking keys (ties share rank);
    ``tiebreak`` extends it to a total order for row numbering and
    ntile. Output adds ``rn``, ``rnk``, ``drnk``, ``prk`` and
    ``ntile_<b>`` columns.

    Semantics match the SQL window functions exactly:
    - rank = min row_number within the tie group,
    - dense_rank = 1-based index of the tie group in key order
      (computed by recursing scalable_row_number over one
      representative row per distinct key — |distinct keys| rows, the
      same machinery, never a global data-row window),
    - percent_rank = (rank-1)/(N-1)  (0 when N=1),
    - ntile(b): first (N mod b) buckets take ceil(N/b) rows — the
      standard larger-buckets-first split, closed-form from rn. N is a
      1-row broadcast aggregate, never a driver-side count.
    """
    total_order = list(rank_order) + list(tiebreak)
    numbered = scalable_row_number(
        df, total_order, out_col="rn", num_partitions=num_partitions
    )
    key_cols = [c for c, _ in rank_order]
    # Keyed (hash) window: scales with the key distribution, no global sort.
    tie_w = Window.partitionBy(*key_cols)
    ranked = numbered.withColumn("rnk", F.min("rn").over(tie_w))

    # Tie-group representatives: one row per distinct key, already far
    # smaller; number THEM with the same range-partition machinery.
    reps = ranked.groupBy(*key_cols).agg(F.min("rn").alias("__grp_rn"))
    dense = scalable_row_number(
        reps, [("__grp_rn", True)], out_col="drnk",
        num_partitions=num_partitions,
    ).drop("__grp_rn")
    ranked = ranked.join(dense, key_cols, "left")

    total = df.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    ranked = ranked.crossJoin(F.broadcast(total))
    n = F.col("__N")
    b = int(ntile_buckets)
    if b < 1:
        raise ValueError(f"ntile_buckets must be >= 1, got {b}")
    prk = F.when(n <= 1, F.lit(0.0)).otherwise(
        (F.col("rnk") - F.lit(1)) / (n - F.lit(1)).cast("double")
    )
    q = F.floor(n / F.lit(b))  # small-bucket size
    r = n % F.lit(b)  # number of larger (q+1-sized) buckets
    big = r * (q + F.lit(1))  # rows covered by the larger buckets
    # CASE WHEN evaluates lazily per row: the q==0 (N < b) case always
    # lands in the first branch (big == N >= rn), so the /q is safe.
    tile = F.when(
        F.col("rn") <= big, F.ceil(F.col("rn") / (q + F.lit(1)))
    ).otherwise(r + F.ceil((F.col("rn") - big) / q))
    return (
        ranked.withColumn("prk", F.round(prk, 7))
        .withColumn(f"ntile_{b}", tile.cast("int"))
        .drop("__N")
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: Sequence[float],
    tiebreak_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT discrete quantiles of a column at any scale — the exact
    counterpart to approx_percentile, built on scalable_row_number
    instead of a global sort: the q-quantile is the value whose global
    rank is max(1, ceil(q*N)) under the (value, tiebreak) total order.

    One range shuffle + parallel enumeration produces ranks; N is a
    1-row broadcast aggregate; the |quantiles|-row target frame
    broadcasts onto the numbered data, so the final join touches every
    row once and keeps |quantiles| of them. No partition ever holds
    more than its range slice — exact medians over 100 TB without a
    single-partition sort.

    Returns (q DOUBLE, value <value_col type>), one row per requested
    quantile. Quantiles must lie in (0, 1].
    """
    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    for q in quantiles:
        if not (0.0 < q <= 1.0):
            raise ValueError(f"quantile out of (0, 1]: {q}")
    numbered = scalable_row_number(
        df.select(value_col, tiebreak_col),
        [(value_col, True), (tiebreak_col, True)],
        out_col="__rn",
        num_partitions=num_partitions,
    )
    spark = df.sparkSession
    total = df.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    qs = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    targets = qs.crossJoin(F.broadcast(total)).select(
        "q",
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.col("q") * F.col("__N")).cast("long"),
        ).alias("__target"),
    )
    return (
        numbered.join(
            F.broadcast(targets), F.col("__rn") == F.col("__target")
        )
        .select("q", F.col(value_col).alias("value"))
    )
