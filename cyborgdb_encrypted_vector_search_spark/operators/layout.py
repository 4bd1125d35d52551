"""Storage-layout operators: time-partitioned (hypertable-style) tables.

The 100 TB relational counterpart of the IVF centroid-partitioned
layout (operators/ann.build_ivf_layout): event/fact tables written as
``event_date=YYYY-MM-DD/`` partition directories so time-range
predicates become PARTITION PRUNING — a 3-day query against a 10-year
table lists and reads 3 directories, zero bytes from the rest. This is
the standard lakehouse ingest layout (one partition per day/hour);
compaction and retention become per-directory operations.

No custom machinery: the layout IS Spark's partitioned parquet write,
and the pruning IS Catalyst's PartitionFilters — the operator exists to
state the layout contract in one place and keep the gate/test honest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_time_partitioned(
    df: DataFrame, ts_col: str, path: str, granularity: str = "day"
) -> None:
    """Materialize ``df`` partitioned by the date (or hour) of
    ``ts_col``. The partition column is derived, kept alongside the
    original timestamp (queries still see full precision)."""
    if granularity == "day":
        part = F.to_date(F.col(ts_col))
    elif granularity == "hour":
        part = F.date_trunc("hour", F.col(ts_col))
    else:
        raise ValueError(f"unsupported granularity: {granularity!r}")
    (
        df.withColumn("event_date", part)
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )


def read_time_range(
    spark: SparkSession, path: str, start_date: str, end_date: str
) -> DataFrame:
    """Scan a time-partitioned table for [start_date, end_date]
    (inclusive): the ``event_date`` predicate is satisfied by partition
    pruning before any file IO — PartitionFilters in the scan, same
    mechanism as the IVF layout's centroid probe.

    The bounds are DAY-inclusive for both granularities: comparing
    ``to_date(event_date)`` (not the raw partition value) keeps the
    contract when the layout is hour-partitioned, where a raw
    ``event_date <= '2024-01-12'`` would cast the bound to midnight and
    silently drop the end day's later hours. ``to_date`` over a
    partition column is deterministic and references only partition
    values, so it stays in PartitionFilters and still prunes."""
    t = spark.read.parquet(path)
    day = F.to_date(F.col("event_date"))
    return t.filter(
        (day >= F.to_date(F.lit(start_date)))
        & (day <= F.to_date(F.lit(end_date)))
    )
