"""Corpus-level sampling operators whose PARAMETERS are data-derived.

The catalog's hash-sampling family (q_sample_hash / _stratified /
_mixture / q_split_train_val_test) covers pure-function-of-the-key
selection with FIXED rates. Training-data mixes in practice derive the
rates FROM the observed corpus: temperature sampling (mT5 / UniMax
style) allocates a token/doc budget across sources proportional to
``n_source ** T`` so that a T < 1 flattens the mix — large crawl
sources are downsampled hard, small curated sources are kept nearly
whole. That makes the sampling plan a two-step dataflow: a tiny
per-source aggregate decides the quotas, then a hash-ordered window
fills each quota deterministically.

Scale shape: the aggregate is one map-side-combinable groupBy producing
|sources| rows (broadcast back); the quota fill is one shuffle on the
group key with WindowGroupLimit keeping only quota survivors per
partition before the exchange. Membership is still a pure function of
(key, corpus statistics): reruns, engines, partitionings, and cluster
sizes all select the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def temperature_quotas(
    df: DataFrame,
    budget: int,
    temperature: float = 0.5,
    group_col: str = "source",
) -> DataFrame:
    """Per-group sampling quotas for a total ``budget`` of rows,
    allocated proportional to ``count ** temperature``.

    Returns (group, n_total, quota). ``quota`` is
    ``round(budget * share)`` capped at the group size, where
    ``share = n**T / sum(n**T)``; the share is rounded to 9 dp before
    scaling so the float boundary cannot flip a quota between engines
    summing ``n**T`` in different orders.
    """
    cnt = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    cnt = cnt.withColumn("w", F.pow(F.col("n_total").cast("double"), F.lit(temperature)))
    tot = cnt.agg(F.sum("w").alias("wsum"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .withColumn("share", F.round(F.col("w") / F.col("wsum"), 9))
        .withColumn(
            "quota",
            F.least(
                F.col("n_total"),
                F.floor(F.lit(float(budget)) * F.col("share") + F.lit(0.5)).cast(
                    "bigint"
                ),
            ),
        )
        .select("grp", "n_total", "quota")
    )


def temperature_sample(
    df: DataFrame,
    budget: int,
    temperature: float = 0.5,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Select ~``budget`` rows with per-group quotas from
    :func:`temperature_quotas`, filling each quota in md5-hash order of
    the id (unbiased w.r.t. natural data order, fully reproducible).

    Returns the selected rows (all original columns). The quota frame
    is tiny (|sources| rows) and broadcasts; WindowGroupLimit keeps the
    per-partition candidates at quota size before the one shuffle on
    the group key.
    """
    quotas = temperature_quotas(df, budget, temperature, group_col)
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .join(
            F.broadcast(quotas),
            F.col(group_col) == F.col("grp"),
        )
        .filter(F.col("__rn") <= F.col("quota"))
        .drop("__rn", "grp", "n_total", "quota")
    )
