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


def weighted_sample_per_group(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    key_col: str = "es_key",
) -> DataFrame:
    """Exact weighted sampling WITHOUT replacement of ``k`` rows per
    group (Efraimidis–Spirakis, the per-group twin of the global
    ``q_sample_weighted`` gate): each row gets key ``ln(u) / w`` with
    ``u`` a deterministic md5-derived uniform in (0,1) and ``w`` the
    row's weight; the top-k by key WITHIN each group is an exact
    weighted sample of that group.

    This is the per-source curation cap ("keep at most k docs per
    domain, preferring high quality/length") as ONE window: shuffle on
    the group key, WindowGroupLimit keeps k survivors per partition
    before the exchange — no global sort, no quotas frame, no driver
    pass. Membership is a pure function of (id, weight), so reruns,
    engines and partitionings select identical rows.

    ``weight_col`` must be > 0; the key is rounded to 10 dp BEFORE
    ranking (both engines rank identical doubles; ``id_col`` breaks
    residual ties). u = (h48+1)/(2^48+1) keeps u in (0,1) so ln is
    finite.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h48 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10
    ).cast("double")
    es = F.round(
        F.log((h48 + F.lit(1.0)) / F.lit(281474976710657.0))
        / F.col(weight_col).cast("double"),
        10,
    )
    keyed = df.withColumn(key_col, es)
    w = Window.partitionBy(group_col).orderBy(
        F.desc(key_col), F.asc(id_col)
    )
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(k))
        .drop("__rn")
    )
