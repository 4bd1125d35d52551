"""Skew-mitigation join helpers.

A shuffled join on a skewed key sends every row of the hot key to one
task — the classic 100 TB straggler. Two remedies, composable:

- AQE skew-join (on by default in session.py) splits oversized
  partitions at runtime.
- Explicit salting (here): the large/skewed side gets a uniform salt in
  [0, n); the other side is replicated once per salt value; the join key
  becomes (key, salt). Hot keys spread across n tasks deterministically,
  at the cost of replicating the smaller side n times — choose n ~ the
  observed hot-key multiplicity / target partition size.

The salt must be DETERMINISTIC per row (hash of stable columns, not
rand()) so retries/speculative tasks produce identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def replicate_for_salts(
    df: DataFrame, n_salts: int, out_col: str = "__salt"
) -> DataFrame:
    """Replicate each row once per salt value (the smaller join side)."""
    return df.withColumn(
        out_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join left (large/skewed) to right (smaller) on key with salting.

    Result is exactly the plain join's result — pinned by the
    q_skew_salted_join oracle query.
    """
    l = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(left_key).cast("string")), F.lit(n_salts)).cast(
            "int"
        ),
    )
    r = replicate_for_salts(right, n_salts).withColumn(
        "__salt", F.col("__salt").cast("int")
    )
    out = l.join(
        r,
        (l[left_key] == r[right_key]) & (l["__salt"] == r["__salt"]),
        how,
    )
    return out.drop("__salt")
