"""Time-series feature operators that need per-key sequential state.

Most time-series shapes in this engine are declarative (RANGE-frame
rolling windows, gaps-and-islands streaks, hourly gap fill + forward
fill — all in plans/catalog.py). This module holds the one shape
Catalyst genuinely cannot express: a per-key RECURSION, where row i's
value depends on row i-1's OUTPUT (not merely on a window over
inputs). Exponential moving averages are the canonical case —
e_i = d·e_{i-1} + (1-d)·x_i has no prefix-sum form once the
arithmetic is floored (the float telescoping trick overflows and is
order-sensitive anyway).

The implementation is the documented custom-stateful fallback: one
Arrow-batched ``applyInPandas`` fold per key — keys are distributed,
the recursion is sequential only WITHIN a key (bounded: one user's
events), and all arithmetic is fixed-point on nonnegative BIGINTs
(floor division), so the result is exactly reproducible across
engines, partitionings, and replays — value-hash gateable against a
DuckDB recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ema_fixedpoint(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_fp_col: str,
    decay_pct: int = 85,
) -> DataFrame:
    """Per-key fixed-point EMA fold.

        e_1 = x_1
        e_i = (decay_pct * e_{i-1} + (100 - decay_pct) * x_i) div 100

    ``value_fp_col`` must already be a nonnegative BIGINT in the
    caller's fixed-point scale (floor division on negatives differs
    between engines — truncation vs floor — so the contract is
    nonnegative inputs). Returns one row per key:
    (key, n_events BIGINT, ema_fp BIGINT).
    """
    import pandas as pd

    d = int(decay_pct)
    out_schema = f"{key_col} long, n_events long, ema_fp long"
    cols = [key_col, *order_cols, value_fp_col]

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        e = None
        for x in pdf[value_fp_col]:
            x = int(x)
            e = x if e is None else (d * e + (100 - d) * x) // 100
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_events": [len(pdf)],
                "ema_fp": [e],
            }
        )

    return (
        df.select(*cols)
        .groupBy(key_col)
        .applyInPandas(fold, schema=out_schema)
    )


def ema_fixedpoint_rows(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_fp_col: str,
    decay_pct: int = 85,
) -> DataFrame:
    """Per-ROW running EMA — the feature-pipeline shape of
    ``ema_fixedpoint`` (same fold, same fixed-point contract), emitting
    every intermediate state instead of only the final one:

        (key, rn, ema_fp)  —  rn is the 1-based position of the event
        in the key's ``order_cols`` order, ema_fp the EMA AFTER folding
        that event.

    A feature pipeline joins this back on (key, rn) (or equivalently
    on the original order columns after a row_number) to attach the
    recency-decayed signal to each event. Output size = input size;
    the fold is still one sequential pass per key, keys distributed.
    """
    import pandas as pd

    d = int(decay_pct)
    out_schema = f"{key_col} long, rn long, ema_fp long"
    cols = [key_col, *order_cols, value_fp_col]

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        out: list[int] = []
        e: int | None = None
        for x in pdf[value_fp_col]:
            x = int(x)
            e = x if e is None else (d * e + (100 - d) * x) // 100
            out.append(e)
        return pd.DataFrame(
            {
                key_col: pdf[key_col].iloc[0],
                "rn": range(1, len(out) + 1),
                "ema_fp": out,
            }
        )

    return (
        df.select(*cols)
        .groupBy(key_col)
        .applyInPandas(fold, schema=out_schema)
    )
