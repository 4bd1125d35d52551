"""Session-lifetime cache bookkeeping for operators that MUST persist.

Some operators persist an intermediate frame as a correctness device,
not a performance hint: scalable_row_number (operators/ranking.py)
materializes the range-partitioned enumeration once so its counts
branch and data branch read the SAME nondeterministic boundary sample,
and the graph kernels (operators/graph.py) pin the derived edge frame
so every fixed-point iteration reads one invariant adjacency. Those
frames cannot be unpersisted inside the operator — the cache must
outlive the caller's action — so in a long-running driver that executes
many catalog queries the InMemoryRelations would accumulate for the
session lifetime.

This module is the release valve: operators register such frames with
``track``; query drivers (bench.py, tools/parity.py, the round driver's
correctness loop) call ``release_all()`` AFTER materializing each
query's result. Releasing between queries is always safe — results are
already collected; re-collecting a released ranking frame would
recompute with a fresh boundary sample, which is why release happens at
query boundaries, never mid-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an intentionally-persisted frame for later release."""
    _LIVE.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked frame; returns how many were released.

    Call between queries (after the previous result is materialized),
    never while a plan that reads a tracked frame is still pending.
    """
    n = 0
    for df in _LIVE:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    _LIVE.clear()
    return n
