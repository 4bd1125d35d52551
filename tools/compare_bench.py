"""Compare two BENCH_DETAIL.json artifacts under the r10 variance
protocol: per-query minima are the throughput figures; the recorded
raw runs (runs_sec) give each query a noise band. A query is flagged
as a REGRESSION only when the new minimum exceeds the old minimum by
more than the tolerance AND by more than the larger artifact's own
observed spread — a moved min outside its noise band. Everything else
is host noise by construction.

Usage:
  python tools/compare_bench.py OLD.json NEW.json [--tol 0.25]

Exit 1 if regressions are found (usable as a CI-ish guard).
"""

from __future__ import annotations

import argparse
import json


def spread(runs: list[float] | None) -> float:
    if not runs or len(runs) < 2:
        return 0.0
    # the protocol defines run 0 as the cold run (codegen + file
    # listing), so the warm noise band is runs[1:] — dropping the MAX
    # instead would keep the cold run's codegen cost in the band
    # whenever a warm run hiccups slower than the cold one
    warm = runs[1:] if len(runs) > 2 else runs
    return max(warm) - min(warm)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--tol",
        type=float,
        default=0.25,
        help="relative min-increase below which nothing is flagged",
    )
    args = ap.parse_args()
    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    oq, nq = old["queries"], new["queries"]
    oruns = old.get("runs_sec", {})
    nruns = new.get("runs_sec", {})

    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    regressions, improvements = [], []
    for name in common:
        o, n = oq[name], nq[name]
        band = max(spread(oruns.get(name)), spread(nruns.get(name)))
        if n > o * (1 + args.tol) and n - o > band:
            regressions.append((name, o, n, band))
        elif o > n * (1 + args.tol):
            improvements.append((name, o, n))

    print(
        f"common={len(common)} added={len(added)} removed={len(removed)} "
        f"old_total={sum(oq[c] for c in common):.1f}s "
        f"new_total={sum(nq[c] for c in common):.1f}s (common queries)"
    )
    for name, o, n, band in regressions:
        print(f"[REGRESSION] {name}: min {o:.2f}s -> {n:.2f}s "
              f"(band ±{band:.2f}s)")
    for name, o, n in improvements:
        print(f"[improved]   {name}: min {o:.2f}s -> {n:.2f}s")
    if added:
        print("added:", ", ".join(added))
    if removed:
        print("removed:", ", ".join(removed))
    if regressions:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
