"""Compare two BENCH_DETAIL.json artifacts under the r10/r11 variance
protocol: per-query minima are the throughput figures; the recorded
raw runs (runs_sec) give each query a noise band. A query is flagged
as a REGRESSION only when the new minimum exceeds the old minimum by
more than the tolerance AND by more than the larger artifact's own
observed spread — a moved min outside its noise band. Everything else
is host noise by construction.

Idle-anchor rule (r11): min-of-3 is per-query noise immunity, not
per-WINDOW — a sweep captured entirely inside a co-tenant load spike
moves every min together (r10's committed artifact triggered 12 false
regressions that a quiet-host re-measure dissolved). bench.py now
times a fixed-cost CPU canary immediately before each query's run-set
(`canary_sec`). A would-be regression whose NEW canary exceeds the
quiet reference (the smaller of the two artifacts' median canaries —
if one sweep ran quiet, it anchors both) by --hot-factor is
reclassified [HOT-WINDOW]: the row's window was contended, re-run it
before believing the number.

Usage:
  python tools/compare_bench.py OLD.json NEW.json [--tol 0.25]
      [--hot-factor 2.0]

Exit 1 if genuine regressions are found; exit 2 if the only flags are
hot-window rows (re-run those rows on a quieter box).
"""

from __future__ import annotations

import argparse
import json
import statistics


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
    ap.add_argument(
        "--hot-factor",
        type=float,
        default=2.0,
        help="canary elevation over the quiet reference that marks a "
        "row's window as co-tenant-hot (flag becomes HOT-WINDOW)",
    )
    ap.add_argument(
        "--abs-floor",
        type=float,
        default=0.3,
        help="absolute min-increase (sec) a regression must also "
        "exceed: local-mode sub-second rows jitter 20-35%% between "
        "same-code quiet sweeps (host-regime drift, r10->r11 A/B "
        "verified in docs/COSTS.md), so a relative-only rule flags "
        "scheduling-floor noise",
    )
    args = ap.parse_args()
    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    oq, nq = old["queries"], new["queries"]
    oruns = old.get("runs_sec", {})
    nruns = new.get("runs_sec", {})
    # canary_sec values are [before, after] brackets (r11b) or a single
    # leading float (r11a): the row's hotness signal is the WORSE
    # sample (a spike starting mid-run-set shows up in `after`); the
    # quiet reference uses the BETTER one (closest to true capability)
    def _worst(c):
        return max(c) if isinstance(c, list) else c

    def _best(c):
        return min(c) if isinstance(c, list) else c

    ocan = old.get("canary_sec", {})
    ncan = new.get("canary_sec", {})
    # quiet reference: the smaller of the two sweeps' median
    # best-canaries — if either sweep ran on a quiet box, it anchors
    # both; if both ran hot, the rule degrades conservatively (fewer
    # reclassifications)
    medians = [
        statistics.median(_best(v) for v in c.values())
        for c in (ocan, ncan)
        if c
    ]
    quiet_ref = min(medians) if medians else None

    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    regressions, improvements, hot_rows = [], [], []
    for name in common:
        o, n = oq[name], nq[name]
        band = max(spread(oruns.get(name)), spread(nruns.get(name)))
        if n > o * (1 + args.tol) and n - o > max(band, args.abs_floor):
            c = ncan.get(name)
            if (
                quiet_ref is not None
                and c is not None
                and _worst(c) > args.hot_factor * quiet_ref
            ):
                hot_rows.append((name, o, n, _worst(c)))
            else:
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
    for name, o, n, c in hot_rows:
        print(
            f"[HOT-WINDOW] {name}: min {o:.2f}s -> {n:.2f}s but its "
            f"canary ran {c:.2f}s vs quiet ref {quiet_ref:.2f}s — "
            f"window was contended, re-run before believing this row"
        )
    for name, o, n in improvements:
        print(f"[improved]   {name}: min {o:.2f}s -> {n:.2f}s")
    if added:
        print("added:", ", ".join(added))
    if removed:
        print("removed:", ", ".join(removed))
    if regressions:
        raise SystemExit(1)
    if hot_rows:
        raise SystemExit(2)


if __name__ == "__main__":
    main()
