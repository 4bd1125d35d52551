"""Gate-rotation arithmetic: derive the staleness ceiling honestly and
PROVE the schedule sustains it (VERDICT r11 "what's missing" #1).

The driver verifies the first W=50 entries of queries() per round. The
catalog has N queries; each query's "age" is rounds since its last
driver CORRECTNESS row. The r7-adopted invariant ("max age <= 4") was
chosen when N was ~150; at N > 200 it is arithmetically impossible:
a full rotation needs ceil(N / (W - k)) rounds, where k is the window
share reserved for new + touched entries (which preempt backfill).

    sustainable ceiling  C = ceil(N / (W - k))
    growth budget        net additions/round <= (C*W - N) / C

This tool does three things, all from committed artifacts (the
CORRECTNESS_r*.json union — the same derivation COVERAGE.md's table
uses), never from hand-kept counts:

1. `status`: per-cohort ages today + the derived ceiling for the
   current N and a stated reserve k.
2. `simulate`: roll the actual window-construction rule forward
   R rounds (mandatory at-ceiling cohort first, k reserved slots,
   oldest-first backfill) and assert max-age <= C at every step —
   the transient matters because cohort sizes are lumpy (22/13/45/
   49/50 after r12), not uniform.
3. `window`: cross-check plans/catalog.GATE_PRIORITY against the rule
   (every at-ceiling query present; exactly W entries; no name drift).

Run in CI-fashion per round:
    python tools/rotation_schedule.py            # status + simulate
    python tools/rotation_schedule.py window     # verify GATE_PRIORITY
Exit 1 if the queued window breaks the invariant or the simulation
ever exceeds the ceiling.
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

W = 50  # driver window size (fixed by the round driver)
CEILING = 5  # staleness ceiling, re-derived r12 (see derivation below)
RESERVE = 8  # slots/round budgeted for new + touched entries
SIM_ROUNDS = 12  # transient horizon to prove, beyond steady state


def last_gated() -> dict[str, int]:
    """query -> latest round with a driver CORRECTNESS row."""
    out: dict[str, int] = {}
    for p in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        r = int(re.search(r"_r(\d+)\.json$", p).group(1))
        for name in json.load(open(p)):
            out[name] = max(out.get(name, 0), r)
    return out


def catalog_names() -> list[str]:
    from cyborgdb_encrypted_vector_search_spark.plans.catalog import (
        GATE_PRIORITY,
        entries,
    )

    return list(entries()), list(GATE_PRIORITY)


def derive(n: int, reserve: int) -> tuple[int, float]:
    import math

    ceiling = math.ceil(n / (W - reserve))
    budget = (ceiling * W - n) / ceiling
    return ceiling, budget


def simulate(
    ages: dict[str, int],
    now: int,
    queued: list[str] | None,
    rounds: int,
    reserve: int,
    ceiling: int,
) -> list[str]:
    """Roll the window rule forward; return violation messages.

    Round now+1 uses the actual queued GATE_PRIORITY when given (its
    new/touched entries consume real slots); later rounds assume the
    full RESERVE is consumed by unknown future new/touched work (the
    conservative case — real rounds with fewer additions only gain
    backfill slots)."""
    last = dict(ages)
    bad: list[str] = []
    for r in range(now + 1, now + 1 + rounds):
        if queued is not None and r == now + 1:
            window = list(queued)
            # queued entries not in `last` are new this round
            for q in window:
                last.setdefault(q, 0)
        else:
            due = sorted(
                [q for q, g in last.items() if r - g >= ceiling],
                key=lambda q: (last[q], q),
            )
            slots = W - reserve
            if len(due) > slots:
                bad.append(
                    f"r{r}: {len(due)} at-ceiling queries > "
                    f"{slots} available slots ({due[:5]}...)"
                )
            backfill = sorted(
                [q for q, g in last.items() if 0 < r - g < ceiling],
                key=lambda q: (last[q], q),
            )
            window = (due + backfill)[:slots]
        for q in window:
            last[q] = r
        worst = max((r - g) for g in last.values())
        if worst > ceiling:
            stale = [q for q, g in last.items() if r - g > ceiling]
            bad.append(
                f"r{r}: max age {worst} > ceiling {ceiling} "
                f"({len(stale)} stale, e.g. {stale[:3]})"
            )
    return bad


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "status"
    gated = last_gated()
    names, window = catalog_names()
    now = max(gated.values())
    n = len(names)
    new = [q for q in names if q not in gated]
    ceiling, budget = derive(n, RESERVE)
    print(f"catalog N={n} window W={W} reserve k={RESERVE}")
    print(
        f"derived ceiling = ceil({n}/({W}-{RESERVE})) = {ceiling} rounds; "
        f"growth budget = ({ceiling}*{W}-{n})/{ceiling} = "
        f"{budget:.1f} net additions/round"
    )
    if ceiling != CEILING:
        print(
            f"[FAIL] documented CEILING={CEILING} != derived {ceiling} — "
            "re-derive COVERAGE.md's invariant or shrink the catalog"
        )
        return 1
    cohorts: dict[int, int] = {}
    for q, g in gated.items():
        if q in set(names):
            cohorts[now - g] = cohorts.get(now - g, 0) + 1
    for age in sorted(cohorts, reverse=True):
        flag = " (at ceiling — must lead next window)" if age >= CEILING - 1 else ""
        print(f"  age {age}: {cohorts[age]} queries{flag}")
    print(f"  new (never gated): {len(new)}")

    if mode == "window":
        ok = True
        if len(window) != W:
            print(f"[FAIL] GATE_PRIORITY has {len(window)} entries, want {W}")
            ok = False
        due = {q for q, g in gated.items() if q in set(names) and now + 1 - g >= CEILING}
        missing = due - set(window)
        if missing:
            print(f"[FAIL] at-ceiling queries missing from window: {sorted(missing)}")
            ok = False
        missing_new = set(new) - set(window)
        if missing_new:
            print(f"[FAIL] new queries missing from window: {sorted(missing_new)}")
            ok = False
        print("[ok] queued window satisfies the invariant" if ok else "")
        return 0 if ok else 1

    ages = {q: g for q, g in gated.items() if q in set(names)}
    bad = simulate(ages, now, window, SIM_ROUNDS, RESERVE, CEILING)
    if bad:
        print("[FAIL] simulation violates the ceiling:")
        for b in bad:
            print("  " + b)
        return 1
    print(
        f"[ok] {SIM_ROUNDS}-round simulation holds max-age <= {CEILING} "
        f"with {RESERVE} reserved slots/round (conservative: every "
        "future round assumed to consume the full reserve)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
