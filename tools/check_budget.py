"""Compare a bench.py output line against the committed per-row wall
budget (BENCH_BUDGET.json) and fail loudly on rows over budget.

The budget answers the r7 question "is this bench total drift or
regression?" mechanically: per-row budgets are 2x the per-row minimum
observed over 4 solo runs in a quiet window (+0.5 s absolute slack for
sub-second rows), which ambient load was never observed to exceed —
a breach means the ROW's plan changed (new strata or a regression)
and must be re-attributed, not hand-waved.

Usage:
    python bench.py | tail -1 | python tools/check_budget.py
    python tools/check_budget.py BENCH_r08.json     # driver format too
"""

from __future__ import annotations

import json
import os
import sys


def _load_bench(src: str) -> dict:
    """Accept a raw bench.py JSON line or the driver's BENCH_r*.json
    wrapper (bench line embedded in 'parsed' or in the 'tail' text)."""
    data = json.loads(src)
    if "queries" in data:
        return data
    if isinstance(data.get("parsed"), dict) and "queries" in data["parsed"]:
        return data["parsed"]
    tail = data.get("tail", "")
    i = tail.rfind('{"metric"')
    if i >= 0:
        return json.loads(tail[i:].splitlines()[0])
    raise SystemExit("no bench JSON found in input")


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_BUDGET.json")) as f:
        budget = json.load(f)
    src = (open(sys.argv[1]).read() if len(sys.argv) > 1
           else sys.stdin.read())
    bench = _load_bench(src)

    per_row = budget["budget_per_row"]
    over = []
    new_rows = []
    for name, t in bench["queries"].items():
        if name not in per_row:
            new_rows.append(name)
        elif t > per_row[name]:
            over.append((name, t, per_row[name]))
    total = sum(t for t in bench["queries"].values() if t >= 0)
    print(f"corpus: {total:.1f}s vs budget {budget['corpus_budget']}s "
          f"({'OK' if total <= budget['corpus_budget'] else 'OVER'})")
    for name in new_rows:
        print(f"NEW ROW (no budget yet): {name} "
              f"{bench['queries'][name]:.2f}s")
    for name, t, b in sorted(over, key=lambda x: x[2] - x[1]):
        print(f"OVER BUDGET: {name} {t:.2f}s > {b:.2f}s")
    if over or total > budget["corpus_budget"]:
        print("=> attribute before shipping: re-run the offending rows "
              "in isolation; a breach without a strata diff is a "
              "regression")
        return 1
    print(f"{len(bench['queries'])} rows within budget")
    return 0


if __name__ == "__main__":
    sys.exit(main())
