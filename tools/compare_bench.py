"""Diff two bench JSON artifacts on COST (wall − load), noise-aware.

Round-over-round comparisons on raw wall time chase phantoms: whichever
query first touches a session-shared derivation pays its build
(run-order-dependent), and the local noise floor is ±30-40% per query
with occasional 2-4× single-query swings (BASELINE.md protocol notes).
This tool compares the costTime analogue and only flags deltas that
clear both a ratio threshold and an absolute floor.

Usage: python tools/compare_bench.py OLD.json NEW.json [--ratio 2.0] [--abs 1.0]
Output: per-query flagged regressions/improvements + totals; exit 0 always
(informational — the correctness gates live elsewhere).
"""

from __future__ import annotations

import argparse
import json


def cost_map(path: str) -> tuple[dict[str, float], float, bool]:
    d = json.load(open(path))
    loads = d.get("loads")
    costs = {
        k: round(v - (loads or {}).get(k, 0.0), 2)
        for k, v in d.get("queries", {}).items()
    }
    return (
        costs,
        float(d.get("value", sum(d.get("queries", {}).values()))),
        loads is not None,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=2.0, help="flag if cost changed ≥ this factor")
    ap.add_argument("--abs", dest="abs_floor", type=float, default=1.0, help="…and by ≥ this many seconds")
    args = ap.parse_args()

    old, old_total, old_split = cost_map(args.old)
    new, new_total, new_split = cost_map(args.new)
    print(f"total wall: {old_total:.1f}s -> {new_total:.1f}s")
    if old_split != new_split:
        # wall-vs-cost comparisons conflate the attribution change with
        # real deltas (first-touch loads get flagged as phantom swings)
        print(
            "  WARNING: only one artifact carries a 'loads' split — "
            "comparing wall against cost; per-query flags below are "
            "unreliable for queries with first-touch derivation loads"
        )

    flagged = []
    for name in sorted(set(old) & set(new)):
        a, b = max(old[name], 0.01), max(new[name], 0.01)
        if abs(b - a) >= args.abs_floor and (b / a >= args.ratio or a / b >= args.ratio):
            flagged.append((name, old[name], new[name]))
    for name, a, b in sorted(flagged, key=lambda t: t[1] - t[2]):
        tag = "REGRESSION" if b > a else "improved"
        print(f"  {tag:>10} {name}: cost {a:.2f}s -> {b:.2f}s")
    if not flagged:
        print("  no per-query cost delta clears the noise thresholds")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"  dropped queries: {only_old}")
    if only_new:
        print(f"  new queries: {only_new}")


if __name__ == "__main__":
    main()
