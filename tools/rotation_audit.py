"""Rotation audit: recompute the driver-window staleness state from the
committed CORRECTNESS_r*.json files and check the CURRENT registry window
against it — the bookkeeping the round judges have been redoing by hand.

Contract (registry.py): the driver value-checks only the first
``DRIVER_WINDOW`` registry entries each round; an oracle goes STALE if it
has no green (hash_match) CORRECTNESS row within the last 3 rounds. So the
upcoming round's window MUST contain
  (a) every oracle that has NEVER been green (new oracles), and
  (b) every oracle whose freshest green is exactly 3 rounds old
      (at the staleness bound — one more miss and it's stale).

This tool prints the freshest-green census, the upcoming round's
obligations, whether the current ``_ORDER`` prefix satisfies them, and the
NEXT round's projected cohort (so the registry comments can plan it).
Exit 1 if any obligated oracle is missing from the window.

Usage: python tools/rotation_audit.py   (no Spark session needed — <1s)
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
STALE_AFTER = 3  # rounds without a green row


def freshest_green(repo: Path = REPO) -> tuple[dict[str, int], int]:
    """oracle → latest round with a hash_match row; plus the upcoming
    round number (max committed CORRECTNESS round + 1)."""
    latest: dict[str, int] = {}
    rounds = []
    for p in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        try:
            doc = json.loads(p.read_text())
        except Exception:  # noqa: BLE001 — a corrupt artifact isn't evidence
            continue
        for name, row in doc.items():
            if isinstance(row, dict) and row.get("hash_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, (max(rounds) + 1 if rounds else 1)


def audit(repo: Path = REPO) -> dict:
    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles
    from spark_ml_algo_lib_master_tongji_spark.registry import (
        DRIVER_WINDOW,
        _ORDER,
    )

    latest, upcoming = freshest_green(repo)
    oracles = set(all_oracles())
    window = set(_ORDER[:DRIVER_WINDOW])

    never_green = sorted(oracles - set(latest))
    at_bound = sorted(
        n for n, r in latest.items()
        if n in oracles and r == upcoming - STALE_AFTER
    )
    already_stale = sorted(
        n for n, r in latest.items()
        if n in oracles and r < upcoming - STALE_AFTER
    )
    obligated = [*never_green, *at_bound, *already_stale]
    missing = sorted(n for n in obligated if n not in window)
    next_cohort = sorted(
        n for n, r in latest.items()
        if n in oracles and r == upcoming - STALE_AFTER + 1 and n not in window
    )
    return {
        "upcoming_round": upcoming,
        "oracles": len(oracles),
        "never_green": never_green,
        "at_bound": at_bound,
        "already_stale": already_stale,
        "window_size": DRIVER_WINDOW,
        "obligated": len(obligated),
        "missing_from_window": missing,
        "slack": DRIVER_WINDOW - len(obligated),
        "next_round_cohort_size": len(next_cohort),
    }


def main() -> int:
    a = audit()
    print(
        f"upcoming round r{a['upcoming_round']}: {a['oracles']} oracles, "
        f"window {a['window_size']}"
    )
    print(
        f"  obligated in window: {a['obligated']} "
        f"({len(a['never_green'])} never-green, {len(a['at_bound'])} "
        f"at the {STALE_AFTER}-round bound, {len(a['already_stale'])} "
        f"ALREADY STALE) -> slack {a['slack']}"
    )
    if a["already_stale"]:
        print(f"  !! stale oracles (missed their bound): {a['already_stale']}")
    if a["missing_from_window"]:
        print(f"  !! obligated but NOT in window: {a['missing_from_window']}")
    print(
        f"  next round (r{a['upcoming_round'] + 1}) inherits "
        f"{a['next_round_cohort_size']} bound rows + this round's "
        "new/changed"
    )
    return 1 if a["missing_from_window"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
