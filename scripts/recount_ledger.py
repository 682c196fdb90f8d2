#!/usr/bin/env python
"""Recount the driver-evidence ledger from the CORRECTNESS artifacts.

VERDICT r13 #3: mechanize the most error-prone manual step of each round —
walking CORRECTNESS_r01..r{N}.json by hand to find which registered queries
have the oldest external evidence. This script reads every artifact plus the
registry and emits, deterministically:

  * per-query latest-verified round (GREEN rows only),
  * the never-driver-verified set (must be empty in steady state),
  * evidence cohorts grouped by latest round, oldest first,

so ROTATION.md's next-round plan can cite one command's output instead of a
hand-walk. A row counts as GREEN when ``err`` is null, rows+schema match, and
the hash matched (``hash_match is True``) — or, for the weaker rows-only
check the driver records for non-oracled queries, ``hash_match is None``.

Usage:
    python scripts/recount_ledger.py            # human-readable report
    python scripts/recount_ledger.py --json     # machine-readable
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _green(row: dict) -> bool:
    if not isinstance(row, dict) or row.get("err") is not None:
        return False
    if not (row.get("rows_match") and row.get("schema_match")):
        return False
    return row.get("hash_match") in (True, None)


def recount(repo: Path = REPO) -> dict:
    artifacts = sorted(
        repo.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.stem).group(1)),
    )
    latest: dict[str, int] = {}
    greens: dict[str, int] = {}
    for path in artifacts:
        rnd = int(re.search(r"r(\d+)", path.stem).group(1))
        data = json.loads(path.read_text())
        for name, row in data.items():
            if _green(row):
                latest[name] = max(latest.get(name, 0), rnd)
                greens[name] = greens.get(name, 0) + 1

    sys.path.insert(0, str(repo))
    from proteus_spark import registry

    registry._import_all()
    registered = list(registry._ordered().keys())

    never = sorted(n for n in registered if n not in latest)
    cohorts: dict[int, list[str]] = {}
    for name in registered:
        if name in latest:
            cohorts.setdefault(latest[name], []).append(name)
    cohort_list = [
        {"round": rnd, "count": len(names), "queries": sorted(names)}
        for rnd, names in sorted(cohorts.items())
    ]
    return {
        "artifacts": [p.name for p in artifacts],
        "registered": len(registered),
        "never_driver_verified": never,
        "cohorts": cohort_list,
        "latest_round": {n: latest[n] for n in sorted(latest) if n in registered},
        "green_row_counts": {n: greens[n] for n in sorted(greens) if n in registered},
        "stale_rows": sorted(n for n in latest if n not in registered),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", action="store_true", help="emit machine-readable JSON")
    args = ap.parse_args()
    report = recount()
    if args.json:
        json.dump(report, sys.stdout, indent=1)
        print()
        return
    print(f"artifacts: {', '.join(report['artifacts'])}")
    print(f"registered queries: {report['registered']}")
    never = report["never_driver_verified"]
    print(f"never-driver-verified: {len(never)}" + (f" -> {' '.join(never)}" if never else " (empty)"))
    stale = report["stale_rows"]
    if stale:
        print(f"artifact rows for unregistered (retired) queries: {' '.join(stale)}")
    print("\nevidence cohorts (oldest first):")
    for c in report["cohorts"]:
        print(f"  r{c['round']:02d}-only ({c['count']:3d}): {' '.join(c['queries'])}")


if __name__ == "__main__":
    main()
