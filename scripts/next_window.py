"""Compute the next round's DRIVER_PRIORITY window from the artifacts.

The driver checks the FIRST 50 registry entries each round
(`queries/__init__.py::DRIVER_PRIORITY` reorders them), and rounds 5-6
showed the rotation drifting from prose when rebuilt by hand. This
prints the mechanical inputs for the next window, straight from the
committed `CORRECTNESS_r*.json` artifacts:

1. never-driver-checked queries (MUST lead the window — the r7
   invariant: every registered query has a driver-green row);
2. queries whose LATEST driver check failed (need a fresh green);
3. every other query ranked by staleness (oldest last-green round
   first) — the refresh-slot ordering.

What it cannot know: which bodies/oracles changed this round (those
need fresh greens regardless of an old row) — take that from
`git log --stat` and the session's own edits.

Usage: PYTHONPATH=. python scripts/next_window.py [--slots 50]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jubilant_garbanzo_spark.queries import load_all  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=50)
    args = ap.parse_args()

    specs = load_all()
    last_green: dict[str, int] = {}
    last_status: dict[str, tuple[int, bool]] = {}
    # Sort by PARSED round number, not filename: a lexicographic sort
    # would order an unpadded CORRECTNESS_r10.json before _r9.json and
    # let the r9 row overwrite the newer r10 status (ADVICE r7). The
    # max()-folds below make the result ordering-independent anyway.
    artifacts = sorted(
        (
            (int(re.search(r"\d+", f).group()), f)
            for f in os.listdir(REPO)
            if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
        ),
    )
    for rnd, path in artifacts:
        with open(os.path.join(REPO, path)) as fh:
            for name, row in json.load(fh).items():
                ok = bool(
                    row.get("rows_match")
                    and row.get("schema_match")
                    # rows-only queries (no oracle) carry hash_match=None
                    and row.get("hash_match") is not False
                    and not row.get("err")
                )
                if name not in last_status or rnd >= last_status[name][0]:
                    last_status[name] = (rnd, ok)
                if ok:
                    last_green[name] = max(rnd, last_green.get(name, rnd))

    never = sorted(set(specs) - set(last_status))
    red = sorted(
        n for n, (_, ok) in last_status.items() if not ok and n in specs
    )
    stale = sorted(
        (n for n in specs if n in last_green and n not in red),
        key=lambda n: (last_green[n], n),
    )

    print(f"registry: {len(specs)} queries; window slots: {args.slots}\n")
    print(f"tier 1 — never driver-checked ({len(never)}):")
    for n in never:
        print(f"    {n}")
    print(f"\ntier 2 — latest check FAILED ({len(red)}):")
    for n in red:
        print(f"    {n} (last seen r{last_status[n][0]})")
    remaining = args.slots - len(never) - len(red)
    # Tier 3: the round's declared changed set (minus tier 1, which
    # already leads) — readable directly from the registry since r9's
    # pin test forces it to be maintained.
    from jubilant_garbanzo_spark.queries import CHANGED_THIS_ROUND

    tier3 = [n for n in CHANGED_THIS_ROUND if n not in set(never) | set(red)]
    remaining -= len(tier3)
    print(f"\ntier 3 — CHANGED_THIS_ROUND beyond tiers 1+2 ({len(tier3)}):")
    for n in tier3:
        print(f"    {n}")
    print(
        f"\ntier 4 — staleness-ranked refreshes for the ~{max(remaining, 0)} "
        f"remaining slots (oldest green first):"
    )
    for n in stale[: max(remaining, 0) + 10]:
        print(f"    {n} (green r{last_green[n]})")
    if len(never) + len(red) > args.slots:
        print(
            f"\nWARNING: tiers 1+2 alone ({len(never) + len(red)}) exceed "
            f"the {args.slots}-slot window — gate new operators on draining "
            "this queue (VERDICT r6 #1)."
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
