"""Compose the next round's driver window from the recorded evidence.

The correctness driver hashes only ``queries()[:50]`` in dict order, so
each round's ``_ROUND{N}_WINDOW`` (harness.py) must front-load every
oracle-backed query that has never held a green driver row — the
meta-test in tests/test_oracle_parity.py enforces exactly that. This
script automates the composition (r5 verdict item 2: compose at session
END so registry growth can never outrun verification):

* never-driver-executed queries claim the front, registry order
  preserved — BOTH tiers: oracle-backed lanes and rows-only
  (``no_oracle``) lanes rotate on the same staleness discipline
  (round 11 verdict item 1: "registered" must always imply
  "driver-executed, recently" — rows-only lanes used to be skipped
  by this composer and sat 8 rounds stale);
* remaining slots fill with re-verification candidates, oldest
  evidence first (least-recently-verified — the queries whose green
  row is most stale; a rows-only lane's ``no_oracle`` rows-green row
  is its evidence, via the shared ``correctness_row_green``).

Prints a ready-to-paste Python list plus the accounting. Purely
read-only: edits to harness.py stay a deliberate human action.

Usage: python scripts/compose_window.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vector_database_in_rust_spark import harness  # noqa: E402

WINDOW_SIZE = 50


def last_verified_round() -> dict[str, int]:
    """query -> highest round number with a green driver row."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if harness.correctness_row_green(row):
                out[name] = max(out.get(name, 0), rnd)
    return out


def main() -> None:
    verified = last_verified_round()
    registered = list(harness.QUERIES)
    never = [q for q in registered if q not in verified]
    if len(never) > WINDOW_SIZE:
        print(
            f"ERROR: {len(never)} never-verified queries do "
            f"not fit one {WINDOW_SIZE}-slot window — stop registering",
            file=sys.stderr,
        )
        sys.exit(1)
    stale_first = sorted(
        (q for q in registered if q in verified),
        key=lambda q: (verified[q], registered.index(q)),
    )
    window = never + stale_first[: WINDOW_SIZE - len(never)]
    print(f"# {len(never)} never-verified + "
          f"{len(window) - len(never)} least-recently-verified refills")
    print("_ROUND_NEXT_WINDOW = [")
    for q in window:
        tier = "" if q in harness.ORACLES else " (rows-only)"
        tag = (
            f"never executed{tier}"
            if q not in verified
            else f"last green r{verified[q]:02d}{tier}"
        )
        print(f'    "{q}",  # {tag}')
    print("]")
    left_out = stale_first[WINDOW_SIZE - len(never):]
    if left_out:
        horizon = verified[left_out[0]]
        n_at_horizon = sum(1 for q in left_out if verified[q] == horizon)
        print(
            f"\n# left out: {len(left_out)} lanes; stalest left-out "
            f"evidence r{horizon:02d} ({n_at_horizon} lanes at that round "
            "— they head the NEXT window)",
            file=sys.stderr,
        )
    n_oracle = len([q for q in registered if q in harness.ORACLES])
    print(
        f"# registry: {len(registered)} queries, "
        f"{n_oracle} oracle-backed, "
        f"{len(verified)} driver-verified",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
