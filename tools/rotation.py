"""Regenerate the driver-gate rotation order (brink_spark/queries/__init__.py).

The round driver records hard CORRECTNESS rows for (at most) the FIRST 50
registry entries, so the registry's insertion order is the hard-signal
schedule. This tool computes the recommended order from the
CORRECTNESS_r*.json records in the repo root:

  tier 1: queries with no driver-green row from ANY round (new this round
          or missed by a past rotation) — these MUST sit inside the first
          50 or they stay hard-signal-untested forever (the round-3 and
          round-4 process miss);
  tier 2..: everything else, stalest newest-green-row first, ties broken
          by registry order.

Usage: python tools/rotation.py   (prints the ordered list; paste into
_DRIVER_GATE_ORDER, trimming to ~50 — entries past the gate keep their
prior green row and are still covered by tools/check_queries.py).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GATE_SLOTS = 50


def green_rows() -> dict[str, int]:
    """query name -> newest round with a fully-green driver row."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rec = json.load(f)
        for name, row in rec.items():
            if not isinstance(row, dict):
                continue
            ok = (
                row.get("rows_match")
                and row.get("hash_match", True)
                and not row.get("err")
            )
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    return last


def recommended_order() -> list[tuple[str, int]]:
    from brink_spark.queries import ALL_QUERIES

    last = green_rows()
    names = list(ALL_QUERIES)
    pos = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (last.get(n, 0), pos[n])), last


def main() -> None:
    order, last = recommended_order()
    never = [n for n in order if n not in last]
    print(f"# registry: {len(order)} queries; never driver-green: {len(never)}")
    if len(never) > GATE_SLOTS:
        print(
            f"# WARNING: {len(never)} never-checked queries exceed the "
            f"{GATE_SLOTS}-slot gate — some stay untested this round"
        )
    for i, n in enumerate(order):
        tag = "NEVER" if n not in last else f"r{last[n]}"
        gate = "gate" if i < GATE_SLOTS else "    "
        print(f"{i:3d} {gate} {tag:>5} {n}")


if __name__ == "__main__":
    main()
