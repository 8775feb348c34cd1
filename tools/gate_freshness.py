"""Gate-freshness report: when did each registry entry last hold a
driver-gate slot (a green row in CORRECTNESS_r{N}.json)?

The correctness gate runs only the first 50 registry entries per round,
so slots ROTATE (operators/__init__.py _GATE_TAIL); the stated bar is a
driver-green row per operator, refreshed oldest-first.  This report is
the rotation's bookkeeping: it reads every CORRECTNESS_r*.json in the
repo root and prints, per entry, the latest round with a green row —
flagging entries that have NEVER held a slot and the oldest-evidence
cohort that should rotate next.

Usage: python tools/gate_freshness.py [--limit N]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

from mmeds_meta_spark.operators import _GATE_TAIL, registry  # noqa: E402


def freshness() -> dict[str, int | None]:
    """name -> latest round with a green driver row (None = never)."""
    latest: dict[str, int | None] = {name: None for name in registry()}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        rows = data.get("queries", data)
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if name not in latest or not isinstance(row, dict):
                continue
            ok = (
                row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True)
                and not row.get("err")
            )
            if ok and (latest[name] is None or rnd > latest[name]):
                latest[name] = rnd
    return latest


def main() -> None:
    limit = 25
    if "--limit" in sys.argv:
        limit = int(sys.argv[sys.argv.index("--limit") + 1])
    fresh = freshness()
    head = [n for n in registry() if n not in _GATE_TAIL]
    never = sorted(n for n, r in fresh.items() if r is None)
    print(f"{len(fresh)} entries; {len(head)} in the current gate head")
    print(f"\nNEVER driver-gated ({len(never)}):")
    for n in never:
        marker = "  [in current head -> gates next run]" if n in head else ""
        print(f"  {n}{marker}")
    gated = sorted(
        ((r, n) for n, r in fresh.items() if r is not None),
    )
    print(f"\nOldest driver evidence (rotate these next, oldest first; top {limit}):")
    for r, n in gated[:limit]:
        marker = " [head]" if n in head else ""
        print(f"  r{r:02d}  {n}{marker}")


if __name__ == "__main__":
    main()
