"""Gate-freshness report: when did each registry entry last hold a
driver-gate slot (a green row in CORRECTNESS_r{N}.json)?

The correctness gate runs only the first 50 registry entries per round,
so slots ROTATE (operators/__init__.py _GATE_TAIL); the stated bar is a
driver-green row per operator, refreshed oldest-first.  This report is
the rotation's bookkeeping: it reads every CORRECTNESS_r*.json in the
repo root and prints, per entry, the latest round with a green row —
flagging entries that have NEVER held a slot and the oldest-evidence
cohort that should rotate next.

Usage: python tools/gate_freshness.py [--limit N] [--enforce N]

``--enforce N`` (round-10 verdict #6 — the CI floor, wired into
tools/run_tests.sh with N=6): exit 1 if any entry's newest driver
evidence is more than N rounds older than the repo's latest
CORRECTNESS round AND the entry is not in the current gate head (a
head entry refreshes at the driver's next run, so it satisfies the
floor "at the next gate rotation opportunity").  Never-gated entries
must likewise be in the head.
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


def _untracked_evidence() -> list[str]:
    """CORRECTNESS files present on disk but not committed.

    Round-11 ADVICE: the floor computes "latest round" from the files it
    can see, so an *untracked* CORRECTNESS_r{N}.json makes CI at a fresh
    checkout silently enforce against round N-1 while the working tree
    (and any docs citing round N) believe the floor covers N.  Fail
    loudly instead: evidence a round cites must be committed with it.
    """
    import subprocess

    paths = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))
    try:
        tracked = set(
            subprocess.run(
                ["git", "-C", "/root/repo", "ls-files", "CORRECTNESS_r*.json"],
                capture_output=True,
                text=True,
                check=True,
            ).stdout.split()
        )
    except (OSError, subprocess.CalledProcessError):
        return []  # not a git checkout (e.g. exported tree): nothing to check
    return [p for p in paths if os.path.basename(p) not in tracked]


def enforce(max_age: int) -> int:
    """CI floor: 0 when every entry is fresh enough or queued in the
    head for the next driver run; 1 otherwise (offenders printed)."""
    untracked = _untracked_evidence()
    if untracked:
        print(
            "gate-freshness floor CANNOT BE TRUSTED: driver evidence on disk"
            " is not committed (a fresh checkout would silently enforce"
            " against an older round). Commit these with the round that"
            " cites them:"
        )
        for p in untracked:
            print(f"  {os.path.basename(p)}")
        return 1
    fresh = freshness()
    head = {n for n in registry() if n not in _GATE_TAIL}
    latest = max((r for r in fresh.values() if r is not None), default=0)
    bad = sorted(
        n
        for n, r in fresh.items()
        if n not in head and (r is None or latest - r > max_age)
    )
    if bad:
        print(
            f"gate-freshness floor VIOLATED (latest driver round r{latest:02d},"
            f" max age {max_age}): {len(bad)} tail entries overdue —"
            " rotate them into the head (operators/__init__.py _GATE_TAIL):"
        )
        for n in bad:
            r = fresh[n]
            print(f"  {'never' if r is None else f'r{r:02d}'}  {n}")
        return 1
    print(
        f"gate-freshness floor ok (latest r{latest:02d}, max age {max_age},"
        f" {len(head)} head slots)"
    )
    return 0


def main() -> None:
    if "--enforce" in sys.argv:
        sys.exit(enforce(int(sys.argv[sys.argv.index("--enforce") + 1])))
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
