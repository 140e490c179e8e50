"""Plan-census regression gate: diff two PLANS.md snapshots.

The physical-plan census (`tools/plan_report.py`) is only useful if a
regression in it gets NOTICED — a new cartesian product or a join that
silently fell from broadcast-hash to sort-merge is exactly the class of
change that passes every correctness oracle and then dies at 100 TB.
This tool makes the census a gate::

    python tools/plan_diff.py OLD_PLANS.md NEW_PLANS.md [--max-exch-jump N]

Exit codes: 0 = no regressions; 1 = regressions found (printed).

Flagged as regressions:
- a query whose cartesian/nested-loop count INCREASED (new cartesians
  are never okay without an allowlist entry, which lives in
  tests/test_plan_audit.py and would fail there too — this catches the
  diff at review time, before a test run);
- a query whose hash-exchange count grew by more than
  ``--max-exch-jump`` (default 2; intentional restructures happen, a
  +3-shuffle surprise usually means a lost co-partitioning);
- a query that LOST its pushed filters (scan used to prune, now
  doesn't);
- a broadcast-hash join count that dropped while sort-merge grew (the
  classic silent fallback when a build side outgrew the threshold).

Added/removed queries are reported informationally, never as failures —
the registry grows every round.
"""

from __future__ import annotations

import re
import sys

ROW = re.compile(
    r"^\|\s*(?P<q>[\w.]+)\s*\|\s*(?P<exch>\d+|-)\s*\|\s*(?P<bhj>\d+|-)\s*"
    r"\|\s*(?P<smj>\d+|-)\s*\|\s*(?P<cart>\d+|-)\s*\|\s*(?P<pushed>yes|-)\s*\|"
)


def parse(path: str) -> dict[str, dict]:
    out: dict[str, dict] = {}
    with open(path) as f:
        for line in f:
            m = ROW.match(line)
            if not m or m.group("q") == "query":
                continue
            g = m.groupdict()
            if g["exch"] == "-":  # streaming rows carry no batch plan
                continue
            out[g["q"]] = {
                "exch": int(g["exch"]),
                "bhj": int(g["bhj"]),
                "smj": int(g["smj"]),
                "cart": int(g["cart"]),
                "pushed": g["pushed"] == "yes",
            }
    return out


def diff(old: dict, new: dict, max_exch_jump: int = 2):
    regressions, infos = [], []
    for q in sorted(set(old) - set(new)):
        infos.append(f"removed: {q}")
    for q in sorted(set(new) - set(old)):
        infos.append(f"added:   {q}")
    for q in sorted(set(old) & set(new)):
        o, n = old[q], new[q]
        if n["cart"] > o["cart"]:
            regressions.append(
                f"{q}: cartesian/nested-loop {o['cart']} -> {n['cart']}"
            )
        if n["exch"] - o["exch"] > max_exch_jump:
            regressions.append(
                f"{q}: hash exchanges {o['exch']} -> {n['exch']} "
                f"(jump > {max_exch_jump})"
            )
        if o["pushed"] and not n["pushed"]:
            regressions.append(f"{q}: pushed filters LOST at the scan")
        if n["bhj"] < o["bhj"] and n["smj"] > o["smj"]:
            regressions.append(
                f"{q}: broadcast-hash {o['bhj']} -> {n['bhj']} while "
                f"sort-merge {o['smj']} -> {n['smj']} (silent SMJ fallback?)"
            )
    return regressions, infos


def main(argv: list[str]) -> int:
    args = [a for a in argv if not a.startswith("--")]
    if len(args) != 2:
        print(__doc__)
        return 2
    jump = 2
    for a in argv:
        if a.startswith("--max-exch-jump"):
            jump = int(a.split("=", 1)[1] if "=" in a else argv[argv.index(a) + 1])
    old, new = parse(args[0]), parse(args[1])
    regressions, infos = diff(old, new, max_exch_jump=jump)
    for i in infos:
        print(f"# {i}")
    for r in regressions:
        print(f"REGRESSION {r}")
    print(f"{len(regressions)} regressions, {len(infos)} registry changes, "
          f"{len(set(old) & set(new))} queries compared")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
