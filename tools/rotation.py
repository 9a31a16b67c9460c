"""Driver-evidence rotation ledger, computed instead of hand-kept.

Reads every ``CORRECTNESS_r*.json`` in the repo root, derives each
catalog query's NEWEST driver-green round, and prints:

1. the evidence distribution (how many queries sit at each round);
2. the stalest queries in catalog order — the candidates that should
   lead the next round's 50-query window;
3. any catalog query with no driver row ever (new queries — these go
   first), and any driver-checked name that has dropped out of the
   catalog (a rename that silently lost its history).

Usage: ``python tools/rotation.py [N]`` (N = how many stale rows to
list, default 30). The actual window lives in
``plans/catalog.py::_PRIORITY`` — this tool is the evidence behind
each round's reordering, the thing BASELINE.md's ledger used to track
by hand.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def evidence(repo: str) -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r0*(\d+)", os.path.basename(f))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(f))
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            ok = isinstance(row, dict) and row.get("rows_match") and not row.get("err")
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 30
    sys.path.insert(0, repo)
    from data_ingestion_tool_bakasura__spark.plans.catalog import ORACLE, QUERIES

    latest = evidence(repo)
    cat = list(QUERIES)

    dist: dict[int | None, int] = {}
    for q in cat:
        dist[latest.get(q)] = dist.get(latest.get(q), 0) + 1
    print("evidence distribution (newest driver-green round -> queries):")
    for rnd in sorted(dist, key=lambda r: (r is None, r)):
        label = "never" if rnd is None else f"r{rnd}"
        print(f"  {label}: {dist[rnd]}")

    never = [q for q in cat if q not in latest]
    if never:
        kind = lambda q: "oracle" if q in ORACLE else "rows-only"
        print("\nno driver row ever (lead the next window; rows-only sit last):")
        for q in never:
            print(f"  {q} [{kind(q)}]")

    ranked = sorted((q for q in cat if q in latest), key=lambda q: (latest[q], cat.index(q)))
    print(f"\nstalest {top_n} (evidence round, catalog position):")
    for q in ranked[:top_n]:
        print(f"  r{latest[q]}  #{cat.index(q):3d}  {q}")

    orphans = sorted(set(latest) - set(cat))
    if orphans:
        print("\nWARNING — driver-checked names missing from the catalog "
              "(rename lost its history?):")
        for q in orphans:
            print(f"  {q} (last green r{latest[q]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
