"""Mechanical bench adjudication against BASELINE.md's band table.

Every round's BENCH json used to be adjudicated by hand: read the
band table, eyeball each row, then apply the contention rule
(BASELINE.md methodology — a run whose median per-query ratio vs a
healthy same-host run is ≳1.3× is uniformly host-elevated and is
EXCLUDED from per-query band adjudication). The r15 driver run was
exactly such a run, and the call lived in prose. This tool makes the
call one command (r15 verdict #2):

1. parses the authoritative band table out of ``BASELINE.md`` (the
   table is the single source of truth — no second copy of the pins);
2. classifies every query of the given run: LOW / ok / HIGH / NEW
   (no band yet);
3. runs the contention test against a reference settled run (default:
   the newest ``BENCH_local_r*.json``), printing the median/min/max
   per-query ratio and the verdict:
   - ``SETTLED``   median ratio ≤ 1.15 — bands adjudicate raw;
   - ``ELEVATED``  1.15 < median < 1.3 — readable with care;
   - ``CONTENDED`` median ≥ 1.3 — per BASELINE.md the run is host
     noise; per-query HIGHs do not count against the code.

Exit status: 2 if a SETTLED/ELEVATED run has HIGH rows (a genuine
band violation to investigate), else 0. A CONTENDED run exits 0 —
its HIGHs are environment, not code; rerun when the host is quiet.

Usage::

    python tools/adjudicate_bench.py BENCH_r16.json
    python tools/adjudicate_bench.py BENCH_r16.json --ref BENCH_local_r15.json
    python tools/adjudicate_bench.py BENCH_r17.json --confirm BENCH_local_r17.json

``--confirm`` (r16 verdict #7) takes a SECOND reading of the same
tree: a HIGH row that reads in-band there is reclassified "noise"
(the per-query spread of a settled run is 0.69-1.56x) and no longer
fails the run — only HIGHs that reproduce in both readings exit 2.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_ROW = re.compile(
    r"^\|\s*(q_\w+)\s*\|\s*([0-9.]+)-([0-9.]+)\s*\|"
)
_TOTAL = re.compile(
    r"^\|\s*\*\*suite total[^|]*\*\*\s*\|\s*\*\*([0-9.]+)-([0-9.]+)\*\*\s*\|"
)

SETTLED_MAX = 1.15
CONTENDED_MIN = 1.3


def parse_bands(baseline_md: str) -> tuple[dict[str, tuple[float, float]], tuple[float, float] | None]:
    """The band table rows (query -> (lo, hi)) + the suite-total band."""
    bands: dict[str, tuple[float, float]] = {}
    total: tuple[float, float] | None = None
    with open(baseline_md) as f:
        for line in f:
            m = _ROW.match(line)
            if m:
                bands[m.group(1)] = (float(m.group(2)), float(m.group(3)))
                continue
            t = _TOTAL.match(line)
            if t:
                total = (float(t.group(1)), float(t.group(2)))
    if not bands:
        raise SystemExit(f"no band table rows found in {baseline_md!r}")
    return bands, total


def classify(
    run: dict, bands: dict[str, tuple[float, float]]
) -> dict[str, tuple[str, float, tuple[float, float] | None]]:
    """Per-query verdict: LOW / ok / HIGH / NEW (no band)."""
    out: dict[str, tuple[str, float, tuple[float, float] | None]] = {}
    for q, sec in run.get("queries", {}).items():
        band = bands.get(q)
        if band is None:
            out[q] = ("NEW", sec, None)
        elif sec < band[0]:
            out[q] = ("LOW", sec, band)
        elif sec > band[1]:
            out[q] = ("HIGH", sec, band)
        else:
            out[q] = ("ok", sec, band)
    return out


def ratios(run: dict, ref: dict) -> list[float]:
    """Per-query run/ref ratios over the common queries (ref > 0 only)."""
    rq, fq = run.get("queries", {}), ref.get("queries", {})
    return sorted(
        rq[q] / fq[q] for q in rq.keys() & fq.keys() if fq.get(q)
    )


def contention_verdict(rs: list[float]) -> tuple[str, float]:
    if not rs:
        return ("NO-REF", float("nan"))
    # true median (r16 fix-chain review): the upper-middle element on
    # an even-length list could flip the verdict at a threshold
    import statistics

    med = float(statistics.median(rs))
    if med >= CONTENDED_MIN:
        return ("CONTENDED", med)
    if med > SETTLED_MAX:
        return ("ELEVATED", med)
    return ("SETTLED", med)


def newest_local_bench(repo: str, exclude: str | None = None) -> str | None:
    """Newest settled local run, optionally excluding the run under
    test (self-comparison proves nothing)."""
    cands = [
        p for p in glob.glob(os.path.join(repo, "BENCH_local_r*.json"))
        if exclude is None or os.path.abspath(p) != os.path.abspath(exclude)
    ]

    def rnd(p: str) -> int:
        m = re.search(r"r0*(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    return max(cands, key=rnd) if cands else None


def _payload(d: dict) -> dict:
    """Unwrap a driver BENCH_r*.json ({'n','rc','tail','parsed',...})
    to the bench payload; a local run IS the payload already."""
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        return d["parsed"]
    return d


def adjudicate(
    run_path: str,
    ref_path: str | None,
    baseline_md: str,
    confirm_path: str | None = None,
) -> int:
    run = _payload(json.load(open(run_path)))
    bands, total_band = parse_bands(baseline_md)
    verdicts = classify(run, bands)
    # --confirm (r16 verdict #7): a second reading of the same tree.
    # A HIGH that reads in-band there is per-row noise of a settled
    # run (observed spread 0.69-1.56x), not a band violation — the
    # cross-referencing the r16 judge did by hand, mechanized.
    confirm = (
        classify(_payload(json.load(open(confirm_path))), bands)
        if confirm_path else {}
    )

    ref = _payload(json.load(open(ref_path))) if ref_path else None
    rs = ratios(run, ref) if ref else []
    verdict, med = contention_verdict(rs)

    print(f"run: {run_path}  ({run.get('n_ok', '?')} ok / "
          f"{run.get('n_err', '?')} err, total {run.get('value')}s, "
          f"load_start {run.get('load_start')})")
    if ref and rs:
        print(f"ref: {ref_path}")
        print(f"contention test: median ratio {med:.3f} "
              f"(min {rs[0]:.2f}, max {rs[-1]:.2f}, "
              f"{len(rs)} common queries) -> {verdict}")
    else:
        print("contention test: no reference run -> NO-REF "
              "(band verdicts below are unadjusted)")

    counts: dict[str, int] = {}
    confirmed_noise = 0
    for q in sorted(verdicts):
        v, sec, band = verdicts[q]
        note = ""
        if v == "HIGH" and q in confirm and confirm[q][0] in ("ok", "LOW"):
            v = "noise"
            confirmed_noise += 1
            note = (f" — per-row noise (confirmed in-band at "
                    f"{confirm[q][1]} by {confirm_path})")
        counts[v] = counts.get(v, 0) + 1
        if v in ("HIGH", "NEW", "noise"):
            b = f"{band[0]}-{band[1]}" if band else "(no band)"
            print(f"  {v:4s} {q}: {sec} vs {b}{note}")
    if total_band and isinstance(run.get("value"), (int, float)):
        tv = run["value"]
        tflag = ("ok" if total_band[0] <= tv <= total_band[1]
                 else "LOW" if tv < total_band[0] else "HIGH")
        print(f"suite total: {tv} vs {total_band[0]}-{total_band[1]} -> {tflag}")
    keys = ("ok", "LOW", "HIGH", "NEW") + (("noise",) if confirm else ())
    print("rows:", " ".join(f"{k}={counts.get(k, 0)}" for k in keys))

    highs = counts.get("HIGH", 0)
    if highs and verdict == "CONTENDED":
        print(f"verdict: CONTENDED run — {highs} HIGH row(s) are host "
              "noise per BASELINE.md's exclusion rule; rerun settled.")
        return 0
    if highs:
        print(f"verdict: {verdict} run with {highs} HIGH row(s) — "
              "genuine band violations, investigate.")
        return 2
    print(f"verdict: {verdict} run, zero band-hi violations "
          "(LOW is not a flag).")
    return 0


def main(argv: list[str]) -> int:
    # argparse (r16 fix-chain review): the hand-rolled scan silently
    # dropped the '--ref=PATH' form (falling back to the wrong
    # reference) and crashed on a trailing bare '--ref'
    import argparse

    ap = argparse.ArgumentParser(
        prog="adjudicate_bench",
        description="Classify a BENCH json against BASELINE.md's band "
                    "table and the median-ratio contention rule.",
    )
    ap.add_argument("run", help="BENCH json to adjudicate")
    ap.add_argument("--ref", default=None,
                    help="settled reference run (default: newest "
                         "BENCH_local_r*.json other than the run itself)")
    ap.add_argument("--confirm", default=None,
                    help="second reading of the same tree: a HIGH row "
                         "that is in-band here is auto-labeled per-row "
                         "noise and does not fail the run")
    ns = ap.parse_args(argv)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ref = ns.ref or newest_local_bench(repo, exclude=ns.run)
    return adjudicate(ns.run, ref, os.path.join(repo, "BASELINE.md"),
                      confirm_path=ns.confirm)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
