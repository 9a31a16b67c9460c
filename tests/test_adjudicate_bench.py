"""tools/adjudicate_bench.py — mechanical bench adjudication (r15
verdict #2). Pure-Python: no Spark session needed."""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import adjudicate_bench as AB  # noqa: E402

BASELINE = os.path.join(REPO, "BASELINE.md")


def test_band_table_parses_all_suite_rows():
    bands, total = AB.parse_bands(BASELINE)
    # the authoritative table holds one row per suite member + a total
    assert len(bands) >= 63
    assert total is not None and total[0] < total[1]
    lo, hi = bands["q_pricing_summary"]
    assert (lo, hi) == (2.0, 2.4)
    for q, (b_lo, b_hi) in bands.items():
        assert b_lo <= b_hi, q


def test_classify_low_ok_high_new():
    bands = {"q_a": (1.0, 2.0), "q_b": (1.0, 2.0), "q_c": (1.0, 2.0)}
    run = {"queries": {"q_a": 0.5, "q_b": 1.5, "q_c": 2.5, "q_new": 3.0}}
    v = AB.classify(run, bands)
    assert v["q_a"][0] == "LOW"
    assert v["q_b"][0] == "ok"
    assert v["q_c"][0] == "HIGH"
    assert v["q_new"][0] == "NEW" and v["q_new"][2] is None


def test_contention_rule_matches_baseline_methodology():
    # BASELINE.md: median per-query ratio >= ~1.3 vs a healthy run is
    # host contention; <= ~1.15 adjudicates raw
    assert AB.contention_verdict([1.0, 1.02, 1.05])[0] == "SETTLED"
    assert AB.contention_verdict([1.2, 1.22, 1.25])[0] == "ELEVATED"
    assert AB.contention_verdict([1.4, 1.42, 1.45])[0] == "CONTENDED"
    assert AB.contention_verdict([])[0] == "NO-REF"


def test_driver_wrapper_payload_unwraps():
    wrapped = {"n": 16, "rc": 0, "tail": "...",
               "parsed": {"queries": {"q_a": 1.0}, "value": 1.0}}
    assert AB._payload(wrapped) == wrapped["parsed"]
    plain = {"queries": {"q_a": 1.0}, "value": 1.0}
    assert AB._payload(plain) is plain


def _write(tmp_path, name, payload):
    p = str(tmp_path / name)
    with open(p, "w") as f:
        json.dump(payload, f)
    return p


def test_contended_run_exits_zero_settled_high_exits_two(tmp_path, capsys):
    bands, _ = AB.parse_bands(BASELINE)
    qs = dict(list(bands.items())[:10])
    ref = {"queries": {q: (lo + hi) / 2 for q, (lo, hi) in qs.items()},
           "value": 10.0, "n_ok": 10, "n_err": 0}
    # uniformly 1.5x the reference: several rows breach band-hi, but
    # the median-ratio rule classifies the run CONTENDED -> exit 0
    contended = {"queries": {q: round(s * 1.5, 3) for q, s in ref["queries"].items()},
                 "value": 15.0, "n_ok": 10, "n_err": 0}
    ref_p = _write(tmp_path, "ref.json", ref)
    con_p = _write(tmp_path, "contended.json", contended)
    assert AB.adjudicate(con_p, ref_p, BASELINE) == 0
    assert "CONTENDED" in capsys.readouterr().out

    # one genuine spike on an otherwise settled run -> exit 2
    spiked = {"queries": dict(ref["queries"]), "value": 11.0,
              "n_ok": 10, "n_err": 0}
    worst = next(iter(qs))
    spiked["queries"][worst] = qs[worst][1] * 3
    sp_p = _write(tmp_path, "spiked.json", spiked)
    assert AB.adjudicate(sp_p, ref_p, BASELINE) == 2
    out = capsys.readouterr().out
    assert "SETTLED" in out and "HIGH" in out


def test_real_r15_adjudication_reproduces_the_judged_call():
    """The r15 verdict's call — driver run CONTENDED (median ~1.36 vs
    the settled local run), settled local run zero band-hi — must fall
    out of the tool mechanically. Bands are re-pinned DOWNWARD when a
    later optimization round genuinely speeds a query up (r18: IVF
    sample-fit, video checkpoint share points), so the r15-era run is
    only held to rows whose band has NOT been re-pinned since r15 —
    a historical run cannot be expected inside a band tightened by
    later code it never ran."""
    import re

    driver = os.path.join(REPO, "BENCH_r15.json")
    local = os.path.join(REPO, "BENCH_local_r15.json")
    if not (os.path.exists(driver) and os.path.exists(local)):
        pytest.skip("r15 bench artifacts not in tree")
    run = AB._payload(json.load(open(driver)))
    ref = AB._payload(json.load(open(local)))
    rs = AB.ratios(run, ref)
    verdict, med = AB.contention_verdict(rs)
    assert verdict == "CONTENDED"
    assert 1.3 <= med <= 1.45
    bands, _ = AB.parse_bands(BASELINE)
    repinned_after_r15 = set()
    row = re.compile(r"^\|\s*(q_\w+)\s*\|[^|]*\|([^|]*)\|")
    with open(BASELINE) as fh:
        for line in fh:
            m = row.match(line)
            if m and re.search(r"r1[6-9]\d* re-pin|r[2-9]\d+ re-pin",
                               m.group(2)):
                repinned_after_r15.add(m.group(1))
    high = [q for q, (v, _s, _b) in AB.classify(ref, bands).items() if v == "HIGH"]
    stale_highs = [q for q in high if q not in repinned_after_r15]
    assert stale_highs == []  # clean vs every band of its own era


def test_true_median_on_even_length_lists():
    """r16 fix-chain review: rs[n//2] is the upper-middle element on
    an even-length list and could flip the verdict at a threshold;
    the true median (mean of the middle pair) adjudicates."""
    # middle pair 1.29/1.31: true median 1.30 -> CONTENDED boundary
    verdict, med = AB.contention_verdict([1.0, 1.29, 1.31, 1.32])
    assert med == pytest.approx(1.30)
    assert verdict == "CONTENDED"
    # middle pair 1.13/1.15: median 1.14 -> SETTLED (upper-mid 1.15 too)
    verdict2, med2 = AB.contention_verdict([1.0, 1.13, 1.15, 1.16])
    assert med2 == pytest.approx(1.14) and verdict2 == "SETTLED"


def test_cli_accepts_ref_equals_form(tmp_path, capsys):
    """r16 fix-chain review: '--ref=PATH' was silently dropped by the
    hand-rolled scan (adjudicating against the wrong reference) and a
    trailing bare '--ref' crashed; argparse handles both."""
    import json

    bands, _ = AB.parse_bands(BASELINE)
    q = next(iter(bands))
    lo, hi = bands[q]
    payload = {"queries": {q: (lo + hi) / 2}, "value": 1.0,
               "n_ok": 1, "n_err": 0}
    run = tmp_path / "run.json"
    ref = tmp_path / "ref.json"
    run.write_text(json.dumps(payload))
    ref.write_text(json.dumps(payload))
    assert AB.main([str(run), f"--ref={ref}"]) == 0
    out = capsys.readouterr().out
    assert str(ref) in out  # the = form reached the adjudication
    with pytest.raises(SystemExit):
        AB.main([str(run), "--ref"])  # trailing bare --ref: argparse error


def test_confirm_run_reclassifies_unreproduced_highs(tmp_path, capsys):
    """r16 verdict #7: a HIGH that reads in-band in a second reading
    of the same tree is per-row noise (settled-run spread 0.69-1.56x)
    — auto-labeled and excluded from the exit-2 verdict; a HIGH that
    REPRODUCES in the confirming run still fails."""
    baseline = tmp_path / "BASELINE.md"
    baseline.write_text(
        "| query | band (s) |\n|---|---|\n"
        "| q_a | 1.0-2.0 |\n| q_b | 1.0-2.0 |\n"
    )
    run = _write(tmp_path, "run.json",
                 {"queries": {"q_a": 2.5, "q_b": 2.5}, "value": 5.0})
    ref = _write(tmp_path, "ref.json",
                 {"queries": {"q_a": 2.4, "q_b": 2.4}, "value": 4.8})
    # confirm: q_a in-band (noise), q_b still high (genuine)
    confirm = _write(tmp_path, "confirm.json",
                     {"queries": {"q_a": 1.5, "q_b": 2.6}, "value": 4.1})
    rc = AB.adjudicate(run, ref, str(baseline), confirm_path=confirm)
    out = capsys.readouterr().out
    assert rc == 2  # q_b reproduced -> still a violation
    assert "per-row noise (confirmed in-band at 1.5" in out
    assert "noise=1" in out and "HIGH=1" in out

    # both confirmed in-band -> clean exit
    confirm2 = _write(tmp_path, "confirm2.json",
                      {"queries": {"q_a": 1.5, "q_b": 1.5}, "value": 3.0})
    rc2 = AB.adjudicate(run, ref, str(baseline), confirm_path=confirm2)
    out2 = capsys.readouterr().out
    assert rc2 == 0 and "noise=2" in out2 and "HIGH=0" in out2

    # and without --confirm nothing changes (no 'noise' column)
    rc3 = AB.adjudicate(run, ref, str(baseline))
    out3 = capsys.readouterr().out
    assert rc3 == 2 and "noise" not in out3
