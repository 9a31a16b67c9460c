#!/usr/bin/env python
"""Twin-parity regex lint (r12, from the r11 QUERY_RE lesson).

The URL/quality expression layers share regex CONSTANTS between the
Spark codegen exprs and their DuckDB oracle twins (single source of
truth). The r10 QUERY_RE bug showed the failure mode such constants
hide: an unbounded negated class skipping text ahead of a literal
``?`` or ``#`` delimiter that does NOT also exclude the OTHER
delimiter lets the span swallow it (a ``?`` inside a fragment parsed
as a query) — and because BOTH engines share the constant, the oracle
can't catch it. This lint encodes the invariant mechanically:

    in every shared ``*_RE`` constant, an unbounded negated class
    ``[^...]*`` immediately followed by a literal ``\\?`` must exclude
    ``#`` (and one followed by ``#`` must exclude ``?``).

Zero behavior change; run standalone (``python tools/twin_lint.py``)
or via tests/test_twin_lint.py.
"""

from __future__ import annotations

import re

#: modules whose module-level *_RE string constants are shared by the
#: Spark exprs and the DuckDB twins
SHARED_CONSTANT_MODULES = (
    "data_ingestion_tool_bakasura__spark.functions.urls",
    "data_ingestion_tool_bakasura__spark.functions.quality",
)

_CLASS_BEFORE_Q = re.compile(r"\[\^([^\]]*)\]\*(?:\\\?)")
_CLASS_BEFORE_H = re.compile(r"\[\^([^\]]*)\]\*(?:#)")


def lint_pattern(name: str, pattern: str) -> list[str]:
    """Findings for one shared regex constant (empty = clean)."""
    out = []
    for m in _CLASS_BEFORE_Q.finditer(pattern):
        if "#" not in m.group(1):
            out.append(
                f"{name}: negated class [^{m.group(1)}]* before a literal"
                " '?' does not exclude '#' — a '?' inside a fragment"
                " would be misparsed (the QUERY_RE lesson)"
            )
    for m in _CLASS_BEFORE_H.finditer(pattern):
        if "?" not in m.group(1):
            out.append(
                f"{name}: negated class [^{m.group(1)}]* before a literal"
                " '#' does not exclude '?' — a '#' inside a query would"
                " be misparsed"
            )
    return out


def shared_re_constants(module_name: str) -> dict[str, str]:
    import importlib
    import sys
    from pathlib import Path

    repo = str(Path(__file__).resolve().parent.parent)
    if repo not in sys.path:  # standalone `python tools/twin_lint.py`
        sys.path.insert(0, repo)
    mod = importlib.import_module(module_name)
    return {
        n: v
        for n, v in vars(mod).items()
        if n.endswith("_RE") and isinstance(v, str) and not n.startswith("_")
    }


def run() -> list[str]:
    findings: list[str] = []
    n = 0
    for module_name in SHARED_CONSTANT_MODULES:
        consts = shared_re_constants(module_name)
        n += len(consts)
        for name, pattern in sorted(consts.items()):
            findings.extend(lint_pattern(f"{module_name}.{name}", pattern))
    if not n:
        findings.append("no shared *_RE constants found — lint is dead code")
    return findings


if __name__ == "__main__":
    found = run()
    for f in found:
        print("FINDING:", f)
    print(f"{len(found)} finding(s)")
    raise SystemExit(1 if found else 0)
