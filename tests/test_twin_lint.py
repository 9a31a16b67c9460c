"""Twin-parity regex lint (tools/twin_lint.py, r12): the shared
Spark/DuckDB regex constants must keep the QUERY_RE anchoring
invariant — an unbounded negated class ahead of a literal '?' or '#'
delimiter must exclude the other delimiter, or both engines misparse
identically and the oracle is blind to it. No Spark session needed."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import twin_lint  # noqa: E402


def test_shared_constants_are_clean():
    assert twin_lint.run() == []


def test_lint_catches_the_query_re_bug_shape():
    """The exact r10 bug (pre-'?' span not excluding '#') is flagged;
    the fixed form is clean — the lint is live, not vacuous."""
    buggy = r"^[^?]*\?([^#]*)"       # pre-'?' class misses '#'
    fixed = r"^[^#?]*\?([^#]*)"
    assert twin_lint.lint_pattern("BUGGY_RE", buggy)
    assert twin_lint.lint_pattern("FIXED_RE", fixed) == []
    # the mirrored hazard: pre-'#' span must exclude '?'
    assert twin_lint.lint_pattern("BUGGY2_RE", r"[^x]*#([^?]*)")
    assert twin_lint.lint_pattern("FIXED2_RE", r"[^x?]*#([^?]*)") == []


def test_lint_sees_the_shared_modules():
    consts = {}
    for m in twin_lint.SHARED_CONSTANT_MODULES:
        consts.update(twin_lint.shared_re_constants(m))
    # the constants the r10/r11 lessons were about are actually covered
    assert "QUERY_RE" in consts and "PREFRAG_RE" in consts
