"""PII redaction for training corpora (C16 extension).

The reference has no redaction surface (its pipeline ships raw
extracted text to the index, ``embedding_utils.py:200-236``); scrubbing
contact/identifier strings is a standard pre-training curation step, so
it is implemented here as a first-class map-only operator.

Design for 100 TB: redaction is a cascade of JVM-side
``regexp_replace`` expressions — no UDF, no shuffle, whole-stage
codegen, and Catalyst pushes any upstream filter past it onto the scan.
Patterns are deliberately RE2-compatible (no backrefs, no lookaround)
so the DuckDB oracle runs the exact same regex dialect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Redaction cascade, applied in declaration order (earlier patterns
#: consume their text before later ones see it — e.g. the phone rule
#: cannot eat an IPv4 because IPv4 runs first). Keys are the tags
#: substituted into the replacement token.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — the dot-TLD anchor keeps plain '@' mentions.
    # BOUNDED quantifiers (r16 ReDoS review, measured): the unbounded
    # form was quadratic on '@'-bearing unbroken runs — 4s for ONE
    # 20 KB base64-ish blob in Spark's Java regex, hours for a 1 MB
    # one, and such blobs exist in any web-scale corpus. Bounds are
    # set FAR ABOVE the deliverable limits (RFC 5321: local 64,
    # domain 255) so real addresses AND over-limit quasi-addresses
    # (SRS-rewritten forwards and the like) still redact FULLY — a
    # tight local bound partially matched a 70-char local and leaked
    # its leading chars (r16 fix-chain review). Only degenerate
    # >320-char runs partially match; per-start backtracking is
    # <= ~600 chars -> linear scans.
    "email": r"[A-Za-z0-9._%+-]{1,320}@[A-Za-z0-9.-]{1,255}\.[A-Za-z]{2,24}",
    # 123-45-6789 (US SSN shape) before ipv4/phone so neither eats it
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    # +country digit runs, 8+ digits, at most ONE space/dash between
    # digits — a bounded separator keeps the match from greedily
    # chaining across unrelated digit groups ("+1 555-0100  123")
    "phone": r"\+\d(?:[\- ]?\d){7,}",
}


def redaction_token(tag: str) -> str:
    return f"[PII:{tag}]"


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    out_col: str | None = None,
    count: bool = True,
) -> DataFrame:
    """Replace every PII match with ``[PII:<tag>]`` and (optionally)
    count matches per tag.

    Counts are taken on the ORIGINAL text per pattern (order-
    independent, oracle-friendly); replacement is the ordered cascade.
    Because counts see the pre-cascade text while earlier patterns may
    consume characters later patterns would also match (digit runs
    shared between ssn/ipv4/phone shapes), ``sum(n_pii_*)`` can exceed
    the number of ``[PII:*]`` tokens actually emitted — the counts are
    per-pattern match totals, not a token audit.
    Adds ``{out_col}`` (default overwrites ``text_col``) and, with
    ``count=True``, one ``n_pii_<tag>`` int column per pattern.
    """
    patterns = PII_PATTERNS if patterns is None else patterns
    out_col = out_col or text_col
    src = F.col(text_col)
    red: Column = src
    for tag, pat in patterns.items():
        red = F.regexp_replace(red, pat, redaction_token(tag))
    # counts reference the ORIGINAL column, so they must be projected in
    # the same select that (possibly) overwrites it — not after.
    counts = (
        [
            F.regexp_count(src, F.lit(pat)).cast("int").alias(f"n_pii_{tag}")
            for tag, pat in patterns.items()
        ]
        if count
        else []
    )
    if out_col == text_col:
        keep = [df[c] for c in df.columns if c != text_col]
    else:
        keep = [df[c] for c in df.columns]
    return df.select(*keep, red.alias(out_col), *counts)
