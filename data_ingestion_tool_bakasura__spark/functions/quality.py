"""Web-page quality filters (crawl-curation leg, round 11): C4-style
line cleaning (Raffel et al. 2020, the C4.en heuristics) and the
Gopher/MassiveText document-quality rules (Rae et al. 2021, App. A) —
the per-page gates a Common-Crawl-scale training-data pipeline runs
between HTML extraction and dedup.

Design, same contract as :mod:`.urls`: every op is a pure Spark
*Column expression* (higher-order ``filter``/``transform``/
``aggregate`` over split arrays — JVM-side, codegen'd, ZERO exchanges,
no Python in the hot path), and each has a DuckDB SQL *twin* generated
from the SAME constants (``c4_*_sql`` / ``gopher_*_sql``) so the
oracle queries in ``plans/crawl_q.py`` cannot drift from the
implementation. At 100 TB these are map-only passes: a page is scored
by the partition that already holds it, nothing shuffles until the
downstream dedup.

Rule set (constants below are the single source for both engines):

C4 (line level, then document level):
  * keep a line only if it has >= ``C4_MIN_LINE_WORDS`` words, ends in
    terminal punctuation (``.
    ! ? "``), and does not match the boilerplate pattern
    (javascript / cookie / policy notices);
  * drop the whole page when it mentions "lorem ipsum", contains a
    curly brace (code), or the cleaned page has fewer than
    ``C4_MIN_SENTENCES`` sentences.

Gopher (document level):
  * ``GOPHER_MIN_WORDS`` <= word count <= ``GOPHER_MAX_WORDS``;
  * mean word length in [``GOPHER_MIN_MEAN_WL``, ``GOPHER_MAX_MEAN_WL``];
  * symbol-to-word ratio (``#`` and ``...``) <= ``GOPHER_MAX_SYMBOL_RATIO``;
  * <= ``GOPHER_MAX_BULLET_FRAC`` of lines start with a bullet;
  * <= ``GOPHER_MAX_ELLIPSIS_FRAC`` of lines end with an ellipsis;
  * >= ``GOPHER_MIN_ALPHA_FRAC`` of words contain an alphabetic char;
  * >= ``GOPHER_MIN_STOPWORD_HITS`` distinct required stopwords appear.

The reference never filters page quality (its inputs are curated
uploads); this family comes from the mandated training-data-pipeline
extension list, like :mod:`.urls`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- shared constants (single source for Spark AND the oracle) ------------

#: a C4-kept line must have at least this many words ...
C4_MIN_LINE_WORDS = 3
#: ... and the cleaned page at least this many sentences
C4_MIN_SENTENCES = 5
#: line must END in terminal punctuation (no single quote: keeps the
#: constant embeddable in single-quoted SQL literals verbatim)
TERMINAL_RE = r'[.!?"]$'
#: boilerplate lines removed outright (C4 removes any line with the
#: word "javascript"; cookie/policy notices are the RefinedWeb add-on)
C4_BAD_LINE_RE = r"(?i)javascript|cookie (policy|notice)|privacy policy|terms of use"
#: pages mentioning lorem ipsum are dropped whole
LOREM_RE = r"(?i)lorem ipsum"
#: sentence terminators counted for the >= C4_MIN_SENTENCES gate
SENTENCE_RE = r"[.!?]"

#: Gopher App. A thresholds
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WL = 3.0
GOPHER_MAX_MEAN_WL = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2
#: the Gopher "required word" list
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
#: line starts with a bullet marker
BULLET_RE = r"^(- |\* |•)"
#: line ends with an ellipsis
ELLIPSIS_RE = r"(\.\.\.|…)$"
#: a word "counts as alphabetic" when it has at least one letter
ALPHA_RE = r"[a-zA-Z]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- building blocks ------------------------------------------------------

def page_lines(col: Column | str) -> Column:
    """Array of raw lines (split on newline, nothing trimmed)."""
    return F.split(_c(col), "\n")


def page_words(col: Column | str) -> Column:
    """Array of non-empty whitespace-separated words of the page."""
    return F.filter(
        F.split(F.trim(F.regexp_replace(_c(col), r"\s+", " ")), " "),
        lambda w: w != "",
    )


def _line_word_count(line: Column) -> Column:
    return F.size(F.filter(F.split(F.trim(line), " "), lambda w: w != ""))


def _c4_line_keep(line: Column) -> Column:
    return (
        (_line_word_count(line) >= C4_MIN_LINE_WORDS)
        & F.trim(line).rlike(TERMINAL_RE)
        & ~line.rlike(C4_BAD_LINE_RE)
    )


# --- C4: line cleaning + document gates -----------------------------------

def c4_clean(col: Column | str) -> Column:
    """Page text with only the C4-kept lines, newline-joined ('' when
    every line drops). One codegen'd expression — no exchange."""
    return F.array_join(F.filter(page_lines(col), _c4_line_keep), "\n")


def c4_kept_line_count(col: Column | str) -> Column:
    return F.size(F.filter(page_lines(col), _c4_line_keep))


def c4_line_count(col: Column | str) -> Column:
    return F.size(page_lines(col))


def sentence_count(col: Column | str) -> Column:
    """Number of sentence terminators (. ! ?) in the text."""
    t = _c(col)
    return F.size(F.split(t, SENTENCE_RE)) - F.lit(1)


def c4_doc_keep(col: Column | str) -> Column:
    """Document-level C4 gate, applied to the RAW page: no lorem
    ipsum, no curly brace, and the *cleaned* page still has at least
    ``C4_MIN_SENTENCES`` sentences."""
    raw = _c(col)
    return (
        ~raw.rlike(LOREM_RE)
        & ~raw.contains("{")
        & (sentence_count(c4_clean(raw)) >= C4_MIN_SENTENCES)
    )


# --- Gopher: document-quality signals -------------------------------------

def gopher_n_words(col: Column | str) -> Column:
    return F.size(page_words(col))


def gopher_mean_word_len(col: Column | str) -> Column:
    ws = page_words(col)
    total = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(F.size(ws) > 0, total / F.size(ws)).otherwise(F.lit(0.0))


def gopher_alpha_frac(col: Column | str) -> Column:
    ws = page_words(col)
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike(ALPHA_RE)))
    return F.when(F.size(ws) > 0, n_alpha / F.size(ws)).otherwise(F.lit(0.0))


def gopher_symbol_ratio(col: Column | str) -> Column:
    """(# count + ellipsis count) / word count."""
    t = _c(col)
    n_hash = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    n_ell = (F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))) / F.lit(3)
    n_w = gopher_n_words(col)
    return F.when(n_w > 0, (n_hash + n_ell) / n_w).otherwise(F.lit(0.0))


def gopher_bullet_frac(col: Column | str) -> Column:
    ls = page_lines(col)
    n_b = F.size(F.filter(ls, lambda x: F.trim(x).rlike(BULLET_RE)))
    return F.when(F.size(ls) > 0, n_b / F.size(ls)).otherwise(F.lit(0.0))


def gopher_ellipsis_frac(col: Column | str) -> Column:
    ls = page_lines(col)
    n_e = F.size(F.filter(ls, lambda x: F.trim(x).rlike(ELLIPSIS_RE)))
    return F.when(F.size(ls) > 0, n_e / F.size(ls)).otherwise(F.lit(0.0))


def gopher_stopword_hits(col: Column | str) -> Column:
    """How many of the eight required stopwords appear as a word."""
    ws = page_words(col)
    req = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    return F.size(F.filter(req, lambda s: F.array_contains(ws, s)))


def gopher_keep(col: Column | str) -> Column:
    """All Gopher gates combined (signals individually available above
    for reporting / threshold tuning)."""
    n_w = gopher_n_words(col)
    mwl = gopher_mean_word_len(col)
    return (
        n_w.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mwl.between(GOPHER_MIN_MEAN_WL, GOPHER_MAX_MEAN_WL)
        & (gopher_symbol_ratio(col) <= GOPHER_MAX_SYMBOL_RATIO)
        & (gopher_bullet_frac(col) <= GOPHER_MAX_BULLET_FRAC)
        & (gopher_ellipsis_frac(col) <= GOPHER_MAX_ELLIPSIS_FRAC)
        & (gopher_alpha_frac(col) >= GOPHER_MIN_ALPHA_FRAC)
        & (gopher_stopword_hits(col) >= GOPHER_MIN_STOPWORD_HITS)
    )


# --- DuckDB twins (oracle side; same constants, same semantics) ----------
# Spark's split() drops NOTHING here that DuckDB's string_split keeps:
# both return [''] for '' input, so size/len twins agree on empties.

def _lines_sql(e: str) -> str:
    return f"string_split({e}, chr(10))"


def _words_sql(e: str) -> str:
    return (
        "list_filter(string_split(trim(regexp_replace("
        f"{e}, '\\s+', ' ', 'g')), ' '), w -> w <> '')"
    )


def _line_keep_sql() -> str:
    """Lambda-body predicate over line variable ``x``."""
    return (
        f"len(list_filter(string_split(trim(x), ' '), w -> w <> '')) >= {C4_MIN_LINE_WORDS}"
        f" AND regexp_matches(trim(x), '{TERMINAL_RE}')"
        f" AND NOT regexp_matches(x, '{C4_BAD_LINE_RE}')"
    )


def c4_clean_sql(e: str) -> str:
    return (
        f"coalesce(array_to_string(list_filter({_lines_sql(e)}, "
        f"x -> {_line_keep_sql()}), chr(10)), '')"
    )


def c4_kept_line_count_sql(e: str) -> str:
    return f"len(list_filter({_lines_sql(e)}, x -> {_line_keep_sql()}))"


def c4_line_count_sql(e: str) -> str:
    return f"len({_lines_sql(e)})"


def sentence_count_sql(e: str) -> str:
    return f"(len(regexp_split_to_array({e}, '{SENTENCE_RE}')) - 1)"


def c4_doc_keep_sql(e: str) -> str:
    return (
        f"(NOT regexp_matches({e}, '{LOREM_RE}')"
        f" AND position('{{' IN {e}) = 0"
        f" AND {sentence_count_sql(c4_clean_sql(e))} >= {C4_MIN_SENTENCES})"
    )


def gopher_n_words_sql(e: str) -> str:
    return f"len({_words_sql(e)})"


def gopher_mean_word_len_sql(e: str) -> str:
    ws = _words_sql(e)
    return (
        f"CASE WHEN len({ws}) > 0 THEN "
        f"list_sum(list_transform({ws}, w -> length(w))) / len({ws})::DOUBLE "
        "ELSE 0.0 END"
    )


def gopher_alpha_frac_sql(e: str) -> str:
    ws = _words_sql(e)
    return (
        f"CASE WHEN len({ws}) > 0 THEN "
        f"len(list_filter({ws}, w -> regexp_matches(w, '{ALPHA_RE}'))) / len({ws})::DOUBLE "
        "ELSE 0.0 END"
    )


def gopher_symbol_ratio_sql(e: str) -> str:
    n_hash = f"(length({e}) - length(regexp_replace({e}, '#', '', 'g')))"
    n_ell = f"(length({e}) - length(regexp_replace({e}, '\\.\\.\\.', '', 'g'))) / 3.0"
    n_w = gopher_n_words_sql(e)
    return (
        f"CASE WHEN {n_w} > 0 THEN ({n_hash} + {n_ell}) / {n_w}::DOUBLE ELSE 0.0 END"
    )


def gopher_bullet_frac_sql(e: str) -> str:
    ls = _lines_sql(e)
    return (
        f"CASE WHEN len({ls}) > 0 THEN "
        f"len(list_filter({ls}, x -> regexp_matches(trim(x), '{BULLET_RE}'))) / len({ls})::DOUBLE "
        "ELSE 0.0 END"
    )


def gopher_ellipsis_frac_sql(e: str) -> str:
    ls = _lines_sql(e)
    return (
        f"CASE WHEN len({ls}) > 0 THEN "
        f"len(list_filter({ls}, x -> regexp_matches(trim(x), '{ELLIPSIS_RE}'))) / len({ls})::DOUBLE "
        "ELSE 0.0 END"
    )


def gopher_stopword_hits_sql(e: str) -> str:
    req = "[" + ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS) + "]"
    return f"len(list_filter({req}, s -> list_contains({_words_sql(e)}, s)))"


def gopher_keep_sql(e: str) -> str:
    return (
        f"({gopher_n_words_sql(e)} BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}"
        f" AND {gopher_mean_word_len_sql(e)} BETWEEN {GOPHER_MIN_MEAN_WL} AND {GOPHER_MAX_MEAN_WL}"
        f" AND {gopher_symbol_ratio_sql(e)} <= {GOPHER_MAX_SYMBOL_RATIO}"
        f" AND {gopher_bullet_frac_sql(e)} <= {GOPHER_MAX_BULLET_FRAC}"
        f" AND {gopher_ellipsis_frac_sql(e)} <= {GOPHER_MAX_ELLIPSIS_FRAC}"
        f" AND {gopher_alpha_frac_sql(e)} >= {GOPHER_MIN_ALPHA_FRAC}"
        f" AND {gopher_stopword_hits_sql(e)} >= {GOPHER_MIN_STOPWORD_HITS})"
    )
