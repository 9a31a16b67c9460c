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


# --- Gopher repetition rules (Rae et al. 2021, Table A1) ------------------
# The other half of the Gopher filter: pages that repeat themselves —
# duplicated lines/paragraphs, a looping top n-gram, heavy duplicate
# n-gram coverage. Same module contract as the quality rules above:
# every signal is ONE codegen'd Column expression (array higher-order
# functions over a single split — the top-n-gram mode is an
# array_sort + run-length aggregate, O(n log n), never O(n^2)) with a
# DuckDB twin generated from the SAME constants. Map-only at any
# scale: a page is scored by the partition that already holds it.
#
# Exact semantics (fixed here so both engines agree; the paper leaves
# them loose): lines = trimmed non-empty newline splits, paragraphs =
# trimmed non-empty splits on >= 2 consecutive newlines, words = the
# page_words() tokens, n-grams = space-joined sliding word windows.
# "dup fraction" counts occurrences BEYOND the first of each distinct
# element over the element count; "dup char fraction" counts the
# characters of those beyond-first occurrences over the RAW page char
# count (so overlapping n-grams can exceed 1 — the thresholds are
# ceilings, not probabilities); "top n-gram char fraction" is
# max(count * gram_chars) over distinct grams, over the page chars.

#: drop when more than this fraction of lines / paragraphs repeat one
#: already seen on the page
GOPHER_MAX_DUP_LINE_FRAC = 0.30
GOPHER_MAX_DUP_PARA_FRAC = 0.30
#: ... or when the repeats claim more than this fraction of the chars
GOPHER_MAX_DUP_LINE_CHAR_FRAC = 0.20
GOPHER_MAX_DUP_PARA_CHAR_FRAC = 0.20
#: most-frequent-n-gram char-coverage ceilings, n -> max fraction
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
#: duplicate-n-gram char-coverage ceilings, n -> max fraction
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def _nonempty_trimmed(arr: Column) -> Column:
    return F.filter(
        F.transform(arr, lambda x: F.trim(x)), lambda x: x != ""
    )


def rep_lines(col: Column | str) -> Column:
    """Trimmed, non-empty lines (the repetition rules' line unit)."""
    return _nonempty_trimmed(page_lines(col))


def rep_paragraphs(col: Column | str) -> Column:
    """Trimmed, non-empty paragraphs (split on >= 2 newlines)."""
    return _nonempty_trimmed(F.split(_c(col), r"\n{2,}"))


def word_ngrams(col: Column | str, n: int) -> Column:
    """Space-joined sliding word ``n``-grams ([] when under n words)."""
    ws = page_words(col)

    def _gram(i: Column) -> Column:
        return F.array_join(F.slice(ws, i, n), " ")

    return F.when(
        F.size(ws) >= n,
        F.transform(F.sequence(F.lit(1), F.size(ws) - n + 1), _gram),
    ).otherwise(F.array().cast("array<string>"))


def _char_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0), lambda acc, x: acc + F.length(x))


def _dup_elem_frac(arr: Column) -> Column:
    return F.when(
        F.size(arr) > 0,
        (F.size(arr) - F.size(F.array_distinct(arr))) / F.size(arr),
    ).otherwise(F.lit(0.0))


def _dup_char_frac(arr: Column, col: Column | str) -> Column:
    t = _c(col)
    return F.when(
        F.length(t) > 0,
        (_char_sum(arr) - _char_sum(F.array_distinct(arr))) / F.length(t),
    ).otherwise(F.lit(0.0))


def dup_line_frac(col: Column | str) -> Column:
    return _dup_elem_frac(rep_lines(col))


def dup_line_char_frac(col: Column | str) -> Column:
    return _dup_char_frac(rep_lines(col), col)


def dup_para_frac(col: Column | str) -> Column:
    return _dup_elem_frac(rep_paragraphs(col))


def dup_para_char_frac(col: Column | str) -> Column:
    return _dup_char_frac(rep_paragraphs(col), col)


def top_ngram_char_frac(col: Column | str, n: int) -> Column:
    """max(count * chars) of any word ``n``-gram over the page chars.
    Mode-of-array without O(n^2): sort the grams, then one O(n)
    run-length ``aggregate`` with a (prev, run, best) struct."""
    grams = F.array_sort(word_ngrams(col, n))
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def _merge(acc: Column, g: Column) -> Column:
        run2 = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            g.alias("prev"),
            run2.alias("run"),
            F.greatest(acc["best"], run2 * F.length(g)).alias("best"),
        )

    best = F.aggregate(grams, zero, _merge, lambda acc: acc["best"])
    t = _c(col)
    return F.when(F.length(t) > 0, best / F.length(t)).otherwise(F.lit(0.0))


def dup_ngram_char_frac(col: Column | str, n: int) -> Column:
    """Chars of beyond-first n-gram occurrences over the page chars
    (overlapping accounting — see the semantics note above)."""
    return _dup_char_frac(word_ngrams(col, n), col)


def gopher_rep_keep(col: Column | str) -> Column:
    """All Table A1 repetition gates combined."""
    k = (
        (dup_line_frac(col) <= GOPHER_MAX_DUP_LINE_FRAC)
        & (dup_line_char_frac(col) <= GOPHER_MAX_DUP_LINE_CHAR_FRAC)
        & (dup_para_frac(col) <= GOPHER_MAX_DUP_PARA_FRAC)
        & (dup_para_char_frac(col) <= GOPHER_MAX_DUP_PARA_CHAR_FRAC)
    )
    for n, mx in GOPHER_TOP_NGRAM_MAX.items():
        k = k & (top_ngram_char_frac(col, n) <= mx)
    for n, mx in GOPHER_DUP_NGRAM_MAX.items():
        k = k & (dup_ngram_char_frac(col, n) <= mx)
    return k


# --- DuckDB twins for the repetition rules --------------------------------

def _ne_trim_sql(a: str) -> str:
    return f"list_filter(list_transform({a}, nt -> trim(nt)), ne -> ne <> '')"


def _rep_lines_sql(e: str) -> str:
    return _ne_trim_sql(_lines_sql(e))


def _paras_sql(e: str) -> str:
    return _ne_trim_sql(f"regexp_split_to_array({e}, '\\n{{2,}}')")


def _char_sum_sql(a: str) -> str:
    return f"coalesce(list_sum(list_transform({a}, cs -> length(cs))), 0)"


def _dup_elem_frac_sql(a: str) -> str:
    return (
        f"CASE WHEN len({a}) > 0 THEN "
        f"(len({a}) - len(list_distinct({a}))) / len({a})::DOUBLE "
        "ELSE 0.0 END"
    )


def _dup_char_frac_sql(a: str, e: str) -> str:
    return (
        f"CASE WHEN length({e}) > 0 THEN "
        f"({_char_sum_sql(a)} - {_char_sum_sql(f'list_distinct({a})')})"
        f" / length({e})::DOUBLE ELSE 0.0 END"
    )


def dup_line_frac_sql(e: str) -> str:
    return _dup_elem_frac_sql(_rep_lines_sql(e))


def dup_line_char_frac_sql(e: str) -> str:
    return _dup_char_frac_sql(_rep_lines_sql(e), e)


def dup_para_frac_sql(e: str) -> str:
    return _dup_elem_frac_sql(_paras_sql(e))


def dup_para_char_frac_sql(e: str) -> str:
    return _dup_char_frac_sql(_paras_sql(e), e)


def grams_over_sql(ws: str, n: int) -> str:
    """Gram list over an already-bound words expression/column ``ws``
    — compose with a MATERIALIZED CTE when the page expression is
    expensive (DuckDB inlines plain CTEs, so an unbound twin would
    re-evaluate the page inside every lambda)."""
    return (
        f"CASE WHEN len({ws}) >= {n} THEN "
        f"list_transform(generate_series(1, len({ws}) - {n} + 1), "
        f"gi -> array_to_string(list_slice({ws}, gi, gi + {n} - 1), ' ')) "
        "ELSE CAST([] AS VARCHAR[]) END"
    )


def _grams_sql(e: str, n: int) -> str:
    return grams_over_sql(_words_sql(e), n)


def top_ngram_over_sql(g: str, e: str) -> str:
    """Top-gram char coverage over a bound gram list ``g`` and page
    ``e``. O(grams^2) nested-lambda mode — oracle-side only, where
    the fixture pages are small; the Spark leg is the O(n log n)
    sort + run-length aggregate."""
    best = (
        f"coalesce(list_max(list_transform(list_distinct({g}), "
        f"tg -> length(tg) * len(list_filter({g}, og -> og = tg)))), 0)"
    )
    return (
        f"CASE WHEN length({e}) > 0 THEN {best} / length({e})::DOUBLE "
        "ELSE 0.0 END"
    )


def top_ngram_char_frac_sql(e: str, n: int) -> str:
    return top_ngram_over_sql(_grams_sql(e, n), e)


def dup_ngram_over_sql(g: str, e: str) -> str:
    return _dup_char_frac_sql(g, e)


def dup_ngram_char_frac_sql(e: str, n: int) -> str:
    return _dup_char_frac_sql(_grams_sql(e, n), e)


def gopher_rep_keep_sql(e: str) -> str:
    parts = [
        f"{dup_line_frac_sql(e)} <= {GOPHER_MAX_DUP_LINE_FRAC}",
        f"{dup_line_char_frac_sql(e)} <= {GOPHER_MAX_DUP_LINE_CHAR_FRAC}",
        f"{dup_para_frac_sql(e)} <= {GOPHER_MAX_DUP_PARA_FRAC}",
        f"{dup_para_char_frac_sql(e)} <= {GOPHER_MAX_DUP_PARA_CHAR_FRAC}",
    ]
    for n, mx in GOPHER_TOP_NGRAM_MAX.items():
        parts.append(f"{top_ngram_char_frac_sql(e, n)} <= {mx}")
    for n, mx in GOPHER_DUP_NGRAM_MAX.items():
        parts.append(f"{dup_ngram_char_frac_sql(e, n)} <= {mx}")
    return "(" + " AND ".join(parts) + ")"


def page_words_sql(e: str) -> str:
    """Public twin of :func:`page_words` for CTE binding."""
    return _words_sql(e)


def gopher_rep_keep_over_sql(e: str, grams: dict) -> str:
    """Combined repetition gate over a bound page column ``e`` and
    pre-bound gram-list columns ``grams`` (n -> column name for every
    n in GOPHER_TOP_NGRAM_MAX and GOPHER_DUP_NGRAM_MAX) — the
    CTE-composable form of :func:`gopher_rep_keep_sql`, same
    constants, same leg helpers."""
    parts = [
        f"{dup_line_frac_sql(e)} <= {GOPHER_MAX_DUP_LINE_FRAC}",
        f"{dup_line_char_frac_sql(e)} <= {GOPHER_MAX_DUP_LINE_CHAR_FRAC}",
        f"{dup_para_frac_sql(e)} <= {GOPHER_MAX_DUP_PARA_FRAC}",
        f"{dup_para_char_frac_sql(e)} <= {GOPHER_MAX_DUP_PARA_CHAR_FRAC}",
    ]
    for n, mx in GOPHER_TOP_NGRAM_MAX.items():
        parts.append(f"{top_ngram_over_sql(grams[n], e)} <= {mx}")
    for n, mx in GOPHER_DUP_NGRAM_MAX.items():
        parts.append(f"{dup_ngram_over_sql(grams[n], e)} <= {mx}")
    return "(" + " AND ".join(parts) + ")"


# --- bound-column composition (the fast path for many signals) ------------
# Each expression above is self-contained: selecting many of them
# re-derives the word/gram arrays per signal (higher-order functions
# are CodegenFallback — no subexpression elimination ever merges
# them). When a frame needs SEVERAL repetition signals (the catalog
# query, web_quality_filter's 'rep' gate), bind the arrays once as
# real columns across chained projections — CollapseProject keeps a
# non-cheap expression bound when it is referenced more than once —
# and derive each signal, and the combined gate, from the bound
# columns. Same constants, same semantics, ~10x less work; still
# map-only with zero exchanges.

def ngrams_over(ws: Column, n: int) -> Column:
    """:func:`word_ngrams` over an already-bound words-array column."""

    def _gram(i: Column) -> Column:
        return F.array_join(F.slice(ws, i, n), " ")

    return F.when(
        F.size(ws) >= n,
        F.transform(F.sequence(F.lit(1), F.size(ws) - n + 1), _gram),
    ).otherwise(F.array().cast("array<string>"))


def dup_elem_frac_over(arr: Column) -> Column:
    """:func:`dup_line_frac`/:func:`dup_para_frac` over a bound array."""
    return _dup_elem_frac(arr)


def dup_char_frac_over(arr: Column, col: Column | str) -> Column:
    """Char-coverage dup fraction over a bound array + the raw page."""
    return _dup_char_frac(arr, col)


def top_ngram_char_frac_over(grams: Column, col: Column | str) -> Column:
    """:func:`top_ngram_char_frac` over a bound gram-list column."""
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def _merge(acc: Column, g: Column) -> Column:
        run2 = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            g.alias("prev"),
            run2.alias("run"),
            F.greatest(acc["best"], run2 * F.length(g)).alias("best"),
        )

    best = F.aggregate(F.array_sort(grams), zero, _merge, lambda acc: acc["best"])
    t = _c(col)
    return F.when(F.length(t) > 0, best / F.length(t)).otherwise(F.lit(0.0))


#: signal-column name -> threshold + direction, for gates derived from
#: bound signal columns (with_gopher_rep_signals emits exactly these)
GOPHER_REP_THRESHOLDS = {
    "dup_line_frac": GOPHER_MAX_DUP_LINE_FRAC,
    "dup_line_char_frac": GOPHER_MAX_DUP_LINE_CHAR_FRAC,
    "dup_para_frac": GOPHER_MAX_DUP_PARA_FRAC,
    "dup_para_char_frac": GOPHER_MAX_DUP_PARA_CHAR_FRAC,
    **{f"top_{n}gram_frac": mx for n, mx in GOPHER_TOP_NGRAM_MAX.items()},
    **{f"dup_{n}gram_frac": mx for n, mx in GOPHER_DUP_NGRAM_MAX.items()},
}


def with_gopher_rep_signals(df, text_col: str = "text", keep_col: str = "rep_keep"):
    """Append every Table A1 repetition signal (the
    :data:`GOPHER_REP_THRESHOLDS` columns, un-rounded) plus the
    combined ``keep_col`` gate to ``df``, computing each underlying
    array exactly once via bound columns. Map-only; intermediate
    array columns are dropped before return."""
    c = F.col(text_col)
    tmp = "__rep_"
    ns = sorted(set(GOPHER_TOP_NGRAM_MAX) | set(GOPHER_DUP_NGRAM_MAX))
    out = (
        df.withColumn(tmp + "words", page_words(c))
        .withColumn(tmp + "lines", rep_lines(c))
        .withColumn(tmp + "paras", rep_paragraphs(c))
    )
    for n in ns:
        out = out.withColumn(tmp + f"g{n}", ngrams_over(F.col(tmp + "words"), n))
    out = (
        out.withColumn("dup_line_frac", dup_elem_frac_over(F.col(tmp + "lines")))
        .withColumn("dup_line_char_frac", dup_char_frac_over(F.col(tmp + "lines"), c))
        .withColumn("dup_para_frac", dup_elem_frac_over(F.col(tmp + "paras")))
        .withColumn("dup_para_char_frac", dup_char_frac_over(F.col(tmp + "paras"), c))
    )
    for n in GOPHER_TOP_NGRAM_MAX:
        out = out.withColumn(
            f"top_{n}gram_frac", top_ngram_char_frac_over(F.col(tmp + f"g{n}"), c)
        )
    for n in GOPHER_DUP_NGRAM_MAX:
        out = out.withColumn(
            f"dup_{n}gram_frac", dup_char_frac_over(F.col(tmp + f"g{n}"), c)
        )
    keep = F.lit(True)
    for name, mx in GOPHER_REP_THRESHOLDS.items():
        keep = keep & (F.col(name) <= mx)
    out = out.withColumn(keep_col, keep)
    return out.drop(*[tmp + x for x in ["words", "lines", "paras"]],
                    *[tmp + f"g{n}" for n in ns])
