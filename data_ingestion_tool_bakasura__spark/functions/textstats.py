"""Text analysis functions (C16 extension surface).

Language-ID (stopword-hit heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish regex),
document fingerprinting — all pure Column expressions (JVM-side,
codegen) over the ``documents`` table. These are the per-document
scoring passes a 100 TB training-data pipeline runs before filtering;
because they are stateless row-local expressions they pipeline with the
scan and add no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "es": ("el", "la", "de", "y", "en", "que", "los", "un", "por", "con"),
    "fr": ("le", "la", "de", "et", "en", "que", "les", "un", "pour", "dans"),
    "de": ("der", "die", "das", "und", "in", "von", "zu", "den", "mit", "ist"),
}

#: BPE-ish token pattern: word pieces, numbers, or single non-space symbols.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens_ws(col: Column | str) -> Column:
    """Whitespace tokens of the trimmed text (array<string>)."""
    return F.split(F.trim(_c(col)), r"\s+")


def n_tokens_ws(col: Column | str) -> Column:
    """Whitespace token count; 0 for blank or NULL text.

    NULL must coalesce to '' BEFORE the split: ``size(split(NULL))``
    is -1 under Spark's legacy ``sizeOfNull`` while SQL oracles
    exclude NULL from SUM — a silent -1-per-NULL-doc divergence
    (ADVICE r7)."""
    t = F.trim(F.coalesce(_c(col), F.lit("")))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def n_tokens_bpe(col: Column | str) -> Column:
    """BPE-ish token count: words + numbers + individual symbols.

    ``regexp_count`` against :data:`BPE_TOKEN_RE`; a cheap, deterministic
    stand-in for a real tokenizer's token budget at corpus-filter time.
    """
    return F.regexp_count(_c(col), F.lit(BPE_TOKEN_RE))


def punct_count(col: Column | str) -> Column:
    """Number of punctuation chars (.,;:!?)."""
    return F.length(F.regexp_replace(_c(col), r"[^.,;:!?]", ""))


def punct_ratio(col: Column | str) -> Column:
    c = _c(col)
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        punct_count(c) / F.length(c).cast("double")
    )


def stopword_count(col: Column | str, lang: str = "en") -> Column:
    """Tokens that are stopwords of ``lang`` (array filter, JVM-side)."""
    sw = STOPWORDS[lang]
    return F.size(
        F.filter(tokens_ws(col), lambda t: F.lower(t).isin(*sw))
    )


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    n = n_tokens_ws(col)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        stopword_count(col, lang) / n.cast("double")
    )


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: rewards mid-length docs and
    stopword presence, penalizes punctuation soup. Deterministic and
    SQL-expressible (oracle-checked), like a C4/Gopher-style filter."""
    c = _c(col)
    len_score = F.least(F.length(c).cast("double") / F.lit(1000.0), F.lit(1.0))
    sw_score = F.least(stopword_ratio(c) * 5.0, F.lit(1.0))
    p_penalty = F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    return F.round(0.5 * len_score + 0.5 * sw_score - 0.25 * p_penalty, 6)


def lang_guess(col: Column | str) -> Column:
    """Stopword-hit language ID over the :data:`STOPWORDS` lists.

    Picks the language with the most stopword hits; ties and zero hits
    fall back to 'und'. Pure Column expression -> one pass, no UDF.
    """
    c = _c(col)
    toks = tokens_ws(c)

    # closure factory: the filter lambda must take exactly one arg —
    # `lambda t, sw=sw:` reads as an (element, index) lambda to
    # PySpark's arity introspection and binds sw to the index Column
    def _hits(sw: tuple[str, ...]) -> Column:
        return F.size(F.filter(toks, lambda t: F.lower(t).isin(*sw)))

    hits = [_hits(sw).alias(lang) for lang, sw in STOPWORDS.items()]
    best = F.greatest(*hits)
    guess = F.lit("und")
    # later languages win ties deterministically in reverse declaration order
    for (lang, _), h in zip(STOPWORDS.items(), hits):
        guess = F.when((h == best) & (best > 0), F.lit(lang)).otherwise(guess)
    return guess


def fingerprint(col: Column | str, prefix_len: int = 128) -> Column:
    """Document fingerprint: md5 over the normalized text prefix.

    A cheap rolling-hash-style identity for clustering exact-prefix
    duplicates without hashing whole multi-MB docs."""
    c = _c(col)
    return F.md5(F.substring(F.trim(F.regexp_replace(c, r"\s+", " ")), 1, prefix_len))


def corpus_report(df, text_col: str = "text"):
    """Dataset-card accounting in ONE scan + one 1-row aggregation:
    volume (docs/tokens/chars), integrity (NULL-text count), exact-dup
    rate via countDistinct(md5(text)), diversity (langs/sources when
    present) and mean heuristic quality. The catalog's
    q_corpus_report delegates here and value-checks every column vs
    DuckDB; tools/curate_cli.py publishes it per run."""
    t = F.coalesce(_c(text_col), F.lit(""))
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum(_c(text_col).isNull().cast("long")).alias("n_null_text"),
        F.sum(n_tokens_ws(text_col)).cast("bigint").alias("n_tokens"),
        F.sum(F.length(t)).cast("bigint").alias("n_chars"),
        F.countDistinct(F.md5(t)).alias("n_distinct_texts"),
    ]
    for col in ("lang", "source"):
        if col in df.columns:
            aggs.append(F.countDistinct(col).alias(f"n_{col}s"))
    # score the COALESCED text so NULL-text docs count as quality 0.0 in
    # the average (matching the `t` expression above and the q_corpus_report
    # DuckDB oracle) instead of being silently skipped by avg's NULL rule
    aggs.append(F.round(F.avg(quality_score(t)), 6).alias("avg_quality"))
    return df.agg(*aggs).withColumn(
        "dup_rate", F.round(1 - F.col("n_distinct_texts") / F.col("n_docs"), 6)
    )
