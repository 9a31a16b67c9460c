"""Learned byte-pair-encoding tokenizer (round 10): upgrades C16's
token accounting from the ``n_tokens_bpe`` regex *approximation* to a
real learned subword vocabulary (Sennrich et al. 2016), so token
budgets / packing / mixture math can run against the tokenizer a model
will actually train with.

Division of labor, the standard one (HF ``tokenizers`` trains the same
way): Spark does the corpus-sized work — ONE explode -> groupBy(word)
count, map-side-combined, capped to the ``max_words`` most frequent
words (top-k, no global sort) — and the driver runs the classic merge
loop over that bounded word-frequency table only. The corpus is never
re-scanned per merge; driver memory is ``max_words`` rows, not corpus
rows. Encoding ships the merge ranks once per executor inside an
Arrow-batched pandas UDF.

No oracle query by design (the merge loop is not SQL-expressible);
certified by paper-example merges, a pure-python cross-check, and an
encode-roundtrip property test in ``tests/test_bpe.py``.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestion_tool_bakasura__spark.functions.text import normalize_text

#: end-of-word marker (paper convention: distinguishes 'est</w>' in
#: 'widest' from 'est' in 'establish')
EOW = "</w>"


def word_counts(df: DataFrame, text_col: str = "text",
                max_words: int = 50_000, lowercase: bool = True) -> DataFrame:
    """(word, n) for the ``max_words`` most frequent whitespace words.

    One explode + one map-side-combined aggregation; the cap is a
    TakeOrderedAndProject (scalar rows), so nothing corpus-sized ever
    sorts or reaches the driver."""
    txt = normalize_text(text_col)
    if lowercase:
        txt = F.lower(txt)
    words = df.select(F.explode(F.split(txt, " ")).alias("word")).filter(
        F.col("word") != ""
    )
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(max_words)
    )


def _merge_loop(freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE over a word-frequency dict: repeatedly merge the
    most frequent adjacent symbol pair (ties broken lexicographically
    for determinism). Pure python, O(n_merges * words)."""
    words = {tuple(list(w) + [EOW]): n for w, n in freqs.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break  # nothing left that actually repeats
        merges.append((a, b))
        ab = a + b
        new_words = {}
        for sym, cnt in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + cnt
        words = new_words
    return merges


def bpe_train(df: DataFrame, text_col: str = "text", n_merges: int = 1000,
              max_words: int = 50_000, lowercase: bool = True) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge list (the model — JSON-serializable)."""
    freqs = {r["word"]: r["n"] for r in word_counts(df, text_col, max_words, lowercase).collect()}
    return _merge_loop(freqs, n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, lowest-rank (earliest-learned) pair
    first — the canonical BPE encode order."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode_udf(merges: list[tuple[str, str]], lowercase: bool = True):
    """Arrow-batched UDF: text -> array<string> of BPE tokens. The
    ranks dict rides the closure (serialized once per executor)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    ws = re.compile(r"\s+")

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _enc(s: pd.Series) -> pd.Series:
        def one(t):
            t = ws.sub(" ", t or "").strip()
            if lowercase:
                t = t.lower()
            out: list[str] = []
            for w in t.split(" "):
                if w:
                    out.extend(encode_word(w, ranks))
            return out

        return s.map(one)

    return _enc


def n_tokens_learned(text_col: Column | str, merges: list[tuple[str, str]],
                     lowercase: bool = True) -> Column:
    """Token count under the LEARNED vocabulary — drop-in for
    ``textstats.n_tokens_ws/n_tokens_bpe`` in budget/packing math."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(bpe_encode_udf(merges, lowercase)(col))
