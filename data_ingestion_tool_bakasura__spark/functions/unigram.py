"""Unigram-LM tokenizer (round 11): the OTHER learned-subword family
(Kudo 2018 — the SentencePiece algorithm), complementing the BPE
trainer in ``functions/bpe.py`` so token budgets / packing / mixture
math can target either tokenizer class a model might train with.

Division of labor — identical to BPE's (and HF ``tokenizers``): Spark
does the corpus-sized work (the ONE explode -> word-count aggregation
of ``bpe.word_counts``, capped to ``max_words`` rows) and the driver
runs EM over that bounded word-frequency table only. The corpus is
never re-scanned per iteration; encoding ships the piece log-prob
table once per executor inside an Arrow-batched pandas UDF.

Fidelity, stated honestly: this is the HARD-EM (Viterbi-EM) variant —
the E-step assigns each word its single best segmentation instead of
full forward-backward expectations, and pruning drops the
lowest-expected-count pieces instead of re-estimating the exact
likelihood loss per removal. Both are standard simplifications; the
model shape (piece -> log-prob, Viterbi decode, single-char fallback)
matches SentencePiece and the decode is exact Viterbi under the
learned probs.

No oracle query by design (EM is not SQL-expressible) — certified by
a planted-piece toy corpus, a lossless-roundtrip property, UDF==driver
decode parity, and OOV fallback tests in ``tests/test_unigram.py``.
"""

from __future__ import annotations

import math
import re

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestion_tool_bakasura__spark.functions.bpe import word_counts

#: SentencePiece word-boundary marker: pieces that START a word carry
#: it, so 'the' at word start and 'the' inside 'lathe' are distinct
#: pieces — exactly the ▁ convention real SentencePiece uses.
WB = "▁"


def _viterbi(word: str, logp: dict[str, float]) -> tuple[list[str], float]:
    """Best segmentation of ``word`` under piece log-probs: dp[i] =
    best score of the prefix of length i. Pieces absent from the model
    are unusable EXCEPT single characters, which fall back to a large
    penalty (UNK floor) so any string segments."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    maxlen = max((len(p) for p in logp), default=1)
    unk = min(logp.values(), default=-10.0) - 10.0
    for i in range(1, n + 1):
        for j in range(max(0, i - maxlen), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None and i - j == 1:
                lp = unk
            if lp is None or best[j] == -math.inf:
                continue
            s = best[j] + lp
            if s > best[i]:
                best[i], back[i] = s, j
    out, i = [], n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1], best[n]


def _seed(freqs: dict[str, int], max_piece_len: int, seed_size: int) -> dict[str, float]:
    """Initial piece inventory: every substring (up to
    ``max_piece_len``) of the counted words, scored by
    count * piece_len (the SentencePiece suffix-array seed heuristic,
    bounded here by the word table instead of the raw corpus); all
    single characters are always included."""
    scores: dict[str, int] = {}
    chars: set[str] = set()
    for w, n in freqs.items():
        chars.update(w)
        for i in range(len(w)):
            for k in range(2, min(max_piece_len, len(w) - i) + 1):
                p = w[i : i + k]
                scores[p] = scores.get(p, 0) + n * k
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    total = sum(s for _, s in top) + len(chars) or 1
    logp = {p: math.log(s / total) for p, s in top}
    floor = math.log(1.0 / total)
    for c in chars:
        logp.setdefault(c, floor)
    return logp


def _em(
    freqs: dict[str, int],
    vocab_size: int,
    n_iters: int,
    max_piece_len: int,
    prune_frac: float,
) -> dict[str, float]:
    logp = _seed(freqs, max_piece_len, seed_size=max(vocab_size * 4, 256))
    for _ in range(n_iters):
        # E: hard counts from each word's best segmentation
        counts: dict[str, float] = {}
        for w, n in freqs.items():
            pieces, _ = _viterbi(w, logp)
            for p in pieces:
                counts[p] = counts.get(p, 0.0) + n
        # M: renormalize over observed pieces (chars keep a floor so
        # the fallback path never dies)
        total = sum(counts.values()) or 1.0
        chars = {p for p in logp if len(p) == 1}
        new = {p: math.log(c / total) for p, c in counts.items() if c > 0}
        floor = math.log(0.5 / total)
        for c in chars:
            new.setdefault(c, floor)
        logp = new
        # prune: walk the worst multi-char pieces toward vocab_size,
        # at most prune_frac of them per iteration (gradual pruning,
        # ties broken lexicographically for determinism)
        multi = sorted(
            ((p, lp) for p, lp in logp.items() if len(p) > 1),
            key=lambda kv: (kv[1], kv[0]),
        )
        budget = max(vocab_size - len(chars), 0)
        excess = len(multi) - budget
        if excess > 0:
            n_drop = min(max(int(len(multi) * prune_frac), 1), excess)
            for p, _lp in multi[:n_drop]:
                del logp[p]
    # final clamp to vocab_size (keep all chars + best multis)
    chars = {p: lp for p, lp in logp.items() if len(p) == 1}
    multi = sorted(
        ((p, lp) for p, lp in logp.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(vocab_size - len(chars), 0)]
    return {**chars, **dict(multi)}


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 8000,
    max_words: int = 50_000,
    n_iters: int = 4,
    max_piece_len: int = 8,
    prune_frac: float = 0.25,
    lowercase: bool = True,
) -> dict[str, float]:
    """Learn a unigram-LM piece vocabulary from the corpus. Returns
    {piece: log-prob} (the model — JSON-serializable). Words carry the
    SentencePiece boundary marker, so the model distinguishes
    word-initial pieces."""
    freqs = {
        WB + r["word"]: r["n"]
        for r in word_counts(df, text_col, max_words, lowercase).collect()
    }
    return _em(freqs, vocab_size, n_iters, max_piece_len, prune_frac)


def encode_word(word: str, logp: dict[str, float]) -> list[str]:
    """Viterbi-decode one marker-prefixed word."""
    return _viterbi(word, logp)[0]


def unigram_encode_udf(model: dict[str, float], lowercase: bool = True):
    """Arrow-batched UDF: text -> array<string> of unigram pieces. The
    log-prob table rides the closure (shipped once per executor)."""
    ws = re.compile(r"\s+")
    logp = dict(model)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _enc(s: pd.Series) -> pd.Series:
        def one(t):
            t = ws.sub(" ", t or "").strip()
            if lowercase:
                t = t.lower()
            out: list[str] = []
            for w in t.split(" "):
                if w:
                    out.extend(_viterbi(WB + w, logp)[0])
            return out

        return s.map(one)

    return _enc


def n_tokens_unigram(
    text_col: Column | str, model: dict[str, float], lowercase: bool = True
) -> Column:
    """Token count under the learned unigram vocabulary — drop-in for
    ``n_tokens_learned`` / ``textstats.n_tokens_ws`` in budget math."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(unigram_encode_udf(model, lowercase)(col))
