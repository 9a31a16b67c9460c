"""Learned BPE (functions/bpe.py): paper-example merges, encode
roundtrip, determinism, plan shape of the word-count stage."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.functions import bpe as B


def test_merge_loop_paper_example():
    """Sennrich et al. 2016 §3.2 toy vocab: the first merges fuse the
    frequent 'es'/'est' suffix of newest/widest."""
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = B._merge_loop(freqs, 4)
    assert merges[0] == ("e", "s")       # 9 occurrences
    assert merges[1] == ("es", "t")      # 9
    assert merges[2] == ("est", B.EOW)   # 9
    assert ("l", "o") in merges[:4]      # 7


def test_encode_word_applies_ranks_in_order():
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    ranks = {m: i for i, m in enumerate(B._merge_loop(freqs, 10))}
    assert B.encode_word("lowest", ranks)[-1] == "est" + B.EOW
    assert "".join(B.encode_word("unseen", ranks)) == "unseen" + B.EOW


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="abcd ", min_size=1, max_size=30), min_size=1, max_size=8))
def test_encode_roundtrip_property(texts):
    """Concatenating a word's BPE tokens (minus the EOW marker) always
    reconstructs the word, whatever was learned."""
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    if not freqs:
        return
    ranks = {m: i for i, m in enumerate(B._merge_loop(freqs, 20))}
    for w in freqs:
        toks = B.encode_word(w, ranks)
        assert "".join(toks) == w + B.EOW


def test_bpe_train_and_count_on_spark(spark):
    rows = [(i, "the lowest slowest newest widest rates " * 3) for i in range(10)] + [
        (100, None),
        (101, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    wc = B.word_counts(df, max_words=100)
    plan = wc._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # cap is top-k, not a sort

    merges = B.bpe_train(df, n_merges=30, max_words=100)
    assert merges and all(isinstance(m, tuple) and len(m) == 2 for m in merges)
    # distributed training == pure-python training on the same counts
    freqs = {r["word"]: r["n"] for r in wc.collect()}
    assert merges == B._merge_loop(freqs, 30)

    out = df.select(
        "doc_id",
        B.n_tokens_learned("text", merges).alias("n_learned"),
        F.size(F.split(F.trim(F.coalesce("text", F.lit(""))), r"\s+")).alias("n_ws"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # a learned vocab on a repetitive corpus compresses below ws tokens*chars
    assert 0 < by_id[0]["n_learned"] <= len("the lowest slowest newest widest rates " * 3)
    assert by_id[100]["n_learned"] == 0 and by_id[101]["n_learned"] == 0
