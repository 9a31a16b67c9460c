"""Unigram-LM tokenizer (functions/unigram.py): planted-piece
learning, lossless roundtrip, Viterbi optimality vs brute force,
single-char OOV fallback, UDF==driver parity, budget-math wiring, and
the curate_cli leg."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.functions import unigram as UG


def _corpus(spark, rows):
    return spark.createDataFrame([(t,) for t in rows], ["text"])


def test_planted_piece_survives(spark):
    """A corpus dominated by 'ingestion'-family words must keep a
    multi-char piece covering the repeated stem; encoding a family
    word then uses fewer pieces than characters."""
    rows = ["ingestion ingests ingesting"] * 40 + ["zq xv"] * 2
    model = UG.unigram_train(
        _corpus(spark, rows), vocab_size=40, n_iters=4, max_words=100
    )
    assert any(len(p) >= 4 and "ingest" in p for p in model), sorted(
        model, key=model.get, reverse=True)[:10]
    pieces = UG.encode_word(UG.WB + "ingestion", model)
    assert "".join(pieces) == UG.WB + "ingestion"  # lossless
    assert len(pieces) < len("ingestion")          # compresses


def test_viterbi_matches_bruteforce():
    """Viterbi segmentation is the exact argmax over all 2^(n-1)
    segmentations under the model."""
    model = {UG.WB + "a": -1.0, "a": -2.0, "b": -2.5, "ab": -3.0,
             "ba": -1.5, UG.WB + "ab": -2.2, "bab": -5.0}
    word = UG.WB + "abab"

    def score(seg):
        s = 0.0
        for p in seg:
            if p not in model:
                return -math.inf
            s += model[p]
        return s

    def segmentations(w):
        if not w:
            yield []
            return
        for i in range(1, len(w) + 1):
            for rest in segmentations(w[i:]):
                yield [w[:i], *rest]

    got, got_score = UG._viterbi(word, model)
    best = max(segmentations(word), key=score)
    assert score(got) == pytest.approx(score(best))
    assert got_score == pytest.approx(score(best))
    assert "".join(got) == word


def test_oov_falls_back_to_chars():
    model = {"a": -1.0, "b": -1.0, UG.WB: -1.0}
    pieces, _ = UG._viterbi(UG.WB + "axb", model)  # 'x' not in model
    assert "".join(pieces) == UG.WB + "axb"
    assert "x" in pieces


def test_udf_matches_driver_decode(spark):
    rows = ["the quick brown fox", "the the the", "quick quicker"] * 10
    model = UG.unigram_train(_corpus(spark, rows), vocab_size=60,
                             n_iters=3, max_words=50)
    df = _corpus(spark, ["the quick fox", "QUICK the"])
    got = df.select(
        UG.unigram_encode_udf(model)(F.col("text")).alias("p")
    ).collect()

    def drv(t):
        out = []
        for w in t.lower().split():
            out.extend(UG.encode_word(UG.WB + w, model))
        return out

    assert got[0]["p"] == drv("the quick fox")
    assert got[1]["p"] == drv("QUICK the")


def test_vocab_size_and_budget_math(spark):
    rows = ["alpha beta gamma delta epsilon zeta"] * 30
    model = UG.unigram_train(_corpus(spark, rows), vocab_size=30,
                             n_iters=4, max_words=50)
    n_chars = sum(1 for p in model if len(p) == 1)
    assert len(model) <= max(30, n_chars)
    df = _corpus(spark, ["alpha beta", ""])
    out = df.select(
        UG.n_tokens_unigram("text", model).alias("n")
    ).collect()
    assert out[0]["n"] >= 2       # at least one piece per word
    assert out[1]["n"] == 0


def test_deterministic(spark):
    rows = ["sparkly sparks sparking", "sparse sparta"] * 15
    a = UG.unigram_train(_corpus(spark, rows), vocab_size=50, n_iters=3,
                         max_words=50)
    b = UG.unigram_train(_corpus(spark, rows), vocab_size=50, n_iters=3,
                         max_words=50)
    assert a == b


def test_train_unigram_cli(spark, tmp_path, capsys):
    import json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import curate_cli

    out = str(tmp_path / "model.json")
    rc = curate_cli.main([
        "train-unigram", "/root/testdata/sf0.001/documents.parquet", out,
        "--vocab-size", "500", "--max-words", "2000",
    ])
    ev = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and ev["event"] == "unigram_trained"
    assert ev["vocab_size"] <= 500 + ev["n_chars"]
    assert ev["total_tokens"] > 0
    model = json.load(open(out))
    assert all(isinstance(v, float) for v in model.values())
