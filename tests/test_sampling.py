"""Corpus sampling/curation operator tests: split determinism and
proportions, stratified rates, token-budget greedy cut, n-gram
contamination on planted overlaps."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.operators import sampling as SP
from data_ingestion_tool_bakasura__spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def test_hash_split_deterministic_and_proportional(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = SP.hash_split(docs, "doc_id", w).groupBy("split").count().collect()
    b = SP.hash_split(docs, "doc_id", w).groupBy("split").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # pure function of id
    counts = {r["split"]: r["count"] for r in a}
    n = sum(counts.values())
    assert n == docs.count()  # total partition, no loss/dup
    assert abs(counts.get("train", 0) / n - 0.8) < 0.1  # statistical, id-hash


def test_hash_split_disjoint_from_sample_salt(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    s1 = {r["doc_id"] for r in SP.hash_sample(docs, "doc_id", 0.3, salt="a").collect()}
    s2 = {r["doc_id"] for r in SP.hash_sample(docs, "doc_id", 0.3, salt="b").collect()}
    assert s1 != s2  # different salts give independent samples


def test_stratified_rates(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = SP.stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 1.0, "de": 0.0}, default_rate=0.5
    )
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    want_en = docs.filter(F.col("lang") == "en").count()
    assert got.get("en") == want_en  # rate 1.0 keeps everything
    assert "de" not in got  # rate 0.0 drops everything
    other = docs.filter(~F.col("lang").isin("en", "de")).count()
    assert 0 < sum(v for k, v in got.items() if k != "en") < other


def test_token_budget_greedy_and_bounded(spark):
    rows = [(i, float(10 - i), 100) for i in range(10)]  # quality 10..1, 100 tok each
    df = spark.createDataFrame(rows, "doc_id long, quality double, n_tokens long")
    out = SP.token_budget_select(df, "quality", "n_tokens", 350, "doc_id").collect()
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2]  # top-3 fit in 350
    total = sum(r["n_tokens"] for r in out)
    assert total <= 350


def test_ngram_overlap_planted(spark):
    shared = "one two three four five six seven eight"
    corpus = spark.createDataFrame(
        [(1, f"prefix {shared} suffix words here"), (2, "totally unrelated text " * 4)],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame([(100, f"intro {shared} outro")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in SP.ngram_overlap(corpus, probe, n=8).collect()}
    assert 1 in got and 2 not in got
    assert got[1]["n_shared_grams"] >= 1 and got[1]["n_probe_docs"] == 1


def test_hash_bucket_matches_python_md5(spark):
    """Cross-engine reproducibility pin: the Spark bucket expression
    equals a pure-Python md5 reference for arbitrary unicode ids
    (hypothesis-generated). The DuckDB twin is oracle-checked separately;
    this pins the definition itself."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def py_bucket(doc_id: str, salt: str = "split") -> int:
        h = hashlib.md5(f"{salt}:{doc_id}".encode("utf-8")).hexdigest()
        return int(h[:13], 16) % SP.N_BUCKETS

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.text(min_size=1, max_size=40).filter(lambda s: "\x00" not in s),
            min_size=1,
            max_size=30,
            unique=True,
        )
    )
    def check(ids):
        df = spark.createDataFrame([(i,) for i in ids], "doc_id string")
        got = {
            r["doc_id"]: r["b"]
            for r in df.select("doc_id", SP.hash_bucket("doc_id").alias("b")).collect()
        }
        assert got == {i: py_bucket(i) for i in ids}

    check()


def test_edge_cases_empty_and_degenerate(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    # empty corpus: every operator returns an empty result, no errors
    assert SP.hash_sample(empty, "doc_id", 0.5).count() == 0
    assert SP.hash_split(empty, "doc_id", {"train": 1.0}).count() == 0
    assert SP.ngram_overlap(empty, empty, n=8).count() == 0
    # single-split weight 1.0: everything lands in that split
    docs = spark.createDataFrame([(i, "x") for i in range(20)], "doc_id long, text string")
    out = SP.hash_split(docs, "doc_id", {"all": 1.0})
    assert out.filter(F.col("split") != "all").count() == 0
    # rate 0 and 1 are exact, not statistical
    assert SP.hash_sample(docs, "doc_id", 0.0).count() == 0
    assert SP.hash_sample(docs, "doc_id", 1.0).count() == 20
    # invalid weights rejected eagerly
    import pytest

    with pytest.raises(ValueError, match="sum to 1"):
        SP.hash_split(docs, "doc_id", {"a": 0.5, "b": 0.4})


def test_bloom_decontaminate_no_false_negatives(spark):
    """Bloom decontamination contract: every doc that truly shares an
    8-gram with the probe is flagged (no false negatives — the planted
    probe IS a subset of the corpus), and false positives stay near the
    configured per-gram rate compounded per doc (fpp=1e-5 over ~300-gram
    docs -> ~0.3%% doc-level FP; bound allows 3 of 95)."""
    from data_ingestion_tool_bakasura__spark.operators import sampling as SP

    docs = load_table(spark, SF_SMOKE, "documents").limit(100).cache()
    probe = docs.filter(F.col("doc_id") % 20 == 3)  # 5 planted benchmark docs

    exact = {
        r["doc_id"]
        for r in SP.ngram_overlap(docs, probe, n=8).select("doc_id").collect()
    }
    out = SP.bloom_decontaminate(docs, probe, n=8, fpp=1e-5)
    flagged = {r["doc_id"] for r in out.filter(F.col("contaminated")).collect()}
    assert exact <= flagged  # no false negatives
    assert len(flagged - exact) <= 3, flagged - exact


def test_mixture_rates_hits_target_token_shares(spark):
    """Water-filling mixture: after stratified sampling at the computed
    rates, per-source token shares land near the targets, the binding
    stratum keeps rate 1.0, and nothing upsamples (all rates <= 1)."""
    from data_ingestion_tool_bakasura__spark.operators import sampling as SP

    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .withColumn("n_tok", F.size(F.split(F.trim("text"), " ")))
        .withColumn("bucket", F.col("doc_id") % 3)  # 3 pseudo-sources
        .withColumn("bucket", F.concat(F.lit("s"), F.col("bucket")))
        .cache()
    )
    target = {"s0": 0.5, "s1": 0.3, "s2": 0.2}
    rates = SP.mixture_rates(docs, "bucket", "n_tok", target)
    assert max(rates.values()) == 1.0 and all(0 < r <= 1 for r in rates.values())
    sampled = SP.stratified_hash_sample(docs, "doc_id", "bucket", rates)
    got = {
        r["bucket"]: r["tok"]
        for r in sampled.groupBy("bucket").agg(F.sum("n_tok").alias("tok")).collect()
    }
    total = sum(got.values())
    for s, share in target.items():
        assert abs(got[s] / total - share) < 0.08, (s, got[s] / total, share)


def test_mixture_rates_zero_share_drops_stratum(spark):
    """An explicit 0 target share means 'drop this stratum' (rate 0.0),
    not ZeroDivisionError; negative shares are a clear error."""
    import pytest

    from data_ingestion_tool_bakasura__spark.operators import sampling as SP

    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .withColumn("n_tok", F.size(F.split(F.trim("text"), " ")))
        .withColumn("bucket", F.concat(F.lit("s"), F.col("doc_id") % 3))
        .cache()
    )
    rates = SP.mixture_rates(docs, "bucket", "n_tok", {"s0": 0.6, "s1": 0.4, "s2": 0.0})
    assert rates["s2"] == 0.0
    assert max(rates.values()) == 1.0 and all(0 <= r <= 1 for r in rates.values())
    with pytest.raises(ValueError, match=">= 0"):
        SP.mixture_rates(docs, "bucket", "n_tok", {"s0": 1.1, "s1": -0.1})


def test_quality_classifier_seam_and_null_safety(spark):
    """r8: logistic quality scoring is a pure projection (no exchange,
    no UDF), the weights seam validates its keys and changes the
    decision boundary, and NULL text scores exactly like empty text."""
    import math

    import pytest

    from data_ingestion_tool_bakasura__spark.operators.sampling import (
        DEFAULT_QUALITY_WEIGHTS,
        quality_classifier_score,
    )

    df = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog and runs on."),
            (2, "000 111 222 333 444 555 666 777 888 999"),
            (3, None),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in quality_classifier_score(df).collect()}
    # prose beats the digit dump; NULL == empty, and both score the
    # pure-bias sigmoid
    assert out[1]["q_score"] > out[2]["q_score"]
    assert out[3] == {**out[4], "doc_id": 3}
    assert out[3]["q_score"] == round(1 / (1 + math.exp(1.0)), 6)
    assert out[3]["keep"] is False

    # trained-weights seam: a strong positive bias flips every keep
    flipped = quality_classifier_score(df, weights={"_bias": 10.0})
    assert all(r["keep"] for r in flipped.collect())
    with pytest.raises(ValueError, match="unknown quality weights"):
        quality_classifier_score(df, weights={"not_a_feature": 1.0})

    # plan shape: one projection over the scan — nothing moves
    plan = quality_classifier_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan[:1500]


def test_fit_quality_weights_planted_separation(spark):
    """r8 verdict #4: the weights seam gets a producer. A planted
    linearly-separable labeled set (prose=1 vs digit/punct soup=0) must
    fit weights that (a) carry the right signs, (b) classify the
    training set perfectly when round-tripped through
    quality_classifier_score, and (c) generalize to a held-out pair.
    Label validation raises on single-class and non-0/1 labels."""
    import pytest

    from data_ingestion_tool_bakasura__spark.operators.sampling import (
        DEFAULT_QUALITY_WEIGHTS,
        fit_quality_weights,
        quality_classifier_score,
    )

    prose = [
        "The quick brown fox jumps over the lazy dog and then runs on home.",
        "She walked to the market in the morning and bought some fresh bread.",
        "A long time ago in a land far away there lived an old storyteller.",
        "He said that the weather would improve before the end of the week.",
        "The committee agreed to meet again after lunch on the same day.",
        "Many readers found the first chapter of the novel slow but rewarding.",
    ]
    soup = [
        "000 111 222 333 444 555 666 777 888 999",
        "!!! ??? ;;; ::: ,,, ... !!! ??? ;;; :::",
        "9381 1142 5531 0091 8123 4457 6678 2210",
        "x9!z8?q7;w6:e5,r4.t3!y2?u1;i0:",
        "12,34;56:78!90?12,34;56:78!90?",
        "#### 0000 #### 1111 #### 2222 ####",
    ]
    labeled = spark.createDataFrame(
        [(i, t, 1) for i, t in enumerate(prose)]
        + [(100 + i, t, 0) for i, t in enumerate(soup)],
        "doc_id long, text string, label int",
    )
    w = fit_quality_weights(labeled)
    assert set(w) == set(DEFAULT_QUALITY_WEIGHTS)
    assert w["stopword_ratio"] > 0 and w["punct_ratio"] < 0 and w["digit_ratio"] < 0

    scored = {
        r["doc_id"]: r["keep"]
        for r in quality_classifier_score(labeled, weights=w).collect()
    }
    assert all(scored[i] for i in range(len(prose)))
    assert not any(scored[100 + i] for i in range(len(soup)))

    held_out = spark.createDataFrame(
        [(1, "The old dog sat by the door and waited for the children to come."),
         (2, "77 88 99 !! ?? ;; :: 11 22 33 44 55")],
        "doc_id long, text string",
    )
    ho = {r["doc_id"]: r["keep"]
          for r in quality_classifier_score(held_out, weights=w).collect()}
    assert ho[1] and not ho[2]

    with pytest.raises(ValueError, match="both classes"):
        fit_quality_weights(labeled.filter("label = 1"))
    with pytest.raises(ValueError, match="both classes"):
        fit_quality_weights(
            labeled.withColumn("label", F.col("label") * 2)
        )
    with pytest.raises(ValueError, match="empty labeled set"):
        fit_quality_weights(labeled.filter("label = 7"))


def test_curate_cli_journey(spark, tmp_path, capsys):
    """r8: the curation CLI composes the certified operators end-to-end
    (report card, surgery -> LM gate -> quality gate -> hash splits ->
    partitioned write) with consistent accounting."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import curate_cli

    src = "/root/testdata/sf0.001/documents.parquet"
    rc = curate_cli.main(["report", src])
    card = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and card["n_docs"] == 500 and card["n_tokens"] > 0

    out = str(tmp_path / "cur")
    rc = curate_cli.main(["run", src, out, "--nll-max", "9.9"])
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and d["n_in"] == 500
    assert d["n_kept"] == sum(d["splits"].values()) > 0
    assert d["card_out"]["n_docs"] == d["n_kept"]
    # written corpus is readable, split-partitioned, and matches counts
    got = spark.read.parquet(out + "/corpus")
    assert got.count() == d["n_kept"]
    assert set(r["split"] for r in got.select("split").distinct().collect()) == set(
        d["splits"]
    )

    # r9: fit-quality trains weights on a labeled sample and run serves
    # them — an always-reject model (planted inverted labels on prose vs
    # soup with a harsh threshold) changes the quality gate's behavior
    prose = "The quick brown fox jumps over the lazy dog and runs on home. " * 3
    soup = "000 111 222 !!! ??? ;;; 333 444 555 ::: ,,, ... 666 777 888 999 "
    labeled = str(tmp_path / "labeled.parquet")
    spark.createDataFrame(
        [(i, prose + str(i), 1) for i in range(6)]
        + [(100 + i, soup + str(i), 0) for i in range(6)],
        "doc_id long, text string, label int",
    ).write.parquet(labeled)
    wfile = str(tmp_path / "qw.json")
    rc = curate_cli.main(["fit-quality", labeled, wfile])
    fitted = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and fitted["event"] == "quality_fitted"
    assert set(json.load(open(wfile))) == set(fitted["weights"])
    assert fitted["weights"]["punct_ratio"] < 0

    out2 = str(tmp_path / "cur_fitted")
    rc = curate_cli.main([
        "run", src, out2, "--nll-max", "9.9", "--quality-weights", wfile,
    ])
    d2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and d2["n_in"] == 500 and d2["n_kept"] > 0


# --- DSIR importance resampling (r10) --------------------------------------

def _py_dsir_weights(raw, target, ngrams=(1, 2), B=10_000, alpha=1.0):
    """Pure-python reference of dsir_weights (md5-bucket hashed n-gram
    log-ratios), incl. the bigram leg the oracle query doesn't cover."""
    import hashlib
    import math
    import re
    from collections import Counter

    def feats(text):
        toks = re.sub(r"\s+", " ", text or "").strip().split(" ")
        out = []
        for n in ngrams:
            if n == 1:
                grams = toks
            else:
                grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
            out += [g for g in grams if g != ""]
        return [
            int(hashlib.md5(f"dsir:{g}".encode()).hexdigest()[:13], 16) % B
            for g in out
        ]

    tc, rc = Counter(), Counter()
    for _, t in target:
        tc.update(feats(t))
    for _, t in raw:
        rc.update(feats(t))
    T, R = sum(tc.values()), sum(rc.values())

    def ratio(b):
        return math.log((tc[b] + alpha) / (T + alpha * B)) - math.log(
            (rc[b] + alpha) / (R + alpha * B)
        )

    return {i: sum(ratio(b) for b in feats(t)) for i, t in raw}


def test_dsir_weights_match_python_reference_bigrams(spark):
    raw = [
        (1, "the cat sat on the mat"),
        (2, "stock market prices rise on earnings"),
        (3, "the cat chased the dog"),
        (4, ""),  # featureless -> weight 0.0
        (5, None),  # NULL text -> weight 0.0
        (6, "cat mat cat mat cat"),
    ]
    target = [(91, "the cat and the dog"), (92, "a cat sat on a mat")]
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")

    # normalize=False is the paper-exact sum the reference computes
    got = {
        r["doc_id"]: r["log_weight"]
        for r in SP.dsir_weights(rdf, tdf, ngrams=(1, 2), normalize=False).collect()
    }
    want = _py_dsir_weights(raw, target, ngrams=(1, 2))
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    assert got[4] == 0.0 and got[5] == 0.0
    # cat-ish docs should out-rank the stock doc against a cat target
    assert got[1] > got[2] and got[3] > got[2]


def test_dsir_select_deterministic_and_planned(spark):
    rows = [(i, f"topic {i % 7} words number {i}") for i in range(80)]
    rdf = spark.createDataFrame(rows, "doc_id long, text string")
    tdf = rdf.filter("doc_id % 7 = 3")
    sel = SP.dsir_select(rdf, tdf, k=10)
    a = [r["doc_id"] for r in sel.collect()]
    b = [r["doc_id"] for r in SP.dsir_select(rdf, tdf, k=10).collect()]
    assert a == b and len(a) == 10  # hash-Gumbel noise is reproducible
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort materializes
    ratios_plan = (
        SP.dsir_log_ratios(rdf, tdf)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in ratios_plan


def test_curate_cli_bpe_and_dsir_legs(spark, tmp_path, capsys):
    """train-bpe writes a usable merge table; run --dsir-target keeps
    only the k importance-resampled docs."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import curate_cli

    src = str(tmp_path / "docs.parquet")
    rows = [(i, "the cat sat on the mat and purred softly today " + str(i),
             "en", "src0") for i in range(30)] + [
        (100 + i, "stock market prices moved on quarterly earnings " + str(i),
         "en", "src1") for i in range(30)
    ]
    target_rows = [
        (900 + i, "the cat sat near the mat and cats purred today " + str(i),
         "en", "srcT") for i in range(10)
    ]
    spark.createDataFrame(rows, "doc_id long, text string, lang string, source string") \
        .write.parquet(src)

    merges_out = str(tmp_path / "merges.json")
    rc = curate_cli.main(["train-bpe", src, merges_out, "--n-merges", "40"])
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and d["event"] == "bpe_trained" and d["total_tokens"] > 0
    from data_ingestion_tool_bakasura__spark.functions import bpe as B
    merges = [tuple(m) for m in json.load(open(merges_out))]
    ranks = {m: i for i, m in enumerate(merges)}
    # 'the' dominates this corpus -> it compresses to a single token
    assert B.encode_word("the", ranks) == ["the" + B.EOW]

    target = str(tmp_path / "target.parquet")
    spark.createDataFrame(
        target_rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(target)
    out_dir = str(tmp_path / "curated")
    rc = curate_cli.main([
        "run", src, out_dir, "--nll-max", "99", "--min-quality", "0.0",
        "--dsir-target", target, "--dsir-k", "10",
    ])
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and d["n_kept"] == 10
    kept = spark.read.parquet(out_dir + "/corpus")
    cat_frac = kept.filter("text like '%cat%'").count() / kept.count()
    assert cat_frac >= 0.8  # resampling pulled toward the cat target


def test_dsir_apply_matches_fit_and_serves_new_batches(spark, tmp_path):
    """Persisted ratio table: dsir_apply(corpus) == dsir_weights on the
    fit corpus, and scores a NEW batch without touching the corpora."""
    raw = spark.createDataFrame(
        [(i, f"alpha beta topic {i % 5} gamma {i}") for i in range(40)],
        "doc_id long, text string",
    )
    target = raw.filter("doc_id % 5 = 2")
    ratios = SP.dsir_log_ratios(raw, target)
    p = str(tmp_path / "dsir_ratios.parquet")
    ratios.write.parquet(p)
    stored = spark.read.parquet(p)

    want = {r["doc_id"]: r["log_weight"] for r in SP.dsir_weights(raw, target).collect()}
    got = {r["doc_id"]: r["log_weight"] for r in SP.dsir_apply(raw, stored).collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9

    new_batch = spark.createDataFrame(
        [(900, "alpha beta topic 2 gamma fresh"), (901, "")],
        "doc_id long, text string",
    )
    scored = {r["doc_id"]: r["log_weight"] for r in SP.dsir_apply(new_batch, stored).collect()}
    assert scored[901] == 0.0 and scored[900] != 0.0


# --- char-trigram language ID (r11) ---------------------------------------


def test_trigram_lang_id_dominates_stopword_baseline(spark):
    """The r10 verdict's done-criterion: on the labeled fixture the
    trigram classifier's confusion-matrix trace (correct guesses)
    strictly beats the stopword heuristic's."""
    from data_ingestion_tool_bakasura__spark.functions import textstats as TS

    docs = load_table(spark, SF_SMOKE, "documents")
    pred = SP.trigram_lang_id(docs, SP.fit_lang_profiles(docs))
    tri_correct = (
        docs.select("doc_id", "lang").join(pred, "doc_id")
        .filter(F.col("lang") == F.col("guess")).count()
    )
    sw_correct = docs.filter(
        F.col("lang") == TS.lang_guess("text")
    ).count()
    assert tri_correct > sw_correct


def test_trigram_lang_id_serve_path_and_und(spark):
    """fit once / classify a new batch: profiles fit on a labeled
    corpus classify unseen docs; < 3-char docs guess 'und'; the
    non-broadcast join path agrees with the broadcast one."""
    labeled = spark.createDataFrame(
        [
            (1, "aa ab aa ab aa ab aa ab", "aa"),
            (2, "ab aa ab aa ab aa ab aa", "aa"),
            (3, "zz zy zz zy zz zy zz zy", "zz"),
            (4, "zy zz zy zz zy zz zy zz", "zz"),
        ],
        "doc_id long, text string, lang string",
    )
    prof = SP.fit_lang_profiles(labeled)
    batch = spark.createDataFrame(
        [(10, "aa ab aa"), (11, "zz zy zz"), (12, "x"), (13, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["guess"], r["score"])
           for r in SP.trigram_lang_id(batch, prof).collect()}
    assert got[10][0] == "aa" and got[11][0] == "zz"
    assert got[12] == ("und", None) and got[13] == ("und", None)
    shuffled = {r["doc_id"]: r["guess"]
                for r in SP.trigram_lang_id(
                    batch, prof, broadcast_profiles=False).collect()}
    assert shuffled == {k: v[0] for k, v in got.items()}


def test_curate_cli_langid_journey(spark, tmp_path, capsys):
    """r11: fit-langid persists trigram profiles; lang-id classifies a
    corpus against them with sane accounting and a readable output
    table."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import curate_cli

    src = "/root/testdata/sf0.001/documents.parquet"
    prof = str(tmp_path / "profiles")
    rc = curate_cli.main(["fit-langid", src, prof])
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and d["event"] == "langid_fitted"
    assert set(d["trigrams_per_lang"]) == {"de", "en", "es", "fr", "zh"}

    pred_out = str(tmp_path / "pred")
    rc = curate_cli.main(["lang-id", src, prof, "--out", pred_out])
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and d["n_docs"] == 500
    assert sum(d["by_lang"].values()) == 500
    got = spark.read.parquet(pred_out)
    assert got.count() == 500
    assert set(got.columns) == {"doc_id", "guess", "score"}
