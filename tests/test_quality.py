"""Web-page quality filters (functions/quality.py): C4 line cleaning
and Gopher document rules — golden behavior on handcrafted pages,
Spark-vs-DuckDB twin parity (fixed adversarial cases + property-based
random pages), and the map-only plan shape."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.functions import quality as Q

GOOD_PAGE = (
    "The quick brown fox jumps over the lazy dog today. "
    "We have run the test again and again to be sure of it. "
    "It held up well! Did it break? It did not. That was the point. "
    "More words of note land here with the rest of the body text now."
)
PAGES = [
    GOOD_PAGE,
    # nav chrome + javascript boilerplate around good lines
    "Home | About | Contact\n" + GOOD_PAGE + "\nPlease enable javascript to view.",
    "Lorem Ipsum dolor sit amet. " + GOOD_PAGE,          # doc-dropped (lorem)
    "function init() {\n" + GOOD_PAGE,                    # doc-dropped (brace)
    "- the first item here.\n- the second item here.\n- the third item here.",
    "Trailing off into nothing...\nAnd more of the same...\nStill going...",
    "#### #tags #everywhere\nwat.",
    "short stub.",
    "",
    "one\ntwo\nthree",                                    # no line survives C4
]


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(PAGES)], "i int, t string"
    )
    out = df.select(
        "i",
        Q.c4_clean("t").alias("clean"),
        Q.c4_line_count("t").alias("n_lines"),
        Q.c4_kept_line_count("t").alias("n_kept"),
        Q.sentence_count(Q.c4_clean("t")).alias("n_sentences"),
        Q.c4_doc_keep("t").alias("c4_keep"),
        Q.gopher_n_words("t").alias("n_words"),
        F.round(Q.gopher_mean_word_len("t"), 6).alias("mwl"),
        F.round(Q.gopher_alpha_frac("t"), 6).alias("alpha"),
        F.round(Q.gopher_symbol_ratio("t"), 6).alias("symbol"),
        F.round(Q.gopher_bullet_frac("t"), 6).alias("bullet"),
        F.round(Q.gopher_ellipsis_frac("t"), 6).alias("ellipsis"),
        Q.gopher_stopword_hits("t").alias("stop_hits"),
        Q.gopher_keep("t").alias("g_keep"),
    ).orderBy("i")
    return {r["i"]: r.asDict() for r in out.collect()}


def _oracle_rows(pages):
    con = duckdb.connect()
    con.execute("CREATE TABLE p(i INT, t VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", list(enumerate(pages)))
    e = "t"
    sql = f"""SELECT i,
      {Q.c4_clean_sql(e)} AS clean,
      {Q.c4_line_count_sql(e)} AS n_lines,
      {Q.c4_kept_line_count_sql(e)} AS n_kept,
      {Q.sentence_count_sql(Q.c4_clean_sql(e))} AS n_sentences,
      {Q.c4_doc_keep_sql(e)} AS c4_keep,
      {Q.gopher_n_words_sql(e)} AS n_words,
      round({Q.gopher_mean_word_len_sql(e)}, 6) AS mwl,
      round({Q.gopher_alpha_frac_sql(e)}, 6) AS alpha,
      round({Q.gopher_symbol_ratio_sql(e)}, 6) AS symbol,
      round({Q.gopher_bullet_frac_sql(e)}, 6) AS bullet,
      round({Q.gopher_ellipsis_frac_sql(e)}, 6) AS ellipsis,
      {Q.gopher_stopword_hits_sql(e)} AS stop_hits,
      {Q.gopher_keep_sql(e)} AS g_keep
    FROM p ORDER BY i"""
    cols = ["i", "clean", "n_lines", "n_kept", "n_sentences", "c4_keep",
            "n_words", "mwl", "alpha", "symbol", "bullet", "ellipsis",
            "stop_hits", "g_keep"]
    return {r[0]: dict(zip(cols, r)) for r in con.execute(sql).fetchall()}


# --- golden behavior ------------------------------------------------------

def test_good_page_keeps_everything(frames):
    r = frames[0]
    assert r["c4_keep"] and r["g_keep"]
    assert r["clean"] == GOOD_PAGE
    assert r["n_sentences"] >= Q.C4_MIN_SENTENCES
    assert r["stop_hits"] >= Q.GOPHER_MIN_STOPWORD_HITS


def test_boilerplate_lines_dropped_doc_kept(frames):
    r = frames[1]
    assert r["n_lines"] == 3 and r["n_kept"] == 1   # only the article line
    assert "javascript" not in r["clean"]
    assert "Home | About" not in r["clean"]
    assert r["c4_keep"]


def test_lorem_and_brace_drop_the_document(frames):
    assert not frames[2]["c4_keep"]     # lorem ipsum (case-insensitive)
    assert not frames[3]["c4_keep"]     # curly brace
    # line cleaning itself still ran: the good line survives in clean
    assert GOOD_PAGE.split(".")[0] in frames[3]["clean"]


def test_bullet_and_ellipsis_fractions(frames):
    assert frames[4]["bullet"] == 1.0 and not frames[4]["g_keep"]
    assert frames[5]["ellipsis"] == 1.0 and not frames[5]["g_keep"]


def test_symbol_ratio_and_alpha_frac(frames):
    r = frames[6]
    assert r["symbol"] > Q.GOPHER_MAX_SYMBOL_RATIO
    assert r["alpha"] < 1.0
    assert not r["g_keep"]


def test_short_and_empty_pages(frames):
    for i in (7, 8):
        r = frames[i]
        assert not r["g_keep"]          # below GOPHER_MIN_WORDS
        assert not r["c4_keep"]         # below C4_MIN_SENTENCES
    r = frames[8]
    assert r["n_words"] == 0 and r["mwl"] == 0.0 and r["symbol"] == 0.0


def test_no_line_survives(frames):
    r = frames[9]
    assert r["n_kept"] == 0 and r["clean"] == "" and r["n_sentences"] == 0


# --- Spark <-> DuckDB twin parity ----------------------------------------

def test_twin_parity_fixed_cases(frames):
    oracle = _oracle_rows(PAGES)
    assert set(frames) == set(oracle)
    for i in frames:
        assert frames[i] == oracle[i], f"page {i} diverged"


_FRAGMENTS = list("abct .!?#-*{}\"'") + [
    "\n", "...", "•", "…", "the ", "javascript", "lorem ipsum", "- ", "* ",
]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_FRAGMENTS), max_size=40),
        min_size=1,
        max_size=5,
    )
)
def test_twin_parity_random_pages(shared_spark_for_property, chunks):
    spark = shared_spark_for_property
    page = "\n".join("".join(c) for c in chunks)
    row = (
        spark.range(1)
        .select(
            Q.c4_clean(F.lit(page)).alias("clean"),
            Q.c4_doc_keep(F.lit(page)).alias("c4_keep"),
            Q.gopher_n_words(F.lit(page)).alias("n_words"),
            F.round(Q.gopher_mean_word_len(F.lit(page)), 6).alias("mwl"),
            F.round(Q.gopher_symbol_ratio(F.lit(page)), 6).alias("symbol"),
            F.round(Q.gopher_bullet_frac(F.lit(page)), 6).alias("bullet"),
            Q.gopher_stopword_hits(F.lit(page)).alias("stop_hits"),
            Q.gopher_keep(F.lit(page)).alias("g_keep"),
        )
        .collect()[0]
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE p(t VARCHAR)")
    con.execute("INSERT INTO p VALUES (?)", [page])
    o = con.execute(
        f"""SELECT {Q.c4_clean_sql('t')}, {Q.c4_doc_keep_sql('t')},
        {Q.gopher_n_words_sql('t')}, round({Q.gopher_mean_word_len_sql('t')}, 6),
        round({Q.gopher_symbol_ratio_sql('t')}, 6),
        round({Q.gopher_bullet_frac_sql('t')}, 6),
        {Q.gopher_stopword_hits_sql('t')}, {Q.gopher_keep_sql('t')} FROM p"""
    ).fetchone()
    assert tuple(row) == tuple(o)


@pytest.fixture(scope="module")
def shared_spark_for_property(spark):
    return spark


# --- plan shape: the whole quality pass is one map-only codegen span ------

def test_quality_pass_is_exchange_free(spark):
    df = spark.createDataFrame([(p,) for p in PAGES], "t string")
    plan = (
        df.filter(Q.c4_doc_keep("t"))
        .select(Q.c4_clean("t").alias("c"))
        .filter(Q.gopher_keep(F.col("c")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- batch operator + CLI leg ---------------------------------------------

def test_web_quality_filter_operator(spark):
    from data_ingestion_tool_bakasura__spark.operators.crawl import (
        web_quality_filter,
    )

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(PAGES)], "doc_id int, text string"
    )
    both = web_quality_filter(df, "text", "c4+gopher")
    rows = {r["doc_id"]: r["text"] for r in both.collect()}
    assert 0 in rows and rows[0] == GOOD_PAGE
    assert 1 in rows and rows[1] == GOOD_PAGE      # boilerplate stripped
    assert 2 not in rows and 4 not in rows
    # gopher-only leaves text untouched
    gopher_only = {r["doc_id"]: r["text"]
                   for r in web_quality_filter(df, "text", "gopher").collect()}
    assert gopher_only[1] != GOOD_PAGE and GOOD_PAGE in gopher_only[1]
    with pytest.raises(ValueError, match="gate"):
        web_quality_filter(df, "text", "fineweb")


def test_curate_cli_web_quality(spark, tmp_path, capsys):
    import json as _json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import curate_cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, p) for i, p in enumerate(PAGES)], "doc_id int, text string"
    ).write.parquet(src)
    out = str(tmp_path / "kept")
    rc = curate_cli.main(["web-quality", src, "--out", out])
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and rep["n_in"] == len(PAGES)
    assert rep["n_out"] == 2 and rep["n_dropped"] == len(PAGES) - 2
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {0, 1}


# --- Gopher repetition rules (Table A1) -----------------------------------

REP_PAGES = [
    "a b c\na b c\nx y z",                               # duplicated line
    "buy now buy now buy now",                           # looping top bigram
    "para one here.\n\npara one here.\n\npara two now.",  # duplicated paragraph
    "one two three four five six one two three four five six",  # dup n-grams
    "",
    GOOD_PAGE,
]


@pytest.fixture(scope="module")
def rep_frames(spark):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(REP_PAGES)], "i int, t string"
    )
    out = df.select(
        "i",
        F.round(Q.dup_line_frac("t"), 6).alias("dlf"),
        F.round(Q.dup_line_char_frac("t"), 6).alias("dlcf"),
        F.round(Q.dup_para_frac("t"), 6).alias("dpf"),
        F.round(Q.dup_para_char_frac("t"), 6).alias("dpcf"),
        F.round(Q.top_ngram_char_frac("t", 2), 6).alias("t2"),
        F.round(Q.dup_ngram_char_frac("t", 5), 6).alias("d5"),
        Q.gopher_rep_keep("t").alias("keep"),
    ).orderBy("i")
    return {r["i"]: r.asDict() for r in out.collect()}


def test_rep_duplicated_line(rep_frames):
    r = rep_frames[0]
    assert r["dlf"] == round(1 / 3, 6)            # 1 of 3 lines is a repeat
    assert r["dlcf"] == round(5 / 17, 6)          # its 5 chars over 17
    assert r["dpf"] == 0.0                        # single paragraph
    assert not r["keep"]


def test_rep_looping_top_bigram(rep_frames):
    r = rep_frames[1]
    # "buy now" x3, 7 chars -> 21 covered of 23
    assert r["t2"] == round(21 / 23, 6)
    assert r["dlf"] == 0.0 and not r["keep"]


def test_rep_duplicated_paragraph(rep_frames):
    r = rep_frames[2]
    assert r["dpf"] == round(1 / 3, 6)
    assert r["dpcf"] == round(14 / 45, 6)
    assert not r["keep"]


def test_rep_dup_ngrams_overlapping_accounting(rep_frames):
    r = rep_frames[3]
    # the two repeated 5-grams cover 23 chars each over 55 raw chars
    assert r["d5"] == round(46 / 55, 6)
    assert not r["keep"]


def test_rep_empty_and_prose(rep_frames):
    assert rep_frames[4] == {"i": 4, "dlf": 0.0, "dlcf": 0.0, "dpf": 0.0,
                             "dpcf": 0.0, "t2": 0.0, "d5": 0.0, "keep": True}
    r = rep_frames[5]                              # real prose keeps
    assert r["dlf"] == 0.0 and r["d5"] == 0.0 and r["keep"]


def test_rep_twin_parity_fixed_cases(rep_frames):
    con = duckdb.connect()
    con.execute("CREATE TABLE p(i INT, t VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", list(enumerate(REP_PAGES)))
    sql = f"""SELECT i,
      round({Q.dup_line_frac_sql('t')}, 6) AS dlf,
      round({Q.dup_line_char_frac_sql('t')}, 6) AS dlcf,
      round({Q.dup_para_frac_sql('t')}, 6) AS dpf,
      round({Q.dup_para_char_frac_sql('t')}, 6) AS dpcf,
      round({Q.top_ngram_char_frac_sql('t', 2)}, 6) AS t2,
      round({Q.dup_ngram_char_frac_sql('t', 5)}, 6) AS d5,
      {Q.gopher_rep_keep_sql('t')} AS keep
    FROM p ORDER BY i"""
    cols = ["i", "dlf", "dlcf", "dpf", "dpcf", "t2", "d5", "keep"]
    oracle = {r[0]: dict(zip(cols, r)) for r in con.execute(sql).fetchall()}
    assert rep_frames == oracle


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(list("ab .") + ["\n", "\n\n", "cd ", "e f "]),
                 max_size=30),
        min_size=1,
        max_size=4,
    )
)
def test_rep_twin_parity_random_pages(shared_spark_for_property, chunks):
    spark = shared_spark_for_property
    page = "\n".join("".join(c) for c in chunks)
    row = (
        spark.range(1)
        .select(
            F.round(Q.dup_line_frac(F.lit(page)), 6).alias("dlf"),
            F.round(Q.dup_para_char_frac(F.lit(page)), 6).alias("dpcf"),
            F.round(Q.top_ngram_char_frac(F.lit(page), 2), 6).alias("t2"),
            F.round(Q.top_ngram_char_frac(F.lit(page), 3), 6).alias("t3"),
            F.round(Q.dup_ngram_char_frac(F.lit(page), 5), 6).alias("d5"),
            Q.gopher_rep_keep(F.lit(page)).alias("keep"),
        )
        .collect()[0]
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE p(t VARCHAR)")
    con.execute("INSERT INTO p VALUES (?)", [page])
    o = con.execute(
        f"""SELECT round({Q.dup_line_frac_sql('t')}, 6),
        round({Q.dup_para_char_frac_sql('t')}, 6),
        round({Q.top_ngram_char_frac_sql('t', 2)}, 6),
        round({Q.top_ngram_char_frac_sql('t', 3)}, 6),
        round({Q.dup_ngram_char_frac_sql('t', 5)}, 6),
        {Q.gopher_rep_keep_sql('t')} FROM p"""
    ).fetchone()
    assert tuple(row) == tuple(o)


def test_rep_pass_is_exchange_free(spark):
    df = spark.createDataFrame([(p,) for p in REP_PAGES], "t string")
    plan = (
        df.filter(Q.gopher_rep_keep("t"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_web_quality_filter_rep_gate(spark):
    from data_ingestion_tool_bakasura__spark.operators.crawl import (
        parse_quality_gate,
        web_quality_filter,
    )

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(REP_PAGES)], "doc_id int, text string"
    )
    kept = {r["doc_id"] for r in web_quality_filter(df, "text", "rep").collect()}
    assert kept == {4, 5}
    # tokens normalize to canonical application order
    assert parse_quality_gate("rep+c4") == ("c4", "rep")
    with pytest.raises(ValueError, match="gate"):
        parse_quality_gate("c4+c4")
    with pytest.raises(ValueError, match="gate"):
        parse_quality_gate("")
    # composed: prose survives all three, everything else dies
    all3 = {r["doc_id"]
            for r in web_quality_filter(df, "text", "c4+gopher+rep").collect()}
    assert all3 == {5}
