"""Golden/unit tests for reference-semantics text ops (SURVEY §5.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.functions import text as TX


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_normalize(spark):
    got = _one(spark, TX.normalize_text(F.lit("  a\t\tb\n\n c  ")))
    assert got == "a b c"


def test_sanitize(spark):
    got = _one(spark, TX.sanitize_key(F.lit("file name!@#$.pdf_0-=x")))
    assert got == "file_name_____pdf_0-=x"


def test_text_hash_matches_hashlib(spark):
    import hashlib

    got = _one(spark, TX.text_hash(F.lit("hello world")))
    assert got == hashlib.md5(b"hello world").hexdigest()


def test_page_tag(spark):
    got = _one(spark, TX.page_tag(F.lit(3), F.lit("body"), "OCR Text"))
    assert got == "[Page 3 OCR Text]:\nbody"


def test_doc_concat_orders_pages(spark):
    df = spark.createDataFrame(
        [(1, 2, "second"), (1, 1, "first"), (1, 3, "third")], "doc int, p int, s string"
    )
    out = df.groupBy("doc").agg(TX.doc_concat("p", "s").alias("t")).collect()[0]["t"]
    assert out == "first\n\nsecond\n\nthird"


def test_synth_key(spark):
    got = _one(spark, TX.synth_key(F.lit("my file.pdf"), F.lit(7)))
    assert got == "my_file_pdf_7"


# --- chunkers --------------------------------------------------------------

def test_chunk_fixed_windows(spark):
    text = "x" * 1000
    got = _one(spark, TX.chunk_fixed(F.lit(text), 400, 100))
    # stride 300: windows at 0, 300, 600 — full coverage, 100-char overlaps
    assert [len(c) for c in got] == [400, 400, 400]
    # coverage property: chunks reassemble the source
    assert got[0] + got[1][100:] + got[2][100:] == text


def test_chunk_fixed_short_text(spark):
    got = _one(spark, TX.chunk_fixed(F.lit("short"), 400, 100))
    assert got == ["short"]


def test_chunk_recursive_size_bound():
    text = " ".join(f"word{i}" for i in range(500))
    chunks = TX.chunk_text_py(text)
    assert chunks, "must produce chunks"
    assert all(len(c) <= TX.CHUNK_SIZE for c in chunks)


def test_chunk_recursive_prefers_paragraphs():
    text = "para one is here.\n\npara two is here.\n\npara three."
    chunks = TX.chunk_text_py(text, chunk_size=40, chunk_overlap=10)
    assert "para one is here." in chunks[0]
    assert all(len(c) <= 40 for c in chunks)


def test_chunk_recursive_overlap_carry():
    # long word stream: consecutive chunks share a suffix/prefix overlap
    words = [f"w{i:03d}" for i in range(200)]
    chunks = TX.chunk_text_py(" ".join(words), chunk_size=100, chunk_overlap=30)
    assert len(chunks) > 2
    for a, b in zip(chunks, chunks[1:]):
        tail_words = a.split()[-2:]
        assert any(w in b.split()[:6] for w in tail_words), (a, b)


def test_chunk_recursive_covers_source():
    text = "alpha beta gamma. delta epsilon zeta. eta theta iota."
    chunks = TX.chunk_text_py(text, chunk_size=25, chunk_overlap=5)
    joined = " ".join(chunks)
    for w in ["alpha", "zeta", "iota"]:
        assert w in joined


def test_chunk_recursive_empty_and_blank():
    assert TX.chunk_text_py("") == []
    assert TX.chunk_text_py("   \n\n  ") == []


def test_chunk_udf_matches_py(spark):
    texts = [
        ("a " * 300).strip(),
        "one.\n\ntwo.\n\nthree.",
        "",
        "short text",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["c"] for r in df.select(TX.chunk_udf()(F.col("t")).alias("c")).collect()]
    want = [TX.chunk_text_py(t) for t in texts]
    assert got == want


def test_chunk_golden_boundaries():
    """Golden chunk boundaries for a fixed input (regression pin)."""
    text = ("The quick brown fox jumps over the lazy dog. " * 20).strip()
    chunks = TX.chunk_text_py(text, chunk_size=120, chunk_overlap=40)
    assert all(len(c) <= 120 for c in chunks)
    # deterministic: same input -> same boundaries
    assert chunks == TX.chunk_text_py(text, chunk_size=120, chunk_overlap=40)
    # sentence separator respected: chunks start at sentence starts
    assert chunks[0].startswith("The quick")
    assert all(c[0].isupper() or c[0].islower() for c in chunks)


def test_lang_guess(spark):
    from data_ingestion_tool_bakasura__spark.functions.textstats import lang_guess

    cases = [
        ("the cat sat on the mat and looked at the dog", "en"),
        ("el perro y el gato en la casa con los ninos", "es"),
        ("der hund und die katze sind in den garten mit", "de"),
        ("le chien et le chat dans les jardins pour un", "fr"),
        ("zzz qqq xxx", "und"),  # zero stopword hits
        ("", "und"),
        ("la de en un", "fr"),  # en/es/fr tie -> latest declared of the tied wins
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "text string")
    got = [r["g"] for r in df.select(lang_guess("text").alias("g")).collect()]
    assert got == [want for _, want in cases]


def test_corpus_report_null_text_semantics(spark):
    """r8 ADVICE (medium): NULL-text docs are counted in avg_quality as
    quality 0.0 over the coalesced empty string (matching the
    q_corpus_report DuckDB oracle), not silently skipped by avg's NULL
    rule — pinned here because the parquet fixtures carry no NULL text."""
    from data_ingestion_tool_bakasura__spark.functions.textstats import (
        corpus_report,
        quality_score,
    )
    from pyspark.sql import functions as F

    txt = "the quick brown fox jumps over the lazy dog and the cat"
    df = spark.createDataFrame([(txt,), (None,)], "text string")
    r = corpus_report(df).first()
    assert r["n_docs"] == 2 and r["n_null_text"] == 1
    q_txt = (
        spark.range(1)
        .select(quality_score(F.lit(txt)).alias("q"))
        .first()["q"]
    )
    # empty string scores exactly 0.0, so the average halves
    assert abs(r["avg_quality"] - round(q_txt / 2, 6)) <= 1e-6
    assert r["n_chars"] == len(txt) and r["n_distinct_texts"] == 2
