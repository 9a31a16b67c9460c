"""Boilerplate removal (C20): jusText-style block segmentation +
classification + main-content extraction (functions/boilerplate.py).

Parser tests are pure Python (no Spark); operator tests run the real
Arrow-UDF + window plan on small in-memory pages.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.functions.boilerplate import (
    classify_blocks,
    ctx_free_class_sql,
    extract_main_content,
    html_blocks_py,
)

GOOD_PARA = (
    "the quick brown fox jumps over the lazy dog and the cat sat on "
    "the mat while the sun set over the hills and the birds sang in "
    "the trees and the river ran to the sea under a wide open sky "
    "full of light and the day went on and on"
)


# --- parser -----------------------------------------------------------


def test_blocks_split_at_block_tags():
    html = "<p>one two</p><div>three four</div><h2>five</h2>"
    assert html_blocks_py(html) == [
        ("one two", 0),
        ("three four", 0),
        ("five", 0),
    ]


def test_blocks_drop_script_style_head():
    html = (
        "<head><title>t</title></head><body><script>var x=1;</script>"
        "<style>p{}</style><p>kept</p></body>"
    )
    assert html_blocks_py(html) == [("kept", 0)]


def test_blocks_link_chars_and_entities():
    html = '<div><a href="/">Home</a> &amp; <a href="/a">About us</a></div>'
    [(text, link)] = html_blocks_py(html)
    assert text == "Home & About us"
    assert link == len("Home") + len("About us")


def test_blocks_whitespace_collapse_and_empty_skipped():
    html = "<p>  a \n\t b  </p><p>   </p><p></p><p>c</p>"
    assert html_blocks_py(html) == [("a b", 0), ("c", 0)]


def test_blocks_inline_tags_do_not_split():
    html = "<p>one <b>two</b> <span>three</span></p>"
    assert html_blocks_py(html) == [("one two three", 0)]


def test_blocks_malformed_never_raises():
    assert html_blocks_py("<p>ok<<<div junk </p unclosed") != []
    assert html_blocks_py("") == []
    assert html_blocks_py(None) == []


# --- context-free classification (via the operator) -------------------


def _classes(spark, pages):
    df = spark.createDataFrame(pages, ["id", "html"])
    rows = classify_blocks(df, "html", "id").orderBy("id", "block_idx")
    return [
        (r["id"], r["block_idx"], r["cls_raw"], r["cls"])
        for r in rows.collect()
    ]


def test_ctx_free_rules(spark):
    nav = '<div><a href="/">Home</a> | <a href="/b">About</a> | <a href="/c">Contact</a></div>'
    short_linked = '<p>see <a href="/t">terms</a> now</p>'
    rows = _classes(
        spark,
        [
            (1, nav),  # link density 11/23 > 0.2 -> bad
            (2, f"<p>{GOOD_PARA}</p>"),  # long + stopword-rich -> good
            (3, short_linked),  # < length_low with a link -> bad
            (4, "<p>Short caption here</p>"),  # < length_low, no link -> short
            (5, "<p>" + "lorem ipsum dolor sit amet " * 12 + "</p>"),
            # ^ long but stopword-free -> bad
        ],
    )
    raw = {r[0]: r[2] for r in rows}
    assert raw == {1: "bad", 2: "good", 3: "bad", 4: "short", 5: "bad"}


def test_ctx_smoothing_rules(spark):
    good = f"<p>{GOOD_PARA}</p>"
    nav = '<div><a href="/">Home</a><a href="/b">About</a></div>'
    # short between two goods -> good; short between bads -> bad;
    # short good-on-one-side-only -> bad (short needs BOTH)
    rows = _classes(
        spark,
        [
            (1, good + "<h2>Section title</h2>" + good),
            (2, nav + "<h2>Section title</h2>" + nav),
            (3, good + "<h2>Section title</h2>" + nav),
        ],
    )
    mids = {r[0]: r[3] for r in rows if r[1] == 1}
    assert mids == {1: "good", 2: "bad", 3: "bad"}


def test_ctx_smoothing_neargood_either_side(spark):
    # neargood needs only ONE good neighbour
    good = f"<p>{GOOD_PARA}</p>"
    nav = '<div><a href="/">Home</a><a href="/b">About</a></div>'
    neargood = (
        "<p>the cat and the dog sat on a mat in the sun for a while and "
        "the day was warm and the sky was blue over the quiet field</p>"
    )
    rows = _classes(
        spark,
        [(1, good + neargood + nav), (2, nav + neargood + nav)],
    )
    by_page = {r[0]: r[3] for r in rows if r[1] == 1}
    assert by_page == {1: "good", 2: "bad"}


def test_page_edges_count_bad(spark):
    # an undecided block with no decided neighbour at all stays bad
    rows = _classes(spark, [(1, "<h2>Only a caption</h2>")])
    assert rows == [(1, 0, "short", "bad")]


# --- main-content extraction ------------------------------------------


def test_extract_main_content(spark):
    good = f"<p>{GOOD_PARA}</p>"
    nav = '<div><a href="/">Home</a> | <a href="/b">About</a> | <a href="/c">Contact</a></div>'
    page = nav + "<h1>Title here</h1>" + good + "<h2>Mid section</h2>" + good + nav
    df = spark.createDataFrame([(1, page), (2, nav + nav)], ["id", "html"])
    out = {
        r["id"]: r
        for r in extract_main_content(df, "html", "id").collect()
    }
    assert out[1]["n_blocks"] == 6 and out[1]["n_good"] == 3
    # order preserved: para, caption (smoothed good), para
    assert out[1]["main_text"].split("\n") == [
        GOOD_PARA,
        "Mid section",
        GOOD_PARA,
    ]
    assert out[2]["n_good"] == 0 and out[2]["main_text"] == ""


def test_sql_twin_shares_constants():
    sql = ctx_free_class_sql("n", "lc", "sw")
    for v in ("0.2", "70", "200", "0.04", "0.09"):
        assert v in sql


# --- streaming crawl integration --------------------------------------


def test_streaming_crawl_boilerplate_removal(spark, tmp_path):
    """start_streaming_crawl(boilerplate_removal=...): the landed corpus
    text is the page's MAIN content — the nav bar and footer drop out
    before any gate sees the page."""
    from data_ingestion_tool_bakasura__spark.sources.warc import read_warc
    from data_ingestion_tool_bakasura__spark.streaming.pipeline import (
        start_streaming_crawl,
    )

    nav = (
        b'<div><a href="/">Home</a> | <a href="/b">About</a> | '
        b'<a href="/c">Contact</a></div>'
    )
    para = ("<p>" + GOOD_PARA + "</p>").encode()
    html = nav + para + nav

    def rec(uri, body_html, rid):
        body = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(body_html)}\r\n\r\n"
        ).encode() + body_html
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"WARC-Target-URI: {uri}\r\nWARC-Date: 2026-08-15T00:00:00Z\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        return head + body + b"\r\n\r\n"

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    (crawl / "w1.warc").write_bytes(
        rec("https://a.example.org/p", html, "a1")
        + rec("https://b.example.org/navonly", nav + nav, "b1")
    )
    corpus = str(tmp_path / "corpus")
    q = start_streaming_crawl(
        read_warc(spark, str(crawl), streaming=True),
        corpus,
        boilerplate_removal=True,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    rows = {r["norm_url"]: r["text"] for r in spark.read.parquet(corpus).collect()}
    assert rows["https://a.example.org/p"] == GOOD_PARA
    assert rows["https://b.example.org/navonly"] == ""


def test_pipeline_cli_crawl_boilerplate(spark, tmp_path, capsys):
    """`crawl --boilerplate`: the indexed chunk is the main paragraph
    only — the nav bar text never reaches the index."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import pipeline_cli

    nav = (b'<div><a href="/">Home</a> | <a href="/b">About</a> | '
           b'<a href="/c">Contact</a></div>')
    html = nav + ("<p>" + GOOD_PARA + "</p>").encode() + nav
    body = (
        f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode() + html
    recb = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:1>\r\n"
        f"WARC-Target-URI: https://a.example.org/p\r\n"
        f"WARC-Date: 2026-08-15T00:00:00Z\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body + b"\r\n\r\n"
    crawl = tmp_path / "crawl"
    crawl.mkdir()
    (crawl / "a.warc").write_bytes(recb)

    idx = str(tmp_path / "idx")
    rc = pipeline_cli.main(
        ["crawl", str(crawl), idx, "--dim", "16", "--boilerplate"]
    )
    out = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
           if ln.startswith("{")]
    assert rc == 0 and out[0]["new_chunks"] >= 1

    rc = pipeline_cli.main(
        ["search", idx, "quick brown fox", "--mode", "text", "-k", "1"]
    )
    out = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
           if ln.startswith("{")]
    assert "quick brown fox" in out[0]["content"]
    assert "Home" not in out[0]["content"]


def test_zero_block_pages_keep_a_row(spark):
    """Pages whose HTML yields no blocks (empty / markup-only) must
    appear in the output as visibly-empty rows, not silently vanish."""
    df = spark.createDataFrame(
        [(1, "<p>" + GOOD_PARA + "</p>"), (2, ""), (3, "<script>x</script>")],
        ["id", "html"],
    )
    out = {r["id"]: r for r in extract_main_content(df, "html", "id").collect()}
    assert set(out) == {1, 2, 3}
    for i in (2, 3):
        assert out[i]["n_blocks"] == 0 and out[i]["main_text"] == ""
    assert out[1]["n_good"] == 1
