"""HTML page-metadata extraction (functions/htmlmeta.py): title/meta/
OpenGraph/canonical/lang in one parser pass; first occurrence wins."""

from __future__ import annotations

from data_ingestion_tool_bakasura__spark.functions.htmlmeta import (
    html_meta_py,
    with_html_meta,
)

PAGE = (
    '<html lang="en"><head>'
    "<title>  A   Page \n Title </title>"
    '<meta name="description" content="the description">'
    '<meta property="og:title" content="OG Title">'
    '<meta property="og:description" content="og desc">'
    '<meta property="og:image" content="https://img.example/x.png">'
    '<link rel="canonical" href="https://example.com/canonical">'
    "<title>second title ignored</title>"
    '<meta property="og:title" content="dup ignored">'
    "</head><body><p>body</p></body></html>"
)


def test_meta_full_page():
    m = html_meta_py(PAGE)
    assert m == {
        "title": "A Page Title",
        "description": "the description",
        "og_title": "OG Title",
        "og_description": "og desc",
        "og_image": "https://img.example/x.png",
        "canonical": "https://example.com/canonical",
        "lang": "en",
    }


def test_meta_absent_fields_are_none():
    m = html_meta_py("<html><body><p>no head</p></body></html>")
    assert all(v is None for v in m.values())


def test_meta_entities_and_rel_list():
    html = (
        "<title>Q &amp; A</title>"
        '<link rel="alternate canonical" href="/c">'
    )
    m = html_meta_py(html)
    assert m["title"] == "Q & A" and m["canonical"] == "/c"


def test_meta_malformed_never_raises():
    assert html_meta_py("<title>open forever")["title"] is None  # never closed
    assert html_meta_py("")["title"] is None
    assert html_meta_py(None)["title"] is None
    # meta with no content attr is skipped, not crashed on
    assert html_meta_py('<meta name="description">')["description"] is None


def test_with_html_meta_columns(spark):
    df = spark.createDataFrame([(1, PAGE), (2, "<p>plain</p>")], ["id", "html"])
    rows = {r["id"]: r for r in with_html_meta(df, "html").collect()}
    assert rows[1]["meta_title"] == "A Page Title"
    assert rows[1]["meta_canonical"] == "https://example.com/canonical"
    assert rows[2]["meta_title"] is None and rows[2]["meta_lang"] is None
