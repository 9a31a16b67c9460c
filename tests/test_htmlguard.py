"""r17 themed review: work-budgeted HTML parsing (reproduced before
fixing — see functions/htmlguard.py for the measured numbers: the
stdlib parser is quadratic on six degenerate shapes; ``"<a " * n``
cost 130 s at 100 KB, ~3.6 h projected at 1 MB, from ONE crafted
crawled page). These tests pin (1) hard cost bounds on every measured
hostile shape across all four parser entry points, (2) output
equivalence with the unbounded parse on legitimate pages, and (3) the
EOF-backlog drop."""

from __future__ import annotations

import time

from data_ingestion_tool_bakasura__spark.functions import htmlguard as HG
from data_ingestion_tool_bakasura__spark.functions.boilerplate import html_blocks_py
from data_ingestion_tool_bakasura__spark.functions.htmlmeta import (
    html_links_py,
    html_meta_py,
)
from data_ingestion_tool_bakasura__spark.functions.text import (
    _WS_RUN_RE,
    _HtmlTextParser,
    html_to_text_py,
)

HOSTILE_UNITS = ("</", "<!--", "<a ", "<?", "<!", "<!--x>")


def test_hostile_shapes_bounded():
    """Every measured quadratic shape, 400 KB, through all four
    parsers: each call must finish in seconds, not minutes (the
    unbounded parse took >500 s for '<a '*n alone at this size). The
    2 s/call ceiling is ~100x above the observed post-fix cost, so
    this fails on a regression to quadratic, not on a slow machine."""
    for unit in HOSTILE_UNITS:
        page = unit * (400_000 // len(unit))
        for fn in (html_to_text_py, html_blocks_py, html_meta_py, html_links_py):
            t0 = time.perf_counter()
            fn(page)
            assert time.perf_counter() - t0 < 2.0, (unit, fn.__name__)


def _plain_h2t(html: str) -> str:
    p = _HtmlTextParser()
    p.feed(html or "")
    p.close()
    lines = [
        _WS_RUN_RE.sub(" ", ln).strip() for ln in "".join(p.out).split("\n")
    ]
    return "\n".join(ln for ln in lines if ln)


LEGIT_PAGES = [
    "",
    "<p>tiny</p>",
    "<html lang=fr><head><title>a &amp; b</title></head>"
    "<body><p>x &lt; y</p></body></html>",
    # 5k blocks with attrs/entities/links — the realistic big page
    "".join(
        f"<div class='c{i}' data-x=\"{i}\"><p>body {i} <b>bold</b> "
        f"<a href='/x?a=1&amp;b=2'>go</a></p></div>"
        for i in range(5000)
    ),
    # 2 MB inline data-URI: a single legit giant tag must not trip
    # the budget or lose the text after it
    "<p>before</p><img src='data:image/png;base64,"
    + "B" * 2_000_000
    + "'><p>after</p>",
    "<script>if (a < b && c > d) { x('</div>'); }</script><p>visible</p>",
    "<pre>  spaced   text  </pre><p>truncated page with unclosed <a href='x",
    "<!-- a normal comment --><p>ok</p><!DOCTYPE html><?php echo 1 ?>",
]


def test_legit_pages_identical_to_unbounded():
    for pg in LEGIT_PAGES:
        assert html_to_text_py(pg) == _plain_h2t(pg)


def test_legit_extraction_survives_guard():
    page = (
        "<html lang=en><head><title>T &amp; U</title>"
        "<meta name=description content='d'>"
        "<link rel=canonical href=http://c.example/></head><body>"
        + "".join(
            f"<p>para {i} <a href='/l{i}'>link {i}</a></p>" for i in range(500)
        )
        + "</body></html>"
    )
    m = html_meta_py(page)
    assert m["title"] == "T & U" and m["canonical"] == "http://c.example/"
    assert len(html_links_py(page)) == 500
    assert len(html_blocks_py(page)) >= 500
    assert "para 499" in html_to_text_py(page)


def test_budget_exhaustion_keeps_prefix():
    """Once the work budget is gone the page truncates but everything
    already parsed is kept — the same contract as a parser exception."""
    page = "<p>head text</p>" + "<a " * 300_000
    out = html_to_text_py(page)
    assert "head text" in out


def test_eof_backlog_dropped():
    """A >CLOSE_BACKLOG_CAP construct still open at EOF is discarded
    rather than salami-scanned by close() (quadratic): the text before
    it survives, the garbage inside it does not."""
    page = "<p>kept</p><img src='" + "G" * (HG.CLOSE_BACKLOG_CAP * 4)
    out = html_to_text_py(page)
    assert "kept" in out and "GGGG" not in out


def test_bounded_parse_charges_backlog(monkeypatch):
    """The budget is charged in backlog units, so a page that keeps
    the parser's rawdata growing (never-terminating construct) stops
    early even when the input itself is within the size the floor
    would otherwise admit."""
    monkeypatch.setattr(HG, "BUDGET_FLOOR", 1 << 18)
    monkeypatch.setattr(HG, "FIRST_SLICE", 1 << 12)
    monkeypatch.setattr(HG, "MAX_SLICE", 1 << 12)
    s = "<a " + "b='x " * 100_000  # backlog grows forever (no '>')
    p = _HtmlTextParser()
    HG.bounded_parse(p, s)
    # the parse stopped early: had every slice been fed, the whole
    # unconsumable input would sit in rawdata
    assert len(p.rawdata) < len(s) // 2
