"""HTML page-metadata extraction (C20 crawl curation).

Pulls the head-level metadata a crawl pipeline keys on — ``<title>``,
``meta[name=description]``, the OpenGraph ``og:title`` /
``og:description`` / ``og:image`` properties, the canonical link and
the ``<html lang>`` attribute — in ONE stdlib-parser pass per page
(the html_to_text / html_blocks division of labour: a single
Arrow-batched pandas UDF is the only Python in the plan; everything
downstream of the struct column is codegen). First-occurrence-wins for
every field, matching how browsers and crawlers resolve duplicates.

Typical uses at crawl scale: title/description feed the document
record and BM25 fields; canonical URLs collapse syndicated duplicates
BEFORE content hashing (join ``canonical`` into ``url_dedup``); the
``lang`` attribute is a cheap prior for the trigram language gate.

The reference never parses HTML (its inputs are uploaded PDFs); this
is part of the mandated crawl-curation extension, sibling to
functions/urls.py and functions/boilerplate.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: output schema — one nullable string per field; NULL = absent
META_FIELDS = (
    "title",
    "description",
    "og_title",
    "og_description",
    "og_image",
    "canonical",
    "lang",
)
_META_TYPE = T.StructType(
    [T.StructField(f, T.StringType()) for f in META_FIELDS]
)


def html_meta_py(html: str) -> dict:
    """Extract head metadata from HTML: dict over :data:`META_FIELDS`
    (missing fields map to None). First occurrence wins per field.
    Whitespace in the title is collapsed; attribute values are taken
    verbatim (the stdlib parser already entity-decodes them).
    Malformed markup never raises."""
    import re
    from html.parser import HTMLParser

    out: dict = {f: None for f in META_FIELDS}
    title_buf: list[str] = []

    class _P(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.in_title = False

        def handle_starttag(self, tag, attrs):
            a = dict(attrs)
            if tag == "html" and out["lang"] is None and a.get("lang"):
                out["lang"] = a["lang"]
            elif tag == "title" and out["title"] is None:
                self.in_title = True
            elif tag == "meta":
                content = a.get("content")
                if content is None:
                    return
                name = (a.get("name") or "").lower()
                prop = (a.get("property") or "").lower()
                if name == "description" and out["description"] is None:
                    out["description"] = content
                elif prop == "og:title" and out["og_title"] is None:
                    out["og_title"] = content
                elif prop == "og:description" and out["og_description"] is None:
                    out["og_description"] = content
                elif prop == "og:image" and out["og_image"] is None:
                    out["og_image"] = content
            elif tag == "link":
                rels = (a.get("rel") or "").lower().split()
                if "canonical" in rels and out["canonical"] is None:
                    out["canonical"] = a.get("href")

        def handle_endtag(self, tag):
            if tag == "title" and self.in_title:
                # first-wins finalized HERE: a later <title> must not
                # re-open collection once one has closed
                self.in_title = False
                out["title"] = (
                    re.sub(r"\s+", " ", "".join(title_buf)).strip() or None
                )

        def handle_data(self, data):
            if self.in_title:
                title_buf.append(data)

    from data_ingestion_tool_bakasura__spark.functions.htmlguard import (
        bounded_parse,
    )

    p = _P()
    try:
        bounded_parse(p, html or "")  # r17: work-budgeted (hostile pages)
    except Exception:
        pass  # tolerant: keep whatever parsed before the hiccup
    return out


def html_meta_udf():
    """Arrow-batched pandas UDF: html string -> struct of
    :data:`META_FIELDS` (one parser pass per page)."""

    @F.pandas_udf(_META_TYPE)
    def _meta(s: pd.Series) -> pd.DataFrame:
        rows = [html_meta_py(h or "") for h in s]
        return pd.DataFrame(rows, columns=list(META_FIELDS))

    return _meta


def with_html_meta(df, html_col: str, prefix: str = "meta_"):
    """Append the metadata fields as flat ``prefix``-ed columns
    (map-only; the struct is computed once and exploded by Project)."""
    m = html_meta_udf()(F.col(html_col))
    return df.select(
        "*", *[m[f].alias(f"{prefix}{f}") for f in META_FIELDS]
    )


# --- outlink extraction (r11, link-graph family off raw pages) -------------

_LINKS_TYPE = T.ArrayType(
    T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
)


def html_links_py(html: str) -> list[tuple[str, str | None]]:
    """Every ``<a href>`` with its anchor text, document order, in ONE
    stdlib-parser pass (hrefs entity-decoded by the parser; anchor
    text whitespace-collapsed, None when the anchor is empty). Nested
    anchors (invalid HTML) attribute text to the innermost open one —
    the browsers' recovery. Malformed markup never raises."""
    import re
    from html.parser import HTMLParser

    out: list[tuple[str, str | None]] = []
    stack: list[tuple[str, list[str]]] = []

    class _L(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)

        def handle_starttag(self, tag, attrs):
            if tag == "a":
                href = dict(attrs).get("href")
                if href is not None:
                    stack.append((href, []))

        def handle_endtag(self, tag):
            if tag == "a" and stack:
                href, buf = stack.pop()
                text = re.sub(r"\s+", " ", "".join(buf)).strip() or None
                out.append((href, text))

        def handle_data(self, data):
            if stack:
                stack[-1][1].append(data)

    from data_ingestion_tool_bakasura__spark.functions.htmlguard import (
        bounded_parse,
    )

    p = _L()
    try:
        bounded_parse(p, html or "")  # r17: work-budgeted (hostile pages)
    except Exception:
        pass
    # unclosed anchors at EOF still count (truncated pages)
    while stack:
        href, buf = stack.pop()
        import re as _re

        out.append((href, _re.sub(r"\s+", " ", "".join(buf)).strip() or None))
    return out


def html_links_udf():
    """Arrow-batched pandas UDF: html -> array<struct<url,text>> — the
    same element shape as the WAT links arrays, so
    ``linkgraph.extract_links_html`` and the WAT path share all
    downstream operators."""

    @F.pandas_udf(_LINKS_TYPE)
    def _links(s: pd.Series) -> pd.Series:
        return s.map(lambda h: html_links_py(h or ""))

    return _links
