"""Boilerplate removal / main-content extraction (C20 crawl curation).

jusText-style block classification (Pomikalek 2011, "Removing
Boilerplate and Duplicate Content from Web Corpora"): an HTML page is
segmented into text blocks at block-level tags; each block gets a
context-free class from its link density, stopword density and length;
then a context-sensitive pass re-labels the undecided (short /
near-good) blocks from their nearest decided neighbours. The surviving
"good" blocks, joined in document order, are the page's main content —
navigation bars, footers, related-links lists and cookie banners fall
out because link-dense / stopword-poor blocks classify bad.

Division of labour (the html_to_text precedent, functions/text.py):
Python touches each page exactly ONCE — a single Arrow-batched pandas
UDF parses the HTML into an ``array<struct<text,link_chars>>``. The
whole classification — densities, thresholds, the two neighbour
windows, the good-block reassembly — is pure DataFrame code (codegen
expressions + two windows per page + one groupBy), so at 100 TB the
hot path is one Python parse per page and two partition-local window
passes; no shuffle beyond the per-page window/groupBy exchange, which
AQE coalesces with the downstream per-page work.

Thresholds: jusText's published defaults (max_link_density 0.2,
length_low 70, length_high 200, stopwords_low 0.30, stopwords_high
0.32) assume full ~400-word stopword lists. This engine's compact
10-word lists (functions/textstats.STOPWORDS) yield ~3-5x lower
ratios, so the stopword thresholds default to the same QUANTILES of
the fixture distribution rescaled: low 0.04, high 0.09. Callers with
real stopword lists pass the paper values.

The reference never parses HTML (its inputs are uploaded PDFs/images);
this family comes from the mandated training-data-pipeline extension
list (crawl curation), sibling to functions/urls.py.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- shared constants (single source for Spark AND the DuckDB oracle) ---

#: context-free classification thresholds (jusText, rescaled — see
#: module docstring). Exposed so plans/crawl_q.py's oracle SQL is
#: generated from the SAME numbers and cannot drift.
MAX_LINK_DENSITY = 0.2
LENGTH_LOW = 70
LENGTH_HIGH = 200
STOPWORDS_LOW = 0.04
STOPWORDS_HIGH = 0.09

#: tags that open/close a text block (superset of text.py's _BLOCK_TAGS
#: list items that matter for segmentation)
BLOCK_TAGS = frozenset(
    "p div section article header footer nav aside h1 h2 h3 h4 h5 h6 "
    "li ul ol table tr td th blockquote pre br hr form fieldset".split()
)
#: subtrees that contribute no visible text at all
DROP_TAGS = frozenset("script style noscript template head".split())

_WS_RE = re.compile(r"\s+")


def html_blocks_py(html: str) -> list[tuple[str, int]]:
    """Segment HTML into visible-text blocks: ``[(text, link_chars)]``.

    Blocks split at :data:`BLOCK_TAGS` boundaries; script/style/head
    subtrees are dropped; entities are decoded by the stdlib parser;
    each block's text has every whitespace run collapsed to one space
    and is stripped — empty blocks are not emitted. ``link_chars`` is
    the length of the block's text that came from inside ``<a>``
    subtrees (same collapse rule), the numerator of jusText's link
    density. Malformed markup never raises (tolerant stdlib parser).

    Pure function first (unit-tests without Spark); the Spark leg is
    :func:`html_blocks_udf`.
    """
    from html.parser import HTMLParser

    out: list[tuple[str, int]] = []
    buf: list[str] = []
    link_buf: list[str] = []

    def flush() -> None:
        text = _WS_RE.sub(" ", "".join(buf)).strip()
        if text:
            link = _WS_RE.sub(" ", "".join(link_buf)).strip()
            out.append((text, len(link)))
        buf.clear()
        link_buf.clear()

    class _P(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.drop = 0
            self.a_depth = 0

        def handle_starttag(self, tag, attrs):
            if tag in DROP_TAGS:
                self.drop += 1
            elif tag in BLOCK_TAGS:
                flush()
            elif tag == "a":
                self.a_depth += 1

        def handle_endtag(self, tag):
            if tag in DROP_TAGS:
                if self.drop:
                    self.drop -= 1
            elif tag in BLOCK_TAGS:
                flush()
            elif tag == "a" and self.a_depth:
                self.a_depth -= 1

        def handle_data(self, data):
            if self.drop:
                return
            buf.append(data)
            if self.a_depth:
                link_buf.append(data)

    from data_ingestion_tool_bakasura__spark.functions.htmlguard import (
        bounded_parse,
    )

    p = _P()
    try:
        bounded_parse(p, html or "")  # r17: work-budgeted (hostile pages)
    except Exception:
        pass  # tolerant: keep whatever parsed before the hiccup
    flush()
    return out


_BLOCKS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("text", T.StringType()),
            T.StructField("link_chars", T.IntegerType()),
        ]
    )
)


def html_blocks_udf():
    """Arrow-batched pandas UDF: html string -> array<struct<text,
    link_chars>> in document order (one Python pass per page)."""

    @F.pandas_udf(_BLOCKS_TYPE)
    def _blocks(s: pd.Series) -> pd.Series:
        return s.map(lambda h: html_blocks_py(h or ""))

    return _blocks


def ctx_free_class(
    n_chars: Column,
    link_chars: Column,
    sw_ratio: Column,
    *,
    max_link_density: float = MAX_LINK_DENSITY,
    length_low: int = LENGTH_LOW,
    length_high: int = LENGTH_HIGH,
    stopwords_low: float = STOPWORDS_LOW,
    stopwords_high: float = STOPWORDS_HIGH,
) -> Column:
    """jusText context-free block class as a pure Column expression.

    'bad' when link-dense; short blocks are 'bad' with any link text
    else 'short' (undecided); stopword-rich blocks are 'good' when
    long enough else 'neargood'; stopword-poor blocks are 'bad'.
    """
    ld = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        link_chars / n_chars.cast("double")
    )
    return (
        F.when(ld > max_link_density, F.lit("bad"))
        .when(
            n_chars < length_low,
            F.when(link_chars > 0, F.lit("bad")).otherwise(F.lit("short")),
        )
        .when(
            sw_ratio >= stopwords_high,
            F.when(n_chars > length_high, F.lit("good")).otherwise(
                F.lit("neargood")
            ),
        )
        .when(sw_ratio >= stopwords_low, F.lit("neargood"))
        .otherwise(F.lit("bad"))
    )


def ctx_free_class_sql(
    n_chars: str,
    link_chars: str,
    sw_ratio: str,
    *,
    max_link_density: float = MAX_LINK_DENSITY,
    length_low: int = LENGTH_LOW,
    length_high: int = LENGTH_HIGH,
    stopwords_low: float = STOPWORDS_LOW,
    stopwords_high: float = STOPWORDS_HIGH,
) -> str:
    """DuckDB twin of :func:`ctx_free_class`, generated from the SAME
    constants (the urls.py anti-drift pattern)."""
    return f"""CASE
  WHEN (CASE WHEN {n_chars} = 0 THEN 0.0
             ELSE {link_chars} / ({n_chars})::DOUBLE END) > {max_link_density}
    THEN 'bad'
  WHEN {n_chars} < {length_low}
    THEN CASE WHEN {link_chars} > 0 THEN 'bad' ELSE 'short' END
  WHEN {sw_ratio} >= {stopwords_high}
    THEN CASE WHEN {n_chars} > {length_high} THEN 'good' ELSE 'neargood' END
  WHEN {sw_ratio} >= {stopwords_low} THEN 'neargood'
  ELSE 'bad'
END"""


def classify_blocks(
    df: DataFrame,
    html_col: str,
    id_col: str,
    lang: str = "en",
    **thresholds,
) -> DataFrame:
    """Per-block classification: one row per visible block with both
    the context-free and the context-smoothed (final) class.

    Output: ``(id_col, block_idx, text, n_chars, link_chars, cls_raw,
    cls)``. Context pass (jusText's revised-classification, simplified
    to two neighbour lookups — documented variant): an undecided block
    looks at the nearest DECIDED (good/bad) block on each side within
    the page; 'neargood' becomes 'good' when EITHER neighbour is good,
    'short' only when BOTH are (a lone caption between two nav bars
    stays boilerplate); a missing neighbour (page edge) counts bad.

    Plan shape: one Python parse per page (Arrow UDF) -> posexplode ->
    codegen classification -> two windows partitioned by page -> done.
    The window exchange is on ``id_col`` — the only shuffle, O(pages).
    """
    from data_ingestion_tool_bakasura__spark.functions import textstats as TS

    blocks = df.select(
        F.col(id_col),
        F.posexplode(html_blocks_udf()(F.col(html_col))).alias(
            "block_idx", "_b"
        ),
    ).select(
        id_col,
        "block_idx",
        F.col("_b.text").alias("text"),
        F.length("_b.text").alias("n_chars"),
        F.col("_b.link_chars").alias("link_chars"),
    )
    cls_raw = ctx_free_class(
        F.col("n_chars"),
        F.col("link_chars"),
        TS.stopword_ratio("text", lang),
        **thresholds,
    )
    b = blocks.withColumn("cls_raw", cls_raw)

    decided = F.when(
        F.col("cls_raw").isin("good", "bad"), F.col("cls_raw")
    )
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("block_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy(id_col)
        .orderBy(F.col("block_idx").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b = b.withColumn(
        "_prev", F.coalesce(F.last(decided, True).over(w_prev), F.lit("bad"))
    ).withColumn(
        "_next", F.coalesce(F.last(decided, True).over(w_next), F.lit("bad"))
    )
    final = (
        F.when(F.col("cls_raw").isin("good", "bad"), F.col("cls_raw"))
        .when(
            F.col("cls_raw") == "neargood",
            F.when(
                (F.col("_prev") == "good") | (F.col("_next") == "good"),
                F.lit("good"),
            ).otherwise(F.lit("bad")),
        )
        .otherwise(  # short
            F.when(
                (F.col("_prev") == "good") & (F.col("_next") == "good"),
                F.lit("good"),
            ).otherwise(F.lit("bad"))
        )
    )
    return b.withColumn("cls", final).drop("_prev", "_next")


def extract_main_content(
    df: DataFrame,
    html_col: str,
    id_col: str,
    lang: str = "en",
    **thresholds,
) -> DataFrame:
    """Main-content extraction: good blocks joined in document order.

    Output: ``(id_col, main_text, n_blocks, n_good)`` — ``main_text``
    is '' (not NULL) for pages with no good block, so downstream
    length/hash exprs never need NULL guards. Pages whose HTML yields
    ZERO blocks (empty / markup-only / unparseable) still get a row
    (all-zero, '' text) — posexplode drops them before the groupBy, so
    a left join from the input ids restores them; without it a
    garbage page silently vanishes from the pipeline instead of being
    visibly empty. Both the window and the joins share the page-key
    partitioning — one exchange total under AQE reuse.
    """
    cls = classify_blocks(df, html_col, id_col, lang, **thresholds)
    good = F.when(F.col("cls") == "good", F.struct("block_idx", "text"))
    agg = cls.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_blocks"),
        F.count(F.when(F.col("cls") == "good", 1))
        .cast("bigint")
        .alias("n_good"),
        F.array_sort(F.collect_list(good)).alias("_goods"),
    )
    agg = agg.select(
        id_col,
        F.array_join(
            F.transform(F.col("_goods"), lambda s: s["text"]), "\n"
        ).alias("main_text"),
        "n_blocks",
        "n_good",
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .fillna({"main_text": "", "n_blocks": 0, "n_good": 0})
    )
