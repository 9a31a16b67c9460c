"""Text functions: normalize, sanitize, hash, page-tag, chunkers.

Reference parity (SURVEY §2.A):
- A12 normalize   — ``embedding_utils.py:44-50``  (collapse ``\\s+`` -> " ", strip)
- A15 sanitize    — ``embedding_utils.py:16-21``  (``[^a-zA-Z0-9_\\-=]`` -> "_")
- A14 md5 hash    — ``embedding_utils.py:39-41``
- A10 page tag    — ``embedding_utils.py:153,157,161`` (``[Page {n} Text]:`` prefixes)
- A11 doc concat  — ``embedding_utils.py:167`` (ordered "\\n\\n" join of page segments)
- A16 key synth   — ``main.py:309`` / ``db_utils.py:148-151``
- A13 chunker     — ``embedding_utils.py:176-186``: RecursiveCharacterTextSplitter
                    (size=400, overlap=100, seps ["\\n\\n","\\n",". "," ",""]),
                    re-normalized, empties dropped.

Everything except the recursive chunker is a pure Column expression
(JVM-side, whole-stage codegen); the chunker is pure Python wrapped in
an Arrow-batched pandas UDF. A second, fixed-width chunker with the
same size/overlap contract is provided as a pure Column expression so
the chunk->explode pipeline itself stays oracle-checkable in SQL.

Scale notes: all Column-expression functions stream through codegen
with zero Python cost. The recursive chunker is the only Python hot
path in ingest; it is O(len) per doc, Arrow-batched, and keyed per-row
(no state), so it scales linearly with executors.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Column-expression functions (JVM-side)
# ---------------------------------------------------------------------------

WHITESPACE_RE = r"\s+"
SANITIZE_RE = r"[^a-zA-Z0-9_\-=]"


def normalize_text(col: Column | str) -> Column:
    """A12: collapse runs of whitespace to one space and strip ends."""
    return F.trim(F.regexp_replace(F.col(col) if isinstance(col, str) else col, WHITESPACE_RE, " "))


def sanitize_key(col: Column | str) -> Column:
    """A15: replace every char outside ``[a-zA-Z0-9_\\-=]`` with ``_``."""
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col, SANITIZE_RE, "_")


def text_hash(col: Column | str) -> Column:
    """A14: md5 hexdigest of the text (dedup identity)."""
    return F.md5(F.col(col) if isinstance(col, str) else col)


def page_tag(page_number: Column | str, segment: Column | str, kind: str = "Text") -> Column:
    """A10: ``[Page {n} {kind}]:\\n{segment}`` (kind in Text / OCR Text / Table)."""
    p = F.col(page_number) if isinstance(page_number, str) else page_number
    s = F.col(segment) if isinstance(segment, str) else segment
    return F.concat(F.lit("[Page "), p.cast("string"), F.lit(f" {kind}]:\n"), s)


def doc_concat(page_number: Column | str, segment: Column | str) -> Column:
    """A11 aggregate: page-ordered ``\\n\\n`` join. Use inside ``groupBy(doc).agg``.

    Ordering is made explicit by sorting (page_number, segment) structs —
    collect_list alone has no order guarantee across shuffles.
    """
    p = F.col(page_number) if isinstance(page_number, str) else page_number
    s = F.col(segment) if isinstance(segment, str) else segment
    pairs = F.array_sort(F.collect_list(F.struct(p.alias("p"), s.alias("s"))))
    return F.array_join(F.transform(pairs, lambda x: x["s"]), "\n\n")


def synth_key(filename: Column | str, chunk_id: Column | str) -> Column:
    """A16: deterministic chunk key ``sanitize(f"{file}_{i}")``.

    The reference's uuid-suffixed variant (``db_utils.py:148-151``) is
    non-deterministic; we keep the deterministic ``main.py:309`` form.
    """
    f = F.col(filename) if isinstance(filename, str) else filename
    c = F.col(chunk_id) if isinstance(chunk_id, str) else chunk_id
    return sanitize_key(F.concat_ws("_", f, c.cast("string")))


def chunk_fixed(col: Column | str, size: int = 400, overlap: int = 100) -> Column:
    """Oracle-checkable chunker: fixed windows of ``size`` chars with
    ``overlap`` chars of overlap (stride = size - overlap), as a pure
    Column expression returning ``array<string>``.

    Same size/overlap contract as A13 but windowing is positional, so
    DuckDB can reproduce it exactly. Empty texts yield one empty chunk
    upstream; callers drop blanks after explode.
    """
    c = F.col(col) if isinstance(col, str) else col
    stride = size - overlap
    if stride <= 0:
        raise ValueError("size must exceed overlap")
    # number of windows: 1 + ceil(max(len - size, 0) / stride)
    n = F.lit(1) + F.ceil(
        F.greatest(F.length(c) - F.lit(size), F.lit(0)) / F.lit(stride)
    ).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n - F.lit(1)),
        lambda i: F.substring(c, i * stride + 1, size),
    )


# ---------------------------------------------------------------------------
# Recursive character chunker (A13) — pure Python + pandas UDF
# ---------------------------------------------------------------------------

DEFAULT_SEPARATORS = ("\n\n", "\n", ". ", " ", "")
CHUNK_SIZE = 400  # reference default, embedding_utils.py:35
CHUNK_OVERLAP = 100  # reference default, embedding_utils.py:36


def _merge_splits(
    splits: Iterable[str], sep: str, chunk_size: int, chunk_overlap: int
) -> list[str]:
    """Greedy packing of split pieces into <=chunk_size chunks with
    trailing-overlap carry, matching the recursive-splitter contract
    (pieces joined by ``sep``; when a chunk closes, keep a tail of
    pieces totalling <=chunk_overlap as the start of the next chunk).
    """
    sep_len = len(sep)
    docs: list[str] = []
    current: list[str] = []
    total = 0
    for piece in splits:
        plen = len(piece)
        if total + plen + (sep_len if current else 0) > chunk_size:
            if current:
                doc = sep.join(current).strip()
                if doc:
                    docs.append(doc)
                # pop from the front until the carried tail fits the overlap
                while total > chunk_overlap or (
                    total + plen + (sep_len if current else 0) > chunk_size and total > 0
                ):
                    total -= len(current[0]) + (sep_len if len(current) > 1 else 0)
                    current.pop(0)
        current.append(piece)
        total += plen + (sep_len if len(current) > 1 else 0)
    doc = sep.join(current).strip()
    if doc:
        docs.append(doc)
    return docs


def chunk_text_py(
    text: str,
    chunk_size: int = CHUNK_SIZE,
    chunk_overlap: int = CHUNK_OVERLAP,
    separators: tuple[str, ...] = DEFAULT_SEPARATORS,
) -> list[str]:
    """A13: recursive character split (size=400, overlap=100 defaults).

    Pure-Python reimplementation of the recursive splitter semantics the
    reference configures at ``embedding_utils.py:178-186``: choose the
    first separator present in the text, split, recursively re-split
    oversized pieces with the remaining separators, then greedily merge
    pieces into chunks of <=chunk_size with <=chunk_overlap carry.
    Mirrors the reference's post-pass (``embedding_utils.py:184-186``):
    each chunk re-normalized, blanks dropped.
    """

    def split_rec(text: str, seps: tuple[str, ...]) -> list[str]:
        # pick the first separator that occurs (or the terminal "")
        sep = seps[-1]
        rest: tuple[str, ...] = ()
        for i, s in enumerate(seps):
            if s == "" or s in text:
                sep, rest = s, seps[i + 1 :]
                break
        pieces = list(text) if sep == "" else [p for p in text.split(sep) if p != ""]
        out: list[str] = []
        good: list[str] = []
        for piece in pieces:
            if len(piece) < chunk_size:
                good.append(piece)
            else:
                if good:
                    out.extend(_merge_splits(good, sep, chunk_size, chunk_overlap))
                    good = []
                if rest:
                    out.extend(split_rec(piece, rest))
                else:
                    out.append(piece)
        if good:
            out.extend(_merge_splits(good, sep, chunk_size, chunk_overlap))
        return out

    if not text:
        return []
    chunks = split_rec(text, tuple(separators))
    # reference post-pass: normalize each chunk, drop empties
    chunks = [re.sub(r"\s+", " ", c).strip() for c in chunks]
    return [c for c in chunks if c]


def chunk_udf(chunk_size: int = CHUNK_SIZE, chunk_overlap: int = CHUNK_OVERLAP):
    """Arrow-batched pandas UDF: text -> array<string> of chunks (A13).

    Marked non-deterministic (optimization guide §4.4): the chunk array
    always feeds a posexplode, and Spark's InferFiltersFromGenerate adds
    a ``size(chunks) > 0`` predicate that PushDownPredicates then copies
    below the projection — duplicating the ArrowEvalPython node so every
    document is chunked TWICE (verified in q_ingest_pipeline's executed
    plan). The marker forbids duplicating/reordering the call; the
    function is in fact deterministic, so results are unchanged.

    Caller note (r17 ADVICE): the marker also blocks pushing OTHER
    predicates below the chunk projection — a DOCUMENT-selective
    filter applied after chunking now chunks every document first.
    Apply document gates before the chunk stage and project away
    unneeded columns upstream, since nothing migrates past this node
    anymore (the in-repo pipelines' post-chunk operations — chunk-hash
    dedup, index joins — genuinely need the chunks, so nothing was
    lost there).
    """

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _chunk(s: pd.Series) -> pd.Series:
        return s.map(lambda t: chunk_text_py(t or "", chunk_size, chunk_overlap))

    return _chunk.asNondeterministic()


# --- HTML -> text (WARC companion, round 10) -------------------------------

_BLOCK_TAGS = frozenset(
    "p div br li ul ol h1 h2 h3 h4 h5 h6 tr table section article header "
    "footer blockquote pre dd dt".split()
)
_DROP_TAGS = frozenset("script style noscript template head".split())


from html.parser import HTMLParser as _HTMLParser


class _HtmlTextParser(_HTMLParser):
    """Module-level (not redefined per call): html_to_text_py runs once
    per row on the crawl hot path, so the class body + imports must not
    be re-executed per page — only feed/close is per-row work."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[str] = []
        self._drop = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._drop += 1
        elif tag in _BLOCK_TAGS:
            self.out.append("\n")

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS and self._drop:
            self._drop -= 1
        elif tag in _BLOCK_TAGS:
            self.out.append("\n")

    def handle_data(self, data):
        if not self._drop:
            self.out.append(data)


_WS_RUN_RE = re.compile(r"[ \t\r\f\v]+")


def html_to_text_py(html: str) -> str:
    """Extract visible text from HTML (stdlib ``html.parser``): script/
    style/head subtrees dropped, block tags become newlines, entities
    decoded, whitespace collapsed per line. The text leg of the WARC
    ingestion path (``sources/warc.py``) — pure function first so it
    unit-tests without Spark; malformed markup never raises (the
    parser is tolerant by design), it just yields what it can."""
    from data_ingestion_tool_bakasura__spark.functions.htmlguard import (
        bounded_parse,
    )

    p = _HtmlTextParser()
    try:
        bounded_parse(p, html or "")  # r17: work-budgeted (hostile pages)
    except Exception:
        pass  # tolerant: keep whatever was parsed before the hiccup
    lines = [_WS_RUN_RE.sub(" ", ln).strip()
             for ln in "".join(p.out).split("\n")]
    return "\n".join(ln for ln in lines if ln)


def html_to_text_udf():
    """Arrow-batched pandas UDF: html string -> visible text."""

    @F.pandas_udf(T.StringType())
    def _h2t(s: pd.Series) -> pd.Series:
        return s.map(lambda h: html_to_text_py(h or ""))

    return _h2t
