"""Raw document -> pages -> tagged text (reference EP1 extraction leg).

Reference semantics re-expressed (file:line into /root/reference/):
- page scan / text / tables: ``embedding_utils.py:134-141`` — per page,
  collect text + stringified tables.
- conditional OCR gate: ``embedding_utils.py:143-153`` — OCR only when
  a page yields < 100 chars of text (O1: the gate lives INSIDE the
  extraction UDF so the expensive branch is provably lazy — Spark's
  `when()` does not guarantee branch laziness for UDF calls).
- page tagging + ordered concat: ``embedding_utils.py:153-167`` (A10,
  A11) — done as DataFrame expressions, not in the UDF, so Catalyst
  sees them.
- error isolation: ``main.py:360-366`` (A3/O6) — the extractor never
  throws; failures become an ``error`` column (dead-letter pattern).

Providers: the container has no PyMuPDF/vision SDK, so the default
provider parses a deterministic plain-bytes format (UTF-8, form-feed
page breaks, ``TABLE|``-prefixed table rows); a real PDF provider slots
into the same interface behind an import-try. All downstream plumbing
(schemas, Arrow batching, OCR gating, tagging, assembly) is identical
for both.

Scale notes (100 TB of raw docs):
- extraction is `mapInPandas` over the binary column: stateless, no
  shuffle, Arrow-batched; parallelism = input file splits. Land raw
  bytes in parquet binary columns (splittable) rather than millions of
  tiny files; cap batch memory via maxRecordsPerBatch since one row
  carries a whole document.
- page explosion multiplies rows ~pages-per-doc; the only shuffle in
  the whole extract->assemble leg is the per-doc groupBy for ordered
  concat, keyed by doc path (near-uniform).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestion_tool_bakasura__spark.functions.text import doc_concat, page_tag

#: OCR trigger: pages with fewer chars than this get the OCR branch
#: (reference threshold, embedding_utils.py:143).
OCR_MIN_CHARS = 100

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("page_number", T.IntegerType()),
        T.StructField("page_text", T.StringType()),
        T.StructField("tables", T.ArrayType(T.StringType())),
        T.StructField("needs_ocr", T.BooleanType()),
        T.StructField("image", T.BinaryType()),
        T.StructField("error", T.StringType()),
    ]
)


# ---------------------------------------------------------------------------
# providers
# ---------------------------------------------------------------------------

def stub_parse_pages(content: bytes) -> list[tuple[str, list[str], bytes]]:
    """Deterministic extractor for the plain-bytes document format:
    UTF-8, pages split on form-feed, ``TABLE|a|b`` rows collected as
    stringified tables (reference stringifies via pandas to_string,
    ``embedding_utils.py:108-115``). The rendered-page image (A8) is a
    deterministic md5-derived byte string standing in for a pixmap."""
    pages = []
    for raw in content.decode("utf-8", errors="replace").split("\f"):
        lines = raw.split("\n")
        text = "\n".join(ln for ln in lines if not ln.startswith("TABLE|"))
        tables = [
            " ".join(ln.split("|")[1:]) for ln in lines if ln.startswith("TABLE|")
        ]
        image = b"IMG:" + hashlib.md5(raw.encode()).hexdigest().encode()
        pages.append((text, tables, image))
    return pages


def real_pdf_parse_pages(content: bytes) -> list[tuple[str, list[str], bytes]]:
    """PyMuPDF-backed provider (same interface). Not available in this
    container; import-gated so deployments with fitz get it for free."""
    try:
        import fitz  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("PyMuPDF not installed; use stub_parse_pages") from e
    pages = []  # pragma: no cover
    with fitz.open(stream=content, filetype="pdf") as doc:  # pragma: no cover
        for page in doc:
            text = page.get_text()
            tables = []
            try:
                for t in page.find_tables():
                    tables.append(t.to_pandas().to_string(index=False, header=False))
            except Exception:
                pass
            image = page.get_pixmap().tobytes()
            pages.append((text, tables, image))
    return pages  # pragma: no cover


def stub_ocr(image: bytes) -> str:
    """Deterministic OCR provider (A9 stand-in for the Azure Vision poll
    loop, ``embedding_utils.py:53-100``): text derived from the image
    bytes, so the OCR branch is testable and oracle-able."""
    return "ocr:" + hashlib.md5(image or b"").hexdigest()[:16]


# ---------------------------------------------------------------------------
# extraction operator
# ---------------------------------------------------------------------------

def extract_pages(
    binary_df: DataFrame,
    parser: Callable[[bytes], list[tuple[str, list[str], bytes]]] = stub_parse_pages,
    ocr: Callable[[bytes], str] = stub_ocr,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """binaryFile rows -> one row per page with the OCR gate applied
    in-UDF (O1) and per-document error isolation (A3/O6).

    When a page trips the gate, OCR text is PREPENDED as its own
    segment, mirroring the reference's segment order
    (``embedding_utils.py:151-157``: OCR first, then raw text).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in PAGE_SCHEMA.fieldNames()}
            for path, content in zip(pdf[path_col], pdf[content_col]):
                try:
                    pages = parser(bytes(content))
                    for i, (text, tables, image) in enumerate(pages, start=1):
                        needs = len(text.strip()) < OCR_MIN_CHARS
                        out["path"].append(path)
                        out["page_number"].append(i)
                        out["page_text"].append(ocr(image) + "\n" + text if needs else text)
                        out["tables"].append(tables)
                        out["needs_ocr"].append(needs)
                        out["image"].append(image)
                        out["error"].append(None)
                except Exception as e:  # dead-letter, never kill the job
                    out["path"].append(path)
                    out["page_number"].append(0)
                    out["page_text"].append(None)
                    out["tables"].append(None)
                    out["needs_ocr"].append(False)
                    out["image"].append(None)
                    out["error"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(_extract, schema=PAGE_SCHEMA)


def tagged_page_segment(
    page_number: Column | str = "page_number",
    page_text: Column | str = "page_text",
    tables: Column | str = "tables",
) -> Column:
    """A10: '[Page N Text]:\\ntext' plus one '[Page N Table]:' block per
    table, joined with blank lines (reference ``embedding_utils.py:
    153-165``)."""
    pn = F.col(page_number) if isinstance(page_number, str) else page_number
    segs = F.concat(
        F.array(page_tag(pn, page_text, "Text")),
        F.transform(
            F.col(tables) if isinstance(tables, str) else tables,
            lambda t: page_tag(pn, t, "Table"),
        ),
    )
    return F.array_join(segs, "\n\n")


def assemble_documents(pages: DataFrame, doc_col: str = "path") -> DataFrame:
    """A11: per-document ordered concat of tagged page segments ->
    (doc_col, text, n_pages, n_ocr_pages, error). Clean pages and
    dead-letter rows split per O6."""
    clean = pages.filter(F.col("error").isNull())
    return (
        clean.withColumn("_seg", tagged_page_segment())
        .groupBy(doc_col)
        .agg(
            doc_concat("page_number", "_seg").alias("text"),
            F.count("*").alias("n_pages"),
            F.sum(F.col("needs_ocr").cast("int")).alias("n_ocr_pages"),
        )
    )


def extract_to_documents(
    binary_df: DataFrame,
    parser: Callable[[bytes], list[tuple[str, list[str], bytes]]] = stub_parse_pages,
    ocr: Callable[[bytes], str] = stub_ocr,
) -> DataFrame:
    """Full extraction leg: binary files -> assembled per-doc text ready
    for ``operators.ingest.ingest_documents`` (doc_id = file path)."""
    pages = extract_pages(binary_df, parser=parser, ocr=ocr)
    return assemble_documents(pages).withColumnRenamed("path", "doc_id")


def dead_letters(pages: DataFrame) -> DataFrame:
    """The failed-document channel (A3): one row per poisoned input."""
    return pages.filter(F.col("error").isNotNull()).select("path", "error")
