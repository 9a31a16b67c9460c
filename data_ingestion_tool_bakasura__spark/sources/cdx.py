"""CDX(J) capture-index source (C1 crawl aperture).

Common Crawl publishes a URL index alongside its WARC archives: one
line per capture, ``<urlkey> <timestamp> <json>`` where the JSON block
carries the capture's url / mime / status / digest and the WARC
``filename`` / ``offset`` / ``length`` needed to range-read just that
record. Real pipelines query the index FIRST — select captures, plan
byte-range fetches grouped per WARC file — and only then touch
archives, so the index reader is the cheap front door of the crawl
aperture (``read_warc`` / ``read_wet`` being the archive doors).

Everything here is relational: ``read_cdx`` is text-source ->
``split``/``from_json`` (codegen, no UDF), ``latest_captures`` is one
window on urlkey, ``fetch_plan`` one aggregation on filename — at a
100-billion-line index the plan is scan + two keyed exchanges, no
Python anywhere.

The reference ingests uploaded files and has no index concept; this
family comes from the mandated crawl-curation extension
(sources/warc.py sibling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: JSON fields of a CDXJ line (Common Crawl cc-index shape). offset /
#: length are strings IN THE FILE (the format quotes them); the reader
#: casts them to long.
_CDX_JSON = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("digest", T.StringType()),
        T.StructField("length", T.StringType()),
        T.StructField("offset", T.StringType()),
        T.StructField("filename", T.StringType()),
    ]
)


def read_cdx(spark: SparkSession, path: str,
             streaming: bool = False) -> DataFrame:
    """Read CDXJ lines into typed capture rows.

    Columns: ``urlkey`` (SURT key), ``ts`` (capture timestamp as the
    raw 14-digit string — lexicographic == chronological, so windows
    order on it directly), ``url``, ``mime``, ``status`` (int),
    ``digest``, ``warc_file``, ``offset``, ``length`` (long).
    Malformed lines (no JSON object, bad JSON) yield NULL json fields
    and can be quarantined with ``filter(col('url').isNull())`` — the
    PERMISSIVE from_json contract, same as read_json_with_errors.

    Codegen all the way: two substring_index splits + one from_json;
    no UDF, so the parse pipelines with the text scan."""
    src = (
        spark.readStream.format("text") if streaming
        else spark.read.format("text")
    )
    lines = src.load(path).filter(F.length(F.trim("value")) > 0)
    # "<urlkey> <ts> {json...}": the json block may contain spaces, so
    # split on the FIRST two spaces only
    urlkey = F.substring_index("value", " ", 1)
    ts = F.substring_index(F.substring_index("value", " ", 2), " ", -1)
    js = F.expr("substring(value, length(substring_index(value, ' ', 2)) + 2)")
    j = F.from_json(js, _CDX_JSON)
    return lines.select(
        urlkey.alias("urlkey"),
        ts.alias("ts"),
        j["url"].alias("url"),
        j["mime"].alias("mime"),
        j["status"].cast("int").alias("status"),
        j["digest"].alias("digest"),
        j["filename"].alias("warc_file"),
        j["offset"].cast("long").alias("offset"),
        j["length"].cast("long").alias("length"),
    )


def latest_captures(captures: DataFrame, statuses=(200,)) -> DataFrame:
    """One row per urlkey: the LATEST capture among the allowed
    statuses (revisits/errors filtered first, ties broken by offset
    for determinism). One window exchange on urlkey."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("urlkey")
        .orderBy(F.col("ts").desc(), F.col("offset").desc(),
                 # same capture indexed in TWO archives (merged
                 # indexes) ties (ts, offset) — without a total order
                 # the winner (hence the fetched file) flips run to
                 # run (r15 review)
                 F.col("warc_file").desc())
    )
    kept = captures.filter(F.col("status").isin(*statuses))
    return (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def read_warc_ranges(plan: DataFrame, base_dir: str,
                     types: tuple[str, ...] = ("response",),
                     skip_missing: bool = False) -> DataFrame:
    """Execute a :func:`fetch_plan`: open each WARC file ONCE, seek to
    every planned ``(offset, length)`` range in ascending-offset order
    and parse exactly those record slices — the rows come out in the
    same shape as ``read_warc`` (path, record_id, warc_type, url,
    warc_date, content_type, http_status, payload).

    This is the byte-economics of index-first crawling: for a
    selective capture set the fetch reads a few MB from multi-GB
    archives instead of scanning them. One task per WARC file BY
    CONSTRUCTION (the plan repartitions on ``warc_file``, so all of
    one file's ranges hash to one task and read sequentially — the
    right IO pattern; r15 review corrected the old advice to "explode
    the ranges", which provably did nothing because exploded rows
    still share the file name and land in the same task; to
    parallelize a single pathological hot file, plan disjoint capture
    subsets and run separate fetches). ``skip_missing=True`` drops
    plan rows whose archive is absent instead of failing the job —
    the index often outlives retired archives; default is strict.
    Trust boundary (r15 review): every field here comes from an
    UNTRUSTED index file, so the fetch validates before IO — NULL
    filename/offset/length (quarantine-eligible lines that reached
    planning) raise a named error instead of an opaque TypeError,
    filenames may not escape ``base_dir`` (absolute or ``..`` paths
    refuse), lengths must be positive, and a range read that returns
    fewer bytes than planned fails loudly as a stale-index signal
    rather than silently truncating payloads or (at EOF) silently
    dropping the record. Dictionary-bearing
    seekable ``.warc.zst`` archives (CC's layout) work: the leading
    dictionary frame is sniffed, inflated and built into the backend's
    compression-dict object ONCE per file, then reused for every
    member slice (r14; per-slice re-inflation removed r14 late) — a
    short dictionary-frame read fails loudly instead of absorbing
    member bytes as dictionary content."""
    import os

    from data_ingestion_tool_bakasura__spark.sources.warc import (
        WARC_SCHEMA,
        _ZSTD_DICT_FRAME_MAGIC,
        _seekable_zstd_dictionary,
        parse_warc_records,
        split_http_response,
    )

    keep = tuple(t.lower() for t in types)

    def _fetch(batches):
        import pandas as pd

        cols = ["path", "record_id", "warc_type", "url",
                "warc_date", "content_type", "http_status", "payload"]
        root = os.path.realpath(base_dir)
        for pdf in batches:
            rows = []
            for wf, ranges in zip(pdf["warc_file"], pdf["ranges"]):
                if wf is None:
                    raise ValueError(
                        "CDX fetch plan row with NULL warc_file — "
                        "quarantine malformed index lines (NULL-cast "
                        "fields) before planning"
                    )
                p = os.path.join(base_dir, wf)
                if os.path.commonpath([root, os.path.realpath(p)]) != root:
                    raise ValueError(
                        f"CDX plan filename {wf!r} escapes base_dir — "
                        "index filenames are untrusted data"
                    )
                # open() directly and catch absence (r15 review): the
                # old exists()-then-open() raced the exact
                # retired-archive scenario skip_missing exists for
                try:
                    fobj = open(p, "rb")
                except FileNotFoundError:
                    if skip_missing:
                        continue
                    raise
                with fobj as f:
                    # dictionary-bearing seekable .warc.zst (r14): a
                    # member slice from such an archive cannot decode
                    # alone — sniff the leading 0x184D2A5D dictionary
                    # frame, resolve it ONCE per file (inflate the
                    # possibly-compressed payload, build the backend's
                    # compression-dict object) and hand the PREBUILT
                    # dict to parse_warc_records for every slice: a
                    # 10k-range CC fetch re-inflates nothing per range
                    # (r14-late review).
                    zdict = None
                    head = f.read(8)
                    if head[:4] == _ZSTD_DICT_FRAME_MAGIC and len(head) == 8:
                        # a regular-file read can only SHORT-read,
                        # never pad, so _seekable_zstd_dictionary's
                        # own truncation guard covers the short case
                        # loudly (r15 review dropped a duplicate check)
                        size = int.from_bytes(head[4:8], "little")
                        dict_frame = head + f.read(size)
                        from data_ingestion_tool_bakasura__spark.sources.zstd_compat import (  # noqa: E501
                            require_zstd,
                        )

                        zmod = require_zstd("zstd-compressed WARC member")
                        zdict = zmod.ZstdCompressionDict(
                            _seekable_zstd_dictionary(dict_frame, zmod)
                        )
                    spans = []
                    for r in ranges:
                        if r["offset"] is None or r["length"] is None:
                            raise ValueError(
                                f"{p}: plan range with NULL offset/"
                                "length — quarantine malformed index "
                                "lines before planning"
                            )
                        off, ln = int(r["offset"]), int(r["length"])
                        if off < 0 or ln <= 0:
                            raise ValueError(
                                f"{p}: implausible plan range "
                                f"offset={off} length={ln} — a negative "
                                "length would read to EOF and emit "
                                "unplanned records"
                            )
                        spans.append((off, ln))
                    for off, ln in sorted(spans):
                        f.seek(off)
                        raw = f.read(ln)
                        if len(raw) != ln:
                            raise ValueError(
                                f"{p}: short range read at offset "
                                f"{off}: planned {ln} bytes, got "
                                f"{len(raw)} — stale index against a "
                                "rewritten/truncated archive"
                            )
                        for headers, body in parse_warc_records(
                            raw, dict_data=zdict
                        ):
                            wtype = headers.get("warc-type", "")
                            if keep and wtype.lower() not in keep:
                                continue
                            status, ctype, payload = split_http_response(body)
                            rows.append((
                                p,
                                headers.get("warc-record-id", ""),
                                wtype,
                                headers.get("warc-target-uri", ""),
                                headers.get("warc-date", ""),
                                ctype or headers.get("content-type", ""),
                                status,
                                payload,
                            ))
            yield pd.DataFrame(rows, columns=cols)

    return plan.repartition("warc_file").mapInPandas(_fetch, WARC_SCHEMA)


def fetch_plan(captures: DataFrame) -> DataFrame:
    """Group selected captures into per-WARC-file byte-range fetch
    jobs: (warc_file, n_records, bytes_total, ranges sorted by offset)
    — the read schedule a range-request fetcher executes. One
    aggregation exchange on warc_file; ranges stay arrays of (offset,
    length) structs, sorted so adjacent ranges coalesce downstream.
    Byte-identical duplicate index lines (routine in merged/
    re-published CC indexes) collapse to ONE range (r15 review) —
    n_records/bytes_total count the deduplicated read schedule, so a
    duplicated line no longer double-fetches and double-emits its
    record."""
    return (
        captures.groupBy("warc_file")
        .agg(
            F.array_sort(
                F.array_distinct(F.collect_list(F.struct("offset", "length")))
            ).alias("ranges"),
        )
        .select(
            "warc_file",
            F.size("ranges").cast("bigint").alias("n_records"),
            F.aggregate(
                "ranges", F.lit(0).cast("bigint"),
                lambda acc, r: acc + r["length"],
            ).alias("bytes_total"),
            "ranges",
        )
    )


def cdx_lines(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    fields: dict[str, str] | None = None,
) -> DataFrame:
    """Render capture rows as CDXJ lines — the WRITE side of this
    index (the reader is :func:`read_cdx`, so write-then-read
    roundtrips by construction: both ends share the same
    ``urls.surt_key`` expression and JSON field names).

    ``ts_col`` must hold the 14-digit capture timestamp string (or a
    timestamp column — formatted); ``fields`` maps JSON field name ->
    source column for the metadata block (default: the url itself
    plus any of mime/status/digest/filename/offset/length present).
    Pure codegen projection; write with
    ``df.write.text(...)`` / ``.sortWithinPartitions("line")`` for the
    index convention (CDX files are urlkey-sorted so range lookups
    can binary-search; sort AFTER repartitioning by key range at real
    scale)."""
    from data_ingestion_tool_bakasura__spark.functions.urls import surt_key

    if fields is None:
        fields = {"url": url_col}
        for c in ("mime", "status", "digest", "filename", "offset", "length"):
            if c in df.columns:
                fields[c] = c
    ts = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) in ("timestamp", "timestamp_ntz"):
        ts = F.date_format(ts, "yyyyMMddHHmmss")
    json_block = F.to_json(
        F.struct(*[
            F.col(src).cast("string").alias(name)
            for name, src in sorted(fields.items())
        ])
    )
    return df.select(
        F.concat(
            surt_key(F.col(url_col)), F.lit(" "), ts, F.lit(" "), json_block
        ).alias("line")
    )
