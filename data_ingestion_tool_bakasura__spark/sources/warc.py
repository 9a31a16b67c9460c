"""WARC source (C1 aperture widening, round 10): read Common-Crawl-style
web archives into a relation — the canonical 100 TB training-data
input that the reference's file-upload loop never reaches.

Spark-first shape: ``binaryFile`` scan (one task per archive member,
pushdown-pruned to ``path``/``content``) -> ``mapInPandas`` record
explode (Arrow-batched, pure stdlib parsing: ``gzip`` + byte framing)
-> ordinary DataFrame of (url, date, type, status, payload) rows that
every downstream operator (html_to_text, dedup, quality, ingest)
composes with. No driver involvement, no Python-per-row.

Scale honesty: ``binaryFile`` materializes each archive member in one
task (Spark's 2 GB column limit applies). Common Crawl ships ~1 GB
.warc.gz members — within a sane executor — and per-record gzip
members (how CC actually writes them) decompress as concatenated
streams in one pass. For pathological multi-GB members, split the
archive upstream or plug a streaming parser into the same
``parse_warc_records`` seam; the relation contract stays identical.

Subset, stated honestly: WARC/1.0 and 1.1 framing (CRLF headers +
Content-Length body + CRLF CRLF), gzip members, HTTP response payload
split on the first CRLF CRLF, Transfer-Encoding: chunked payloads
de-chunked, and Content-Encoding gzip/deflate bodies decompressed (CC
archives store raw wire bytes; brotli bodies decode when a ``brotli``
lib is importable — the fitz-style gate — and pass through compressed
otherwise). Not handled: rare continuation/segmented records; plug
warcio into the ``parse_warc_records`` seam when full fidelity
matters.
"""

from __future__ import annotations

import gzip

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "path string, record_id string, warc_type string, url string, "
    "warc_date string, content_type string, http_status int, payload binary"
)


_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
# skippable frame 0x184D2A5D — the IIPC seekable-.warc.zst convention
# (implemented publicly by warcio) reserves exactly this magic for the
# dictionary frame; the other skippable magics (0x50..0x5F) carry no
# dictionary and are left for the decoder to skip
_ZSTD_DICT_FRAME_MAGIC = b"\x5d\x2a\x4d\x18"


def _bounded_gunzip(raw: bytes) -> bytes:
    """Multi-member gzip decompress under the codec inflate budget
    (r17 themed review, reproduced: ``gzip.decompress`` materializes
    the FULL output before any caller can measure it, so a ~1 MiB
    deflate bomb — gzip's 1032:1 ceiling — inflates ~1 GiB per member
    and a concatenated-member bomb multiplies that without bound).
    Semantics match ``gzip.decompress`` exactly on non-bomb input
    (pinned by test: multi-member concat, trailing-zero padding
    tolerated, garbage -> BadGzipFile, truncation -> EOFError);
    crossing the budget raises ValueError so the archive fails loudly
    like any other corrupt member."""
    import zlib

    from data_ingestion_tool_bakasura__spark.sources.zstd_compat import (
        inflate_budget,
    )

    budget = inflate_budget(len(raw))
    out: list[bytes] = []
    total = 0
    data = bytes(raw)
    while data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(31)
        buf = data
        while True:
            chunk = d.decompress(buf, 1 << 20)
            total += len(chunk)
            if total > budget:
                raise ValueError(
                    f"gzip stream inflates past the {budget}-byte "
                    f"budget for {len(raw)} compressed bytes: refusing "
                    f"adversarial allocation (gzip bomb?)"
                )
            if chunk:
                out.append(chunk)
            if d.eof:
                data = d.unused_data
                break
            buf = d.unconsumed_tail
            if not buf:
                raise EOFError(
                    "Compressed file ended before the end-of-stream "
                    "marker was reached"
                )
    if data.strip(b"\x00"):
        raise gzip.BadGzipFile(f"Not a gzipped file ({data[:2]!r})")
    return b"".join(out)


def _bounded_zstd_read(zstandard, reader, n_compressed: int, what: str) -> bytes:
    """Drain a zstd ``stream_reader`` under the inflate budget. The
    ctypes shim enforces the identical budget inside its decode loop
    (it cannot read incrementally), so it drains in one call; the
    ``zstandard`` package leg reads 1 MiB slices and refuses once the
    budget is crossed — BEFORE the bomb materializes, which a
    ``len(read())`` check after the fact cannot do."""
    from data_ingestion_tool_bakasura__spark.sources.zstd_compat import (
        inflate_budget,
    )

    if getattr(zstandard, "backend", "") == "ctypes-libzstd":
        return reader.read()
    budget = inflate_budget(n_compressed)
    chunks: list[bytes] = []
    total = 0
    while True:
        b = reader.read(1 << 20)
        if not b:
            return b"".join(chunks)
        total += len(b)
        if total > budget:
            raise ValueError(
                f"{what} inflates past the {budget}-byte budget for "
                f"{n_compressed} compressed bytes: refusing adversarial "
                f"allocation (zstd bomb?)"
            )
        chunks.append(b)


def _seekable_zstd_dictionary(raw: bytes, zstandard) -> bytes | None:
    """Dictionary bytes from a leading seekable-``.warc.zst``
    dictionary frame, or ``None`` when the archive opens with anything
    else.

    Common Crawl's seekable layout opens the file with a SKIPPABLE
    frame of magic ``0x184D2A5D`` (4-byte LE magic, 4-byte LE size,
    payload) whose payload is the zstd dictionary every following
    member frame was compressed with; the payload may itself be a
    plain (dictionary-less) zstd frame — CC compresses the dictionary
    — in which case it is inflated here first. A declared size that
    overruns the buffer raises: a truncated dictionary must fail
    loudly, never decode members against a partial dictionary."""
    if len(raw) < 8 or raw[:4] != _ZSTD_DICT_FRAME_MAGIC:
        return None
    size = int.from_bytes(raw[4:8], "little")
    if 8 + size > len(raw):
        raise ValueError(
            ".warc.zst dictionary frame truncated: declares "
            f"{size} payload bytes, {len(raw) - 8} present"
        )
    payload = raw[8 : 8 + size]
    if payload[:4] == _ZSTD_MAGIC:
        with zstandard.ZstdDecompressor().stream_reader(
            payload, read_across_frames=True
        ) as r:
            payload = _bounded_zstd_read(
                zstandard, r, len(payload), ".warc.zst dictionary frame"
            )
    return payload


def parse_warc_records(
    raw: bytes, dict_data=None
) -> list[tuple[dict, bytes]]:
    """Split one WARC file's bytes into (headers, body) records.

    Pure function (stdlib only) so it unit-tests without Spark and
    doubles as the seam a higher-fidelity parser can replace. Gzip
    input (magic ``1f 8b``) is decompressed first — multi-member
    streams (per-record gzip, the Common Crawl layout) come back as
    one concatenated buffer, which the WARC/ delimiter scan then
    splits exactly like an uncompressed file. Header names are
    lower-cased; bodies are sliced by Content-Length (the WARC spec's
    framing, not a delimiter scan, so binary payloads containing
    'WARC/' cannot split a record). A record whose Content-Length is
    missing or unparseable is DROPPED and the scan skips explicitly to
    the next '\\r\\n\\r\\nWARC/' boundary — never resumed inside its
    unframed payload bytes.

    Zstandard members (r12, the newer CC compression): the zstd magic
    dispatches to a gated leg that resolves the ``zstandard`` package
    OR a ctypes binding to the system libzstd (``zstd_compat``, r14 —
    a clear ValueError names the missing package when neither
    resolves); multi-frame streams concatenate like gzip members and
    skippable frames are skipped. Dictionary-bearing seekable
    .warc.zst (CC's layout: a leading 0x184D2A5D skippable frame
    carrying the dictionary, itself possibly zstd-compressed) is
    resolved here (``_seekable_zstd_dictionary``) and the members
    decoded against it on either backend; a dictionary-compressed
    member with NO dictionary frame fails loudly. ``dict_data``
    (r14 late, the range-fetch path): a PREBUILT compression-dict
    object from the ``require_zstd`` backend, used when the buffer
    itself carries no dictionary frame — a range fetcher resolves the
    file's dictionary ONCE and reuses it across thousands of member
    slices instead of re-inflating it per slice."""
    if raw[:2] == b"\x1f\x8b":
        raw = _bounded_gunzip(raw)
    elif raw[:4] == b"\x28\xb5\x2f\xfd" or (
        # zstd SKIPPABLE frame magic 0x184D2A50..5F — how CC's seekable
        # .warc.zst opens (the dictionary frame); must route to the
        # same gate, not fall through to the delimiter scan and
        # silently parse to zero records
        len(raw) >= 4 and raw[1:4] == b"\x2a\x4d\x18" and 0x50 <= raw[0] <= 0x5F
    ):
        from data_ingestion_tool_bakasura__spark.sources.zstd_compat import (
            require_zstd,
        )

        # r14: the gate resolves the zstandard package OR a ctypes
        # binding to the system libzstd (zstd_compat) — absent both,
        # the same clear ValueError naming the package
        zstandard = require_zstd("zstd-compressed WARC member")
        try:
            dkw = {}
            d = _seekable_zstd_dictionary(raw, zstandard)
            if d is not None:
                dkw["dict_data"] = zstandard.ZstdCompressionDict(d)
            elif dict_data is not None:
                dkw["dict_data"] = dict_data
            # read_across_frames spans every concatenated frame in one
            # read (the dictionary frame, being skippable, is skipped;
            # member frames decode against the referenced dictionary)
            with zstandard.ZstdDecompressor(**dkw).stream_reader(
                raw, read_across_frames=True
            ) as r:
                raw = _bounded_zstd_read(
                    zstandard, r, len(raw), "zstd WARC member"
                )
        except zstandard.ZstdError as exc:
            # a dictionary-compressed member with no dictionary frame
            # (or corrupt bytes) — fail loudly, never return an empty
            # relation
            raise ValueError(
                f"zstd WARC member failed to decode: {exc}"
            ) from exc
    records: list[tuple[dict, bytes]] = []
    i = 0
    n = len(raw)
    while i < n:
        j = raw.find(b"WARC/", i)
        if j < 0:
            break
        he = raw.find(b"\r\n\r\n", j)
        if he < 0:
            break
        headers: dict[str, str] = {}
        # WARC header fields are UTF-8 per the spec (ISO 28500 §4);
        # latin-1 fallback keeps foreign archives with raw-byte URLs
        # readable (latin-1 cannot fail) without mangling our own
        # UTF-8-written non-ASCII target URIs on read-back.
        try:
            head_text = raw[j:he].decode("utf-8")
        except UnicodeDecodeError:
            head_text = raw[j:he].decode("latin-1")
        for line in head_text.split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            # Malformed record: without a Content-Length the body has no
            # framing, so resuming the b'WARC/' scan right after the
            # header block would parse PAYLOAD bytes as records (a body
            # containing 'WARC/' would emit spurious rows). Drop the
            # record and skip explicitly to the next record boundary.
            nb = raw.find(b"\r\n\r\nWARC/", he)
            if nb < 0:
                break
            i = nb + 4
            continue
        body = raw[he + 4 : he + 4 + clen]
        records.append((headers, body))
        i = he + 4 + clen
    return records


def _dechunk(payload: bytes) -> bytes:
    """Reassemble a Transfer-Encoding: chunked body (size-hex CRLF data
    CRLF ... 0 CRLF CRLF). Crawlers archive the raw wire bytes, so
    chunk framing otherwise leaks into extracted text. A malformed
    chunk stream returns the bytes decoded so far plus nothing —
    never raises."""
    out = []
    i = 0
    n = len(payload)
    while i < n:
        eol = payload.find(b"\r\n", i)
        if eol < 0:
            break
        size_tok = payload[i:eol].split(b";", 1)[0].strip()  # ignore chunk exts
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:
            break  # terminal chunk (trailers ignored)
        out.append(payload[eol + 2 : eol + 2 + size])
        i = eol + 2 + size + 2  # skip data + trailing CRLF
    return b"".join(out)


def _bounded_zlib_body(payload: bytes, wbits: int) -> bytes:
    """One-stream zlib/gzip/deflate inflate for a CRAWLED response
    body under the codec inflate budget (r17 themed review: these
    bytes are attacker-authored wire content, the same bomb class as
    the archive members). Semantics match ``zlib.decompress(p, wbits)``
    on non-bomb input — trailing junk tolerated, truncation raises
    ``zlib.error`` — and an over-budget body raises ``zlib.error`` too,
    so the existing best-effort chain keeps the compressed bytes
    rather than killing the task: one hostile page must never fail
    the archive (per-record isolation), it just stays undecoded."""
    import zlib

    from data_ingestion_tool_bakasura__spark.sources.zstd_compat import (
        inflate_budget,
    )

    budget = inflate_budget(len(payload))
    d = zlib.decompressobj(wbits)
    out: list[bytes] = []
    total = 0
    buf = payload
    while True:
        chunk = d.decompress(buf, 1 << 20)
        total += len(chunk)
        if total > budget:
            raise zlib.error(
                f"body inflates past the {budget}-byte budget "
                f"(compression bomb?)"
            )
        if chunk:
            out.append(chunk)
        if d.eof:
            return b"".join(out)
        buf = d.unconsumed_tail
        if not buf:
            raise zlib.error("incomplete or truncated stream")


def _bounded_brotli_body(payload: bytes) -> bytes:
    """Brotli leg of the body decode, import-gated (passes through
    compressed when no ``brotli`` lib is importable — the fitz-style
    gate). When the lib exposes an incremental decompressor
    (``brotli.Decompressor`` in both google-brotli and brotlicffi),
    input is fed in 64 KiB slices with the inflate budget checked
    after each — a bomb is refused within one slice's expansion of
    the budget instead of fully materializing. A lib exposing only
    one-shot ``decompress`` still decodes (bounded enforcement is
    impossible there; the gate keeps this leg rare). Any failure —
    budget, corrupt bytes, API mismatch — keeps the compressed
    payload, same per-record isolation as the zlib leg."""
    try:
        import brotli  # type: ignore[import-not-found]
    except ImportError:
        return payload
    from data_ingestion_tool_bakasura__spark.sources.zstd_compat import (
        inflate_budget,
    )

    budget = inflate_budget(len(payload))
    try:
        dec = getattr(brotli, "Decompressor", None)
        if dec is not None:
            d = dec()
            feed = getattr(d, "decompress", None) or getattr(d, "process", None)
            if feed is None:
                raise AttributeError("no incremental decompress method")
            out: list[bytes] = []
            total = 0
            for i in range(0, len(payload), 1 << 16):
                chunk = feed(payload[i : i + (1 << 16)])
                total += len(chunk)
                if total > budget:
                    raise ValueError("brotli body inflates past budget")
                out.append(chunk)
            return b"".join(out)
        decoded = brotli.decompress(payload)
        if len(decoded) > budget:
            raise ValueError("brotli body inflates past budget")
        return decoded
    except Exception:
        return payload


def split_http_response(body: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an archived HTTP response into (status, content-type,
    payload). Non-HTTP bodies (warcinfo, metadata, resource records)
    pass through as (None, None, body). ``Transfer-Encoding: chunked``
    payloads are de-chunked (Common Crawl stores raw wire bytes)."""
    if not body.startswith(b"HTTP/"):
        return None, None, body
    he = body.find(b"\r\n\r\n")
    if he < 0:
        return None, None, body
    head = body[:he].decode("latin-1", "replace").split("\r\n")
    try:
        status = int(head[0].split()[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    chunked = False
    cenc = ""
    for line in head[1:]:
        low = line.lower()
        if low.startswith("content-type:") and ctype is None:
            ctype = line.split(":", 1)[1].strip()
        elif low.startswith("transfer-encoding:") and "chunked" in low:
            chunked = True
        elif low.startswith("content-encoding:"):
            cenc = low.split(":", 1)[1].strip()
    payload = body[he + 4 :]
    if chunked:
        payload = _dechunk(payload)
    if cenc in ("gzip", "x-gzip", "deflate"):
        import zlib

        try:
            # 47: auto-detect gzip/zlib headers; raw-deflate retried bare
            payload = _bounded_zlib_body(payload, 47)
        except zlib.error:
            try:
                payload = _bounded_zlib_body(payload, -15)
            except zlib.error:
                pass  # keep the compressed bytes; magic is detectable downstream
    elif cenc == "br":
        # import-gated like the fitz/tesseract legs: decode when a brotli
        # lib is installed, pass through compressed otherwise
        payload = _bounded_brotli_body(payload)
    return status, ctype, payload


def read_warc(
    spark: SparkSession,
    path: str,
    glob: str | None = "*.warc*",
    types: tuple[str, ...] = ("response",),
    streaming: bool = False,
) -> DataFrame:
    """WARC archives -> DataFrame(path, record_id, warc_type, url,
    warc_date, content_type, http_status, payload).

    ``types`` filters record types INSIDE the explode (default: only
    ``response`` rows survive — request/metadata/warcinfo records are
    dropped before they ever become DataFrame rows); pass ``()`` to
    keep everything. Downstream: ``payload`` is the raw HTTP body —
    feed HTML through ``functions.text.html_to_text`` and then the
    ordinary document pipeline (chunk -> dedup -> embed).

    ``streaming=True`` returns the incremental twin over the same
    directory (``readStream.format("binaryFile")`` -> the same
    mapInPandas explode): each new archive dropped into ``path`` is
    parsed exactly once per trigger — the continuous-crawl ingestion
    loop, composable with the streaming dedup/ingest sinks in
    ``streaming/pipeline.py``."""
    from data_ingestion_tool_bakasura__spark.sources.readers import read_binary_files

    src = read_binary_files(spark, path, glob=glob, streaming=streaming).select(
        "path", "content"
    )
    keep = tuple(t.lower() for t in types)

    def _explode(batches):
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for headers, body in parse_warc_records(bytes(content)):
                    wtype = headers.get("warc-type", "")
                    if keep and wtype.lower() not in keep:
                        continue
                    status, ctype, payload = split_http_response(body)
                    rows.append(
                        (
                            path_,
                            headers.get("warc-record-id", ""),
                            wtype,
                            headers.get("warc-target-uri", ""),
                            headers.get("warc-date", ""),
                            ctype or headers.get("content-type", ""),
                            status,
                            payload,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "record_id", "warc_type", "url",
                    "warc_date", "content_type", "http_status", "payload",
                ],
            )

    return src.mapInPandas(_explode, schema=WARC_SCHEMA)


WET_SCHEMA = (
    "path string, record_id string, url string, warc_date string, "
    "text string"
)
WAT_SCHEMA = (
    "path string, record_id string, url string, warc_date string, "
    "json string"
)


def _read_extract_sibling(
    spark: SparkSession,
    path: str,
    glob: str | None,
    streaming: bool,
    keep_type: str,
    out_col: str,
    schema: str,
) -> DataFrame:
    """Shared explode for the WET/WAT siblings: same WARC envelope
    framing as ``read_warc`` (``parse_warc_records`` is the single
    parser seam), but the payload is already-extracted content — plain
    text (WET) or JSON metadata (WAT) — so there is no HTTP response
    to split; the body decodes straight to a string column."""
    from data_ingestion_tool_bakasura__spark.sources.readers import read_binary_files

    src = read_binary_files(spark, path, glob=glob, streaming=streaming).select(
        "path", "content"
    )

    def _explode(batches):
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for headers, body in parse_warc_records(bytes(content)):
                    if headers.get("warc-type", "").lower() != keep_type:
                        continue
                    rows.append(
                        (
                            path_,
                            headers.get("warc-record-id", ""),
                            headers.get("warc-target-uri", ""),
                            headers.get("warc-date", ""),
                            body.decode("utf-8", "replace"),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["path", "record_id", "url", "warc_date", out_col],
            )

    return src.mapInPandas(_explode, schema=schema)


def read_wet(
    spark: SparkSession,
    path: str,
    glob: str | None = "*.wet*",
    streaming: bool = False,
) -> DataFrame:
    """WET (WARC-encapsulated extracted text — what Common Crawl users
    actually consume far more often than raw WARC) -> DataFrame(path,
    record_id, url, warc_date, text). WET files are the same WARC/1.0
    record framing with ``WARC-Type: conversion`` records whose body
    is the page's extracted UTF-8 text; there is no HTTP envelope and
    no html_to_text step — rows feed the crawl-curation pass (URL
    dedup -> domain caps -> quality/DSIR gates) directly.
    ``streaming=True`` returns the incremental twin (same explode over
    ``readStream``), mirroring ``read_warc``."""
    return _read_extract_sibling(
        spark, path, glob, streaming, "conversion", "text", WET_SCHEMA
    )


def read_wat(
    spark: SparkSession,
    path: str,
    glob: str | None = "*.wat*",
    streaming: bool = False,
) -> DataFrame:
    """WAT (WARC-encapsulated per-page metadata) -> DataFrame(path,
    record_id, url, warc_date, json). WAT files carry ``WARC-Type:
    metadata`` records whose body is a JSON envelope (headers, links,
    title...); the ``json`` column stays a string — downstream picks
    fields with ``F.get_json_object``/``from_json`` so Spark prunes
    the parse to the fields actually used."""
    return _read_extract_sibling(
        spark, path, glob, streaming, "metadata", "json", WAT_SCHEMA
    )


# --- WARC write side (r12) ---------------------------------------------------
# The inverse of read_warc: archive-pipeline users interchange WARC, so
# the corpus must round-trip OUT as spec-framed records, not only tar
# shards (operators/shards.py) and CDX lines (sources/cdx.py). Framing
# constants are shared by the pure-Python byte builder, the codegen
# render expression, and its DuckDB twin — one source of truth, the
# cdx_lines/surt_key precedent.

_WARC_VERSION = "WARC/1.0"
_WARC_HTTP_CTYPE = "application/http; msgtype=response"
_HTTP_REASON = "OK"


def _record_id_of(url: str, date: str) -> str:
    import hashlib

    return "<urn:md5:%s>" % hashlib.md5(f"{url} {date}".encode()).hexdigest()


def build_warc_record(
    url: str,
    date: str,
    payload: bytes,
    http_status: int = 200,
    content_type: str = "text/html",
    record_id: str | None = None,
) -> bytes:
    """Render ONE response row as a spec-framed WARC record: WARC/1.0
    header block (Content-Length = the HTTP block's octet count, the
    same framing ``parse_warc_records`` slices by), an HTTP/1.1
    response envelope carrying the row's status/content-type, the
    payload bytes, and the spec's record-terminating CRLF CRLF.
    ``record_id`` defaults to a DETERMINISTIC ``<urn:md5:...>`` of
    (url, date) — byte-identical output for identical rows, the
    shards.py reproducibility discipline (a uuid here would break the
    write->read roundtrip test and re-render determinism). Pure
    function; :func:`write_warc` applies it per task."""
    if record_id is None:
        record_id = _record_id_of(url, date)
    # UTF-8 throughout: WARC headers are UTF-8 per spec (ISO 28500 §4),
    # and a CJK/emoji path in an anchor-extracted URL would raise
    # UnicodeEncodeError under latin-1 inside the write task — failing
    # the micro-batch permanently on replay. UTF-8 octets also match
    # the codegen twin warc_record_expr (Spark strings are UTF-8), so
    # byte-identity holds for non-ASCII URLs too.
    http_head = (
        f"HTTP/1.1 {http_status} {_HTTP_REASON}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("utf-8")
    block = http_head + payload
    warc_head = (
        f"{_WARC_VERSION}\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: {record_id}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: {_WARC_HTTP_CTYPE}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode("utf-8")
    return warc_head + block + b"\r\n\r\n"


#: WARC-Profile URI for identical-payload-digest revisits (WARC 1.1 §6.7.2)
_REVISIT_PROFILE = (
    "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"
)


def build_warc_revisit_record(
    url: str,
    date: str,
    payload_digest: str,
    refers_to: str,
    record_id: str | None = None,
    http_status: int = 200,
    content_type: str = "text/html",
    payload_len: int = 0,
) -> bytes:
    """A ``WARC-Type: revisit`` record (identical-payload-digest
    profile) — how a deduplicating crawler records "this URL served
    bytes we already archived" without storing them again:
    ``WARC-Refers-To`` names the original record, ``WARC-Payload-
    Digest`` carries the shared digest, and the body is THIS capture's
    HTTP response head (status/content-type/length, no payload) — the
    real-WARC convention, so each capture's own metadata survives
    dedup (a 404 that served cached 200 bytes stays a 404 on
    read-back). Pure function; the :func:`write_warc` ``dedup_digest``
    leg applies it to every non-first occurrence."""
    if record_id is None:
        record_id = _record_id_of(url, date + "#revisit")
    # UTF-8 like build_warc_record — latin-1 raised on non-latin URLs
    http_head = (
        f"HTTP/1.1 {http_status} {_HTTP_REASON}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {payload_len}\r\n\r\n"
    ).encode("utf-8")
    head = (
        f"{_WARC_VERSION}\r\n"
        f"WARC-Type: revisit\r\n"
        f"WARC-Record-ID: {record_id}\r\n"
        f"WARC-Refers-To: {refers_to}\r\n"
        f"WARC-Profile: {_REVISIT_PROFILE}\r\n"
        f"WARC-Payload-Digest: md5:{payload_digest}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: {_WARC_HTTP_CTYPE}\r\n"
        f"Content-Length: {len(http_head)}\r\n\r\n"
    ).encode("utf-8")
    return head + http_head + b"\r\n\r\n"


def warc_record_expr(url, date, payload_text, http_status: int = 200,
                     content_type: str = "text/html"):
    """Codegen Column: the TEXT of :func:`build_warc_record` for a
    string payload (a text payload's bytes are its UTF-8 encoding, so
    octet_length drives both Content-Length fields exactly like the
    byte path — asserted equal in test_sources). Lets a plan compute
    rendered record lengths/hashes in-flight with zero Python;
    ``warc_sql`` is the DuckDB twin from the same constants."""
    from pyspark.sql import functions as F

    crlf = "\r\n"
    rid = F.concat(
        F.lit("<urn:md5:"),
        F.md5(F.concat(url, F.lit(" "), date).cast("binary")),
        F.lit(">"),
    )
    http_head = F.concat(
        F.lit(f"HTTP/1.1 {http_status} {_HTTP_REASON}{crlf}"
              f"Content-Type: {content_type}{crlf}Content-Length: "),
        F.octet_length(payload_text).cast("string"),
        F.lit(crlf + crlf),
    )
    block = F.concat(http_head, payload_text)
    warc_head = F.concat(
        F.lit(f"{_WARC_VERSION}{crlf}WARC-Type: response{crlf}"
              "WARC-Record-ID: "),
        rid,
        F.lit(f"{crlf}WARC-Date: "),
        date,
        F.lit(f"{crlf}WARC-Target-URI: "),
        url,
        F.lit(f"{crlf}Content-Type: {_WARC_HTTP_CTYPE}{crlf}"
              "Content-Length: "),
        F.octet_length(block).cast("string"),
        F.lit(crlf + crlf),
    )
    return F.concat(warc_head, block, F.lit(crlf + crlf))


def warc_sql(url_e: str, date_e: str, payload_e: str,
             http_status: int = 200, content_type: str = "text/html") -> str:
    """DuckDB twin of :func:`warc_record_expr`, generated from the SAME
    framing constants (strlen = DuckDB's byte length, the octet_length
    twin)."""
    cr = "(chr(13) || chr(10))"
    rid = f"('<urn:md5:' || md5({url_e} || ' ' || {date_e}) || '>')"
    http_head = (
        f"('HTTP/1.1 {http_status} {_HTTP_REASON}' || {cr} ||"
        f" 'Content-Type: {content_type}' || {cr} ||"
        f" 'Content-Length: ' || CAST(strlen({payload_e}) AS VARCHAR)"
        f" || {cr} || {cr})"
    )
    block = f"({http_head} || {payload_e})"
    warc_head = (
        f"('{_WARC_VERSION}' || {cr} || 'WARC-Type: response' || {cr} ||"
        f" 'WARC-Record-ID: ' || {rid} || {cr} ||"
        f" 'WARC-Date: ' || {date_e} || {cr} ||"
        f" 'WARC-Target-URI: ' || {url_e} || {cr} ||"
        f" 'Content-Type: {_WARC_HTTP_CTYPE}' || {cr} ||"
        f" 'Content-Length: ' || CAST(strlen({block}) AS VARCHAR)"
        f" || {cr} || {cr})"
    )
    return f"({warc_head} || {block} || {cr} || {cr})"


def build_warcinfo_record(filename: str, info: dict[str, str]) -> bytes:
    """A ``WARC-Type: warcinfo`` leader record (the Common Crawl file
    shape: every .warc.gz member stream opens with one): the body is
    the ``key: value`` lines of ``info`` (sorted — byte-determinism),
    the record id derives from (filename, body). Pure function."""
    body = "".join(
        f"{k}: {v}\r\n" for k, v in sorted(info.items())
    ).encode("utf-8")
    import hashlib

    rid = "<urn:md5:%s>" % hashlib.md5(
        filename.encode() + b"\x00" + body
    ).hexdigest()
    head = (
        f"{_WARC_VERSION}\r\n"
        f"WARC-Type: warcinfo\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"WARC-Filename: {filename}\r\n"
        f"Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("utf-8")
    return head + body + b"\r\n\r\n"


def write_warc(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    date_col: str = "warc_date",
    payload_col: str = "payload",
    status_col: str | None = "http_status",
    ctype_col: str | None = "content_type",
    records_per_file: int = 1000,
    gzip_members: bool = False,
    sort_within: bool = True,
    warcinfo: dict[str, str] | None = None,
    cdx: bool = False,
    cdx_filename_prefix: str = "",
    dedup_digest: bool = False,
    compression: str | None = None,
) -> DataFrame:
    """Write response rows as WARC files under ``out_dir`` — the
    inverse of :func:`read_warc` (write->read roundtrips the rows;
    tested byte-deterministically). Returns a small manifest DataFrame
    (file, n_records, n_bytes), also persisted as
    ``_warc_manifest.json`` — the write_tar_shards contract.

    Map-only, zero shuffle: each task renders its own partition's rows
    with :func:`build_warc_record` into files named
    ``part-{partition:05d}-{seq:04d}.warc[.gz]`` (partition id in the
    name — no two tasks collide, no driver coordination); with
    ``sort_within`` (default) rows render in (url, date) order so a
    given partitioning always produces byte-identical files.
    ``gzip_members=True`` writes ONE GZIP MEMBER PER RECORD,
    concatenated — the Common Crawl .warc.gz layout, which
    ``parse_warc_records`` reads back transparently. ``warcinfo``
    (r12): a ``{key: value}`` dict makes every file open with a
    ``WARC-Type: warcinfo`` leader record carrying those fields (the
    CC file shape — e.g. ``{"software": ..., "format": "WARC File
    Format 1.0"}``); ``read_warc``'s default type filter drops it on
    read-back, so roundtrips are unaffected. Same shared-mount caveat
    as write_tar_shards: plain file IO per task.

    ``cdx=True`` (r12) writes the capture INDEX alongside, the way a
    real archive pipeline publishes WARC + CDX together: each task
    emits a sibling ``part-*.cdxj`` with one CDXJ line per record —
    SURT urlkey (the shared ``urls.surt_key`` expression, computed
    in-plan), 14-digit timestamp from the date column, and a JSON
    block carrying url / mime / status / md5 digest plus the TRUE
    ``filename`` / ``offset`` / ``length`` of the just-written record
    (the compressed member's offset/length under ``gzip_members`` —
    the Common Crawl convention). The index feeds ``sources/cdx.py``
    unmodified: ``read_cdx(out_dir + "/*.cdxj")`` -> selection ->
    ``fetch_plan`` -> ``read_warc_ranges(base_dir=out_dir)`` range-
    reads exactly the chosen records back out of the files written
    here (roundtripped in test_cdx).

    ``dedup_digest=True`` (r12) writes the Common Crawl DEDUP shape:
    rows whose payload md5 repeats an earlier row's store as
    ``WARC-Type: revisit`` records (identical-payload-digest profile,
    ``WARC-Refers-To`` naming the original's deterministic id, empty
    body) instead of re-archiving the bytes — the only leg of this
    writer that shuffles (one exchange on the digest, which digest
    dedup requires by definition; first occurrence by (url, date)
    wins). CDX lines for revisits carry mime ``warc/revisit``, the CC
    convention. Read back losslessly with :func:`read_warc_deduped`.

    ``compression`` (r13): ``None`` | ``'gzip'`` | ``'zstd'`` — one
    compressed member PER RECORD, concatenated (the CC member layout
    in both codecs; ``parse_warc_records`` reads either transparently
    and the CDX offsets index the compressed members). ``'zstd'`` is
    Common Crawl's current interchange direction (``.warc.zst``) and
    sits behind the same gate as the read side (``zstandard`` package
    or the r14 ctypes system-libzstd shim — a clear ValueError on the
    DRIVER when neither resolves, not a per-task crash); frames are
    written at a fixed level with no checksum so output stays
    byte-deterministic per libzstd version. ``gzip_members=True``
    is the r12 spelling of ``compression='gzip'`` (kept for
    back-compat, byte-identical output)."""
    import json
    import os

    from pyspark.sql import functions as F

    if compression is None and gzip_members:
        compression = "gzip"
    if compression not in (None, "gzip", "zstd"):
        raise ValueError(
            f"write_warc: unknown compression {compression!r} "
            "(None | 'gzip' | 'zstd')"
        )
    if compression == "zstd":
        from data_ingestion_tool_bakasura__spark.sources.zstd_compat import (
            require_zstd,
        )

        # driver-side gate (never a per-task crash): the zstandard
        # package or the ctypes system-libzstd shim (r14)
        require_zstd("write_warc(compression='zstd')")

    os.makedirs(out_dir, exist_ok=True)
    status = (
        F.col(status_col) if status_col and status_col in df.columns
        else F.lit(200)
    )
    ctype = (
        F.col(ctype_col) if ctype_col and ctype_col in df.columns
        else F.lit("text/html")
    )
    payload = F.col(payload_col)
    if dict(df.dtypes).get(payload_col) == "string":
        payload = F.encode(payload, "utf-8")
    cols = [
        F.col(url_col).alias("_url"),
        F.col(date_col).alias("_date"),
        status.alias("_status"),
        ctype.alias("_ctype"),
        payload.alias("_payload"),
    ]
    if cdx:
        from data_ingestion_tool_bakasura__spark.functions.urls import surt_key

        # urlkey/ts/digest computed IN-PLAN (codegen) so the writer
        # task needs no Python twin of the SURT expression
        cols += [
            surt_key(F.col(url_col)).alias("_urlkey"),
            F.substring(
                F.regexp_replace(F.col(date_col).cast("string"),
                                 "[^0-9]", ""),
                1, 14,
            ).alias("_ts"),
        ]
    if cdx or dedup_digest:
        cols.append(F.md5(payload).alias("_digest"))
    src = df.select(*cols)
    if dedup_digest:
        from pyspark.sql import Window

        w = Window.partitionBy("_digest").orderBy("_url", "_date")
        first_url = F.first("_url").over(w)
        first_date = F.first("_date").over(w)
        src = (
            src.withColumn("_dup_rn", F.row_number().over(w))
            .withColumn(
                "_refers",
                F.when(
                    F.col("_dup_rn") > 1,
                    F.concat(
                        F.lit("<urn:md5:"),
                        F.md5(
                            F.concat(first_url, F.lit(" "), first_date)
                            .cast("binary")
                        ),
                        F.lit(">"),
                    ),
                ),
            )
            .drop("_dup_rn")
        )
    if sort_within:
        src = src.sortWithinPartitions("_url", "_date")
    ext = {"gzip": ".warc.gz", "zstd": ".warc.zst", None: ".warc"}[compression]

    def _write(batches):
        import json as _json

        from pyspark import TaskContext

        if compression == "zstd":
            from data_ingestion_tool_bakasura__spark.sources.zstd_compat import (
                require_zstd as _req,
            )

            # one reusable compressor per task; fixed level, library
            # defaults write no checksum -> byte-deterministic members
            # (package or ctypes-libzstd backend — same frame shape)
            _zc = _req("write_warc task").ZstdCompressor(level=3)

        def _member(rec: bytes) -> bytes:
            if compression == "gzip":
                # mtime pinned for byte determinism (shards._EPOCH
                # discipline); one member per record = the CC layout
                return gzip.compress(rec, mtime=0)
            if compression == "zstd":
                return _zc.compress(rec)
            return rec

        tc = TaskContext.get()
        pid = tc.partitionId()
        # per-ATTEMPT temp suffix: speculative execution or a retry
        # racing a zombie attempt would otherwise interleave writes to
        # the same part file and invalidate the sibling .cdxj offsets;
        # each attempt writes its own temp and os.replace()s into place
        # (atomic on POSIX), so the final name only ever holds one
        # attempt's complete bytes — last rename wins, both are valid.
        att = tc.taskAttemptId()
        seq = 0
        n = 0
        fh = None
        path = None
        tmp = None
        out: list[tuple[str, int, int]] = []
        cdx_lines_buf: list[str] = []

        def _open():
            nonlocal fh, path, tmp
            name = f"part-{pid:05d}-{seq:04d}{ext}"
            path = os.path.join(out_dir, name)
            # HIDDEN temp (leading dot): a zombie attempt that dies
            # before os.replace leaves its orphan behind, and
            # read_warc's default '*.warc*' glob — plus Spark's own
            # hidden-file filtering — must never pick the truncated
            # bytes up as a real archive (r13 ADVICE).
            tmp = os.path.join(out_dir, f".{name}.{att}.tmp")
            fh = open(tmp, "wb")
            if warcinfo is not None:
                # leader's id derives from the FINAL name, not the tmp
                fh.write(_member(build_warcinfo_record(name, warcinfo)))

        def _close():
            nonlocal fh, seq, n
            if fh is not None:
                fh.close()
                os.replace(tmp, path)
                out.append((os.path.basename(path), n, os.path.getsize(path)))
                if cdx:
                    cname = f"part-{pid:05d}-{seq:04d}.cdxj"
                    cpath = os.path.join(out_dir, cname)
                    # same hidden-temp discipline as the .warc temp —
                    # read_cdx's '*.cdxj' glob happens not to match the
                    # old suffix form, but the dot prefix makes the
                    # invariant structural rather than accidental
                    ctmp = os.path.join(out_dir, f".{cname}.{att}.tmp")
                    with open(ctmp, "w") as cf:
                        cf.writelines(cdx_lines_buf)
                    os.replace(ctmp, cpath)
                    cdx_lines_buf.clear()
                fh = None
                seq += 1
                n = 0

        for pdf in batches:
            for tup in pdf.itertuples(index=False):
                r = dict(zip(pdf.columns, tup))
                url, date = r["_url"] or "", r["_date"] or ""
                st = r["_status"]
                if fh is None:
                    _open()
                stat = 200 if st is None or pd.isna(st) else int(st)
                mime = r["_ctype"] or "text/html"
                refers = r.get("_refers") if dedup_digest else None
                if dedup_digest and refers is not None and not pd.isna(refers):
                    body = r["_payload"]
                    rec = build_warc_revisit_record(
                        url, date, r["_digest"], refers,
                        http_status=stat, content_type=mime,
                        payload_len=0 if body is None else len(bytes(body)),
                    )
                    mime = "warc/revisit"  # the CC CDX convention
                else:
                    body = r["_payload"]
                    rec = build_warc_record(
                        url, date,
                        bytes(body) if body is not None else b"",
                        http_status=stat,
                        content_type=mime,
                    )
                rec = _member(rec)
                if cdx:
                    # CC convention: offset/length of the (compressed)
                    # member as written — read_warc_ranges seeks these
                    block = _json.dumps(
                        {
                            "url": url,
                            "mime": mime,
                            "status": str(stat),
                            "digest": r["_digest"],
                            "length": str(len(rec)),
                            "offset": str(fh.tell()),
                            "filename": cdx_filename_prefix
                            + os.path.basename(path),
                        },
                        sort_keys=True,
                    )
                    cdx_lines_buf.append(f"{r['_urlkey']} {r['_ts']} {block}\n")
                fh.write(rec)
                n += 1
                if n >= records_per_file:
                    _close()
        _close()
        yield pd.DataFrame(out, columns=["file", "n_records", "n_bytes"])

    manifest = src.mapInPandas(
        _write, "file string, n_records long, n_bytes long"
    )
    rows = manifest.collect()  # O(files), the export's only action
    # atomic manifest (r14-late review, the write_tar_shards fix):
    # a crash mid-dump must never leave truncated JSON live
    mtmp = os.path.join(out_dir, "._warc_manifest.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(
            [{"file": r["file"], "n_records": r["n_records"],
              "n_bytes": r["n_bytes"]} for r in sorted(rows)],
            f, indent=0, sort_keys=True,
        )
    os.replace(mtmp, os.path.join(out_dir, "_warc_manifest.json"))
    return df.sparkSession.createDataFrame(
        rows, "file string, n_records long, n_bytes long"
    )


REVISIT_SCHEMA = (
    "path string, record_id string, url string, warc_date string, "
    "refers_to string, payload_digest string, content_type string, "
    "http_status int"
)


def read_warc_revisits(
    spark: SparkSession,
    path: str,
    glob: str | None = "*.warc*",
    streaming: bool = False,
) -> DataFrame:
    """``WARC-Type: revisit`` rows with the headers the fixed response
    schema drops: ``refers_to`` (the original's record id),
    ``payload_digest`` (hex, algorithm prefix stripped), and THIS
    capture's own ``content_type``/``http_status`` parsed from the
    revisit record's HTTP head (NULL when the record carries none).
    Same explode seam as :func:`read_warc`."""
    from data_ingestion_tool_bakasura__spark.sources.readers import read_binary_files

    src = read_binary_files(spark, path, glob=glob, streaming=streaming).select(
        "path", "content"
    )

    def _explode(batches):
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for headers, body in parse_warc_records(bytes(content)):
                    if headers.get("warc-type", "").lower() != "revisit":
                        continue
                    dig = headers.get("warc-payload-digest", "")
                    status, ctype, _ = split_http_response(body)
                    rows.append((
                        path_,
                        headers.get("warc-record-id", ""),
                        headers.get("warc-target-uri", ""),
                        headers.get("warc-date", ""),
                        headers.get("warc-refers-to", ""),
                        dig.split(":", 1)[-1],
                        ctype,
                        status,
                    ))
            yield pd.DataFrame(
                rows,
                columns=["path", "record_id", "url", "warc_date",
                         "refers_to", "payload_digest", "content_type",
                         "http_status"],
            )

    return src.mapInPandas(_explode, REVISIT_SCHEMA)


def read_warc_deduped(
    spark: SparkSession,
    path: str,
    glob: str | None = "*.warc*",
) -> DataFrame:
    """Lossless inverse of ``write_warc(dedup_digest=True)``: response
    rows as-is, UNION revisit rows with their payload restored from
    the digest-matching original — back to one full row per pre-dedup
    source row, ``warc_type`` telling the restored ones apart. Each
    revisit keeps its OWN http_status/content_type (parsed from the
    revisit record's HTTP head — a 404 that served cached 200 bytes
    stays a 404), falling back to the original's only when the record
    carries no HTTP head. One join on the digest key (the restore's
    irreducible exchange; the response side is the small distinct-
    digest set)."""
    from pyspark.sql import functions as F

    resp = read_warc(spark, path, glob=glob)
    rev = read_warc_revisits(spark, path, glob=glob)
    originals = (
        resp.withColumn("payload_digest", F.md5("payload"))
        .select(
            "payload_digest",
            F.col("content_type").alias("_orig_ctype"),
            F.col("http_status").alias("_orig_status"),
            "payload",
        )
        .dropDuplicates(["payload_digest"])
    )
    restored = rev.join(originals, "payload_digest").select(
        "path",
        "record_id",
        F.lit("revisit").alias("warc_type"),
        "url",
        "warc_date",
        F.coalesce("content_type", "_orig_ctype").alias("content_type"),
        F.coalesce("http_status", "_orig_status").alias("http_status"),
        "payload",
    )
    return resp.unionByName(restored)


def decode_payload_udf():
    """Arrow-batched UDF: (payload binary, content_type string) ->
    decoded text, honoring the Content-Type charset parameter
    (``text/html; charset=ISO-8859-1``) with UTF-8 default and
    per-row fallback to latin-1 (which cannot fail) — a blind
    ``cast("string")`` mangles every non-UTF-8 page. Unknown charset
    labels fall back the same way; bytes never raise."""
    import codecs
    import re as _re

    import pandas as pd  # noqa: F811 (executor-side import)

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cs_re = _re.compile(r"charset=[\"']?([A-Za-z0-9_.:-]+)", _re.I)

    @F.pandas_udf(T.StringType())
    def _dec(payload: pd.Series, ctype: pd.Series) -> pd.Series:
        def one(b, ct):
            if b is None:
                return ""
            enc = "utf-8"
            m = cs_re.search(ct or "")
            if m:
                try:
                    codecs.lookup(m.group(1))
                    enc = m.group(1)
                except LookupError:
                    pass
            try:
                return bytes(b).decode(enc, "replace")
            except (LookupError, ValueError):
                return bytes(b).decode("latin-1")

        return pd.Series([one(b, c) for b, c in zip(payload, ctype)])

    return _dec
