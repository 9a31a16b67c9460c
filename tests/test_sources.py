"""Source/sink coverage (SURVEY §2.C1/C2): csv/json/text readers
roundtrip typed data; parquet partitioned write prunes on read."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.sources.readers import (
    load_table,
    read_csv,
    read_json,
    read_text,
)
from tests.conftest import SF_SMOKE


def test_csv_roundtrip(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "region")
    p = str(tmp_path / "region_csv")
    src.write.option("header", "true").csv(p)
    back = read_csv(spark, p, schema=src.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_json_roundtrip(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "nation").select("n_nationkey", "n_name")
    p = str(tmp_path / "nation_json")
    src.write.json(p)
    back = read_json(spark, p).select("n_nationkey", "n_name")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_text_source(spark, tmp_path):
    f = tmp_path / "doc.txt"
    f.write_text("line one\nline two\nline three")
    lines = read_text(spark, str(f))
    assert lines.count() == 3
    whole = read_text(spark, str(f), whole=True)
    assert whole.count() == 1 and "line two" in whole.first()["value"]


def test_partitioned_parquet_write_prunes(spark, tmp_path):
    """C2 + scale contract: partitionBy on write -> partition pruning on
    filtered read (the plan must not list every partition)."""
    src = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    p = str(tmp_path / "orders_part")
    src.write.partitionBy("o_orderpriority").parquet(p)
    back = spark.read.parquet(p).filter(F.col("o_orderpriority") == "1-URGENT")
    want = src.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert back.count() == want
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or want == back.count()


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from data_ingestion_tool_bakasura__spark.sources.readers import read_orc

    src = load_table(spark, SF_SMOKE, "nation")
    p = str(tmp_path / "nation_orc")
    src.write.orc(p)
    back = read_orc(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    # predicate + projection reach the ORC scan
    plan = (
        back.filter(F.col("n_regionkey") == 1)
        .select("n_name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(n_regionkey), EqualTo(n_regionkey,1)]" in plan


def test_read_json_with_errors_quarantines_bad_lines(spark, tmp_path):
    """One malformed line among good ones: the good frame parses fully,
    the bad frame carries exactly the raw corrupt text, nothing raises.
    (Spark requires the corrupt-record query shape used here: the
    filter/drop on the corrupt column happens AFTER a full-schema
    parse, never a corrupt-column-only projection.)"""
    from pyspark.sql import types as T

    from data_ingestion_tool_bakasura__spark.sources.readers import (
        read_json_with_errors,
    )

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"id": 1, "text": "alpha"}\n'
        "{this is not json}\n"
        '{"id": 2, "text": "beta"}\n'
        '{"id": "NaN-ish", "text": 3}\n'  # type mismatch -> corrupt too
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("text", T.StringType())]
    )
    good, bad = read_json_with_errors(spark, str(p), schema)
    assert sorted(map(tuple, good.collect())) == [(1, "alpha"), (2, "beta")]
    raws = sorted(r["raw"] for r in bad.collect())
    assert raws == ['{"id": "NaN-ish", "text": 3}', "{this is not json}"]


def test_read_csv_with_errors_quarantines_bad_lines(spark, tmp_path):
    """CSV error channel: a type-mismatched row quarantines with its raw
    line; good rows parse; the header is dropped."""
    from pyspark.sql import types as T

    from data_ingestion_tool_bakasura__spark.sources.readers import (
        read_csv_with_errors,
    )

    p = tmp_path / "rows.csv"
    p.write_text("id,qty\n1,10\nnot-a-number,20\n3,thirty\n4,40\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("qty", T.LongType())]
    )
    good, bad = read_csv_with_errors(spark, str(p), schema, header=True)
    assert sorted(map(tuple, good.collect())) == [(1, 10), (4, 40)]
    assert sorted(r["raw"] for r in bad.collect()) == ["3,thirty", "not-a-number,20"]


def test_schema_evolution_merge_and_union(spark, tmp_path):
    """Schema drift across landed batches (a later producer added a
    column): mergeSchema=true reads the union schema with nulls for
    early files, and unionByName(allowMissingColumns=True) is the
    frame-level equivalent for in-flight merges — both standard drift
    answers a long-lived ingest needs."""
    p = str(tmp_path / "tbl")
    old = spark.createDataFrame([(1, "a")], "id long, text string")
    new = spark.createDataFrame(
        [(2, "b", "en")], "id long, text string, lang string"
    )
    old.write.mode("append").parquet(p)
    new.write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "text", "lang"}
    rows = {r["id"]: r["lang"] for r in merged.collect()}
    assert rows == {1: None, 2: "en"}

    framed = old.unionByName(new, allowMissingColumns=True)
    assert {r["id"]: r["lang"] for r in framed.collect()} == rows


# --- WARC source (C1 aperture, round 10) -----------------------------------

def _warc_record(rtype: str, uri: str, body: bytes, rid: str) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2026-08-14T00:00:00Z\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def _http_response(html: bytes, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode() + html


def _fixture_warc() -> bytes:
    """Two response records (one with 'WARC/' INSIDE the payload — the
    framing must come from Content-Length, not a delimiter scan), one
    request and one warcinfo record that the default filter drops."""
    html_a = b"<html><head><style>x{}</style></head><body><h1>Alpha</h1><p>quokka research notes</p></body></html>"
    html_b = b"<html><body><p>payload mentions WARC/1.0 inline</p></body></html>"
    return (
        _warc_record("warcinfo", "", b"software: test\r\n", "w0")
        + _warc_record("request", "http://a.example/", b"GET / HTTP/1.1\r\n\r\n", "r1")
        + _warc_record("response", "http://a.example/", _http_response(html_a), "a1")
        + _warc_record("response", "http://b.example/x", _http_response(html_b), "b1")
    )


def test_parse_warc_records_framing_and_gzip():
    import gzip

    from data_ingestion_tool_bakasura__spark.sources.warc import (
        parse_warc_records,
        split_http_response,
    )

    raw = _fixture_warc()
    recs = parse_warc_records(raw)
    assert [h["warc-type"] for h, _ in recs] == [
        "warcinfo", "request", "response", "response",
    ]
    status, ctype, payload = split_http_response(recs[3][1])
    assert status == 200 and ctype == "text/html"
    assert b"WARC/1.0 inline" in payload  # Content-Length framing held

    # per-record gzip members (the Common Crawl layout) parse identically
    members = b"".join(
        gzip.compress(_warc_record("response", "http://c.example/", _http_response(b"<p>c</p>"), "c1"))
        for _ in range(2)
    )
    assert len(parse_warc_records(members)) == 2


def test_parse_warc_missing_content_length_drops_record():
    """A record with NO Content-Length has an unframed body: it must be
    DROPPED and the scan must skip to the next '\\r\\n\\r\\nWARC/'
    boundary — resuming inside its payload would parse payload bytes
    mentioning 'WARC/' as spurious records (r10 ADVICE)."""
    from data_ingestion_tool_bakasura__spark.sources.warc import parse_warc_records

    bad_head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:bad1>\r\n"
        b"WARC-Target-URI: http://bad.example/\r\n"
        b"\r\n"  # <-- no Content-Length
    )
    # payload contains a fake in-band record start that MUST NOT be parsed
    bad_body = b"binary junk WARC/1.0\r\nWARC-Type: response\r\nmore junk"
    good = _warc_record(
        "response", "http://good.example/", _http_response(b"<p>ok</p>"), "g1"
    )
    recs = parse_warc_records(bad_head + bad_body + b"\r\n\r\n" + good)
    assert [h["warc-target-uri"] for h, _ in recs] == ["http://good.example/"]

    # unparseable Content-Length behaves the same way
    mangled = bad_head.replace(b"\r\n\r\n", b"\r\nContent-Length: NaN\r\n\r\n")
    recs2 = parse_warc_records(mangled + bad_body + b"\r\n\r\n" + good)
    assert [h["warc-target-uri"] for h, _ in recs2] == ["http://good.example/"]

    # a trailing malformed record (no boundary after it) parses to nothing
    assert parse_warc_records(bad_head + bad_body) == []


def test_read_warc_to_documents_e2e(spark, tmp_path):
    """WARC archive -> read_warc (response rows only) -> html_to_text ->
    the ordinary ingest pipeline: the Common Crawl shape end-to-end."""
    from data_ingestion_tool_bakasura__spark.functions.text import (
        html_to_text_py,
        html_to_text_udf,
    )
    from data_ingestion_tool_bakasura__spark.operators.ingest import (
        IngestConfig,
        ingest_documents,
    )
    from data_ingestion_tool_bakasura__spark.sources.warc import read_warc

    (tmp_path / "crawl").mkdir()
    (tmp_path / "crawl" / "part-00000.warc").write_bytes(_fixture_warc())

    rows = read_warc(spark, str(tmp_path / "crawl")).orderBy("url")
    got = rows.collect()
    assert [r["url"] for r in got] == ["http://a.example/", "http://b.example/x"]
    assert all(r["warc_type"] == "response" and r["http_status"] == 200 for r in got)

    docs = rows.select(
        F.col("url").alias("doc_id"),
        html_to_text_udf()(F.col("payload").cast("string")).alias("text"),
    )
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert texts["http://a.example/"] == "Alpha\nquokka research notes"
    # UDF output equals the pure function on identical input
    assert texts["http://a.example/"] == html_to_text_py(
        "<html><head><style>x{}</style></head><body><h1>Alpha</h1><p>quokka research notes</p></body></html>"
    )

    chunks = ingest_documents(docs, cfg=IngestConfig(embedding_dim=8))
    assert chunks.count() >= 2 and chunks.filter(F.col("content").contains("quokka")).count() == 1


def test_read_warc_streaming_incremental(spark, tmp_path):
    """The streaming leg parses each archive exactly once per trigger:
    run 1 sees the first file's responses; a second availableNow run
    over the same checkpoint sees ONLY the file dropped in between."""
    from data_ingestion_tool_bakasura__spark.sources.warc import read_warc

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    (crawl / "w1.warc").write_bytes(_fixture_warc())

    def run_once():
        q = (
            read_warc(spark, str(crawl), streaming=True)
            .drop("payload")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r["url"] for r in spark.read.parquet(out).collect())

    assert run_once() == ["http://a.example/", "http://b.example/x"]

    (crawl / "w2.warc").write_bytes(
        _warc_record("response", "http://c.example/", _http_response(b"<p>c</p>"), "c1")
    )
    # second run over the same checkpoint appends ONLY the new archive —
    # exactly 3 rows total; a re-parse of w1 would duplicate its two
    assert run_once() == [
        "http://a.example/", "http://b.example/x", "http://c.example/",
    ]


def _wet_record(uri: str, text: bytes, rid: str) -> bytes:
    head = (
        f"WARC/1.0\r\nWARC-Type: conversion\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2026-08-14T00:00:00Z\r\n"
        f"Content-Length: {len(text)}\r\n\r\n"
    ).encode()
    return head + text + b"\r\n\r\n"


def test_read_wet_batch_and_crawl_ops(spark, tmp_path):
    """r11 C20: WET (extracted-text) records parse to (url, text) rows
    — UTF-8 roundtrip exact, warcinfo header record dropped — and flow
    straight through the crawl curation ops (url_dedup collapses a
    tracking-param twin)."""
    from data_ingestion_tool_bakasura__spark.operators.crawl import url_dedup
    from data_ingestion_tool_bakasura__spark.sources.warc import read_wet

    d = tmp_path / "wet"
    d.mkdir()
    wetinfo = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 14\r\n\r\n"
        b"software: test\r\n\r\n"
    )
    (d / "a.warc.wet").write_bytes(
        wetinfo
        + _wet_record("https://x.example/p", "café text — réel".encode(), "1")
        + _wet_record("https://x.example/p?utm_source=f", b"dup copy", "2")
        + _wet_record("https://y.example/q", b"other page", "3")
    )
    rows = read_wet(spark, str(d)).orderBy("url").collect()
    assert [r["url"] for r in rows] == [
        "https://x.example/p", "https://x.example/p?utm_source=f",
        "https://y.example/q",
    ]
    assert rows[0]["text"] == "café text — réel"
    deduped = url_dedup(read_wet(spark, str(d)), "url", order_col="url")
    assert sorted(r["norm_url"] for r in deduped.collect()) == [
        "https://x.example/p", "https://y.example/q",
    ]


def test_read_wet_streaming_incremental(spark, tmp_path):
    """read_wet's streaming twin: each WET member parsed exactly once
    per trigger (parity with the read_warc streaming contract)."""
    from data_ingestion_tool_bakasura__spark.sources.warc import read_wet

    d = tmp_path / "wet"
    d.mkdir()
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    (d / "w1.warc.wet").write_bytes(_wet_record("https://a.example/", b"one", "1"))

    def run_once():
        q = (
            read_wet(spark, str(d), streaming=True)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r["url"] for r in spark.read.parquet(out).collect())

    assert run_once() == ["https://a.example/"]
    (d / "w2.warc.wet").write_bytes(_wet_record("https://b.example/", b"two", "2"))
    assert run_once() == ["https://a.example/", "https://b.example/"]


def test_read_wat_json_metadata(spark, tmp_path):
    """WAT metadata records surface as a string JSON column that
    composes with get_json_object."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_bakasura__spark.sources.warc import read_wat

    d = tmp_path / "wat"
    d.mkdir()
    body = b'{"links": 3, "title": "Hello"}'
    head = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\n"
        b"WARC-Target-URI: https://a.example/\r\n"
        b"Content-Length: %d\r\n\r\n" % len(body)
    )
    (d / "a.warc.wat").write_bytes(head + body + b"\r\n\r\n")
    r = (
        read_wat(spark, str(d))
        .select("url", F.get_json_object("json", "$.title").alias("title"))
        .first()
    )
    assert (r["url"], r["title"]) == ("https://a.example/", "Hello")


def test_split_http_response_dechunks():
    from data_ingestion_tool_bakasura__spark.sources.warc import (
        _dechunk,
        split_http_response,
    )

    chunked = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        b"5;ext=1\r\n<p>he\r\n6\r\nllo</p\r\n1\r\n>\r\n0\r\n\r\n"
    )
    status, ctype, payload = split_http_response(chunked)
    assert status == 200 and ctype == "text/html"
    assert payload == b"<p>hello</p>"
    # malformed size token: decode what's valid, never raise
    assert _dechunk(b"3\r\nabc\r\nZZ\r\nrest") == b"abc"


def test_split_http_response_content_encoding():
    import gzip as _gz
    import zlib

    from data_ingestion_tool_bakasura__spark.sources.warc import split_http_response

    def resp(headers: str, payload: bytes) -> bytes:
        return (f"HTTP/1.1 200 OK\r\n{headers}\r\n\r\n").encode() + payload

    html = b"<p>compressed page body</p>"
    # gzip body
    _, _, p = split_http_response(
        resp("Content-Type: text/html\r\nContent-Encoding: gzip", _gz.compress(html))
    )
    assert p == html
    # raw-deflate body (some servers send deflate without zlib header)
    raw = zlib.compressobj(wbits=-15)
    body = raw.compress(html) + raw.flush()
    _, _, p = split_http_response(
        resp("Content-Type: text/html\r\nContent-Encoding: deflate", body)
    )
    assert p == html
    # chunked + gzip compose (wire order: chunking wraps the encoded body)
    gz = _gz.compress(html)
    chunked = f"{len(gz):x}\r\n".encode() + gz + b"\r\n0\r\n\r\n"
    _, _, p = split_http_response(
        resp(
            "Content-Type: text/html\r\nTransfer-Encoding: chunked\r\n"
            "Content-Encoding: gzip",
            chunked,
        )
    )
    assert p == html
    # undecodable garbage under a gzip header passes through untouched
    _, _, p = split_http_response(
        resp("Content-Encoding: gzip", b"\x00not really gzip")
    )
    assert p == b"\x00not really gzip"


def test_decode_payload_honors_charset(spark):
    from data_ingestion_tool_bakasura__spark.sources.warc import decode_payload_udf
    from pyspark.sql import functions as F

    rows = [
        (1, "café crème".encode("iso-8859-1"), "text/html; charset=ISO-8859-1"),
        (2, "naïve".encode("utf-8"), "text/html"),
        (3, "junk".encode() + b"\xff\xfe", "text/html; charset=not-a-charset"),
        (4, None, "text/html"),
    ]
    df = spark.createDataFrame(rows, "i int, payload binary, content_type string")
    got = {
        r["i"]: r["t"]
        for r in df.select(
            "i", decode_payload_udf()(F.col("payload"), F.col("content_type")).alias("t")
        ).collect()
    }
    assert got[1] == "café crème"       # latin-1 honored, not mangled
    assert got[2] == "naïve"
    assert got[3].startswith("junk")    # bad label -> utf-8 replace, no raise
    assert got[4] == ""


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["response", "request", "metadata"]),
            st.text(alphabet="abcxyz:/.?&=%", min_size=0, max_size=30),
            st.binary(min_size=0, max_size=200),
            st.booleans(),  # gzip this member?
        ),
        min_size=1,
        max_size=6,
    )
)
def test_parse_warc_records_roundtrip_property(recs):
    """PROPERTY: serialize arbitrary records (binary bodies containing
    CRLFs, 'WARC/' magic, anything) -> parse_warc_records recovers
    every header and body byte-exactly, with per-record gzip members
    mixed into the same stream."""
    import gzip as _gz

    from data_ingestion_tool_bakasura__spark.sources.warc import parse_warc_records

    stream = b""
    for i, (rtype, uri, body, gz) in enumerate(recs):
        head = (
            f"WARC/1.0\r\nWARC-Type: {rtype}\r\nWARC-Target-URI: {uri}\r\n"
            f"WARC-Record-ID: <urn:uuid:{i}>\r\nContent-Length: {len(body)}\r\n\r\n"
        ).encode()
        member = head + body + b"\r\n\r\n"
        stream += _gz.compress(member) if (gz and i == 0) else member
    # gzip only valid as whole-stream prefix members; if first member is
    # gzipped the remainder must be gzipped members too for the
    # decompress-then-scan contract, so only test the all-plain and
    # first-member-plain layouts here plus a separate all-gzip check
    if stream[:2] == b"\x1f\x8b":
        stream = b"".join(
            _gz.compress(
                (
                    f"WARC/1.0\r\nWARC-Type: {r}\r\nWARC-Target-URI: {u}\r\n"
                    f"WARC-Record-ID: <urn:uuid:{i}>\r\nContent-Length: {len(b)}\r\n\r\n"
                ).encode() + b + b"\r\n\r\n"
            )
            for i, (r, u, b, _) in enumerate(recs)
        )
    got = parse_warc_records(stream)
    assert len(got) == len(recs)
    for (rtype, uri, body, _), (headers, got_body) in zip(recs, got):
        assert headers["warc-type"] == rtype
        assert got_body == body


def test_content_encoding_br_gate():
    """Runtime-branching (no skip): with brotli importable the body
    decodes; without it the compressed bytes pass through untouched."""
    from data_ingestion_tool_bakasura__spark.sources.warc import split_http_response

    body = b"\x8b\x03\x80not-actually-brotli"
    raw = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: br\r\n\r\n" + body
    )
    try:
        import brotli  # noqa: F401
        have = True
    except ImportError:
        have = False
    _, _, p = split_http_response(raw)
    if have:
        import brotli
        good = brotli.compress(b"<p>hi</p>")
        _, _, p2 = split_http_response(raw[: raw.index(b"\r\n\r\n") + 4] + good)
        assert p2 == b"<p>hi</p>"
    else:
        assert p == body  # gate closed: passthrough, no raise


# --- WARC write side (r12) ----------------------------------------------------


def _writer_rows(spark):
    return spark.createDataFrame(
        [
            ("http://a.example/", "2026-01-02T03:04:05Z", "text/html", 200,
             b"<html><body>alpha</body></html>"),
            # binary payload containing CRLFs and the 'WARC/' magic:
            # framing must be Content-Length-sliced, never delimiter-split
            ("http://b.example/x", "2026-01-02T03:04:06Z",
             "application/octet-stream", 404, b"\r\n\r\nWARC/1.0\x00\xff bin"),
            ("http://c.example/y", "2026-01-02T03:04:07Z", "text/plain", 200,
             b"plain body"),
            # non-latin-1 URL (CJK path): the write task must not raise
            # UnicodeEncodeError and the UTF-8 header must read back
            # verbatim (r13 ADVICE fix)
            ("http://d.example/文档/页", "2026-01-02T03:04:08Z",
             "text/html", 200, b"cjk url body"),
        ],
        "url string, warc_date string, content_type string,"
        " http_status int, payload binary",
    )


def test_write_warc_roundtrip_and_determinism(spark, tmp_path):
    """write_warc -> read_warc recovers every row (url, date, type,
    status, payload byte-exact); the manifest accounts for all records;
    two writes of the same frame are byte-identical."""
    from data_ingestion_tool_bakasura__spark.sources.warc import (
        read_warc,
        write_warc,
    )

    src = _writer_rows(spark).repartition(2, "url")
    man = write_warc(src, str(tmp_path / "out")).collect()
    assert sum(r["n_records"] for r in man) == 4
    back = read_warc(spark, str(tmp_path / "out"))
    got = sorted(
        (r["url"], r["warc_date"], r["content_type"], r["http_status"],
         bytes(r["payload"]))
        for r in back.collect()
    )
    want = sorted(
        (r["url"], r["warc_date"], r["content_type"], r["http_status"],
         bytes(r["payload"]))
        for r in src.collect()
    )
    assert got == want
    # record ids are the deterministic <urn:md5:...> of (url, date)
    assert all(r["record_id"].startswith("<urn:md5:")
               for r in back.collect())
    # byte determinism: same frame, same partitioning -> same bytes
    write_warc(src, str(tmp_path / "out2"))
    a = b"".join(
        p.read_bytes()
        for p in sorted((tmp_path / "out").glob("part-*.warc")))
    b = b"".join(
        p.read_bytes()
        for p in sorted((tmp_path / "out2").glob("part-*.warc")))
    assert a == b and len(a) > 0
    import json as _json

    m = _json.loads((tmp_path / "out" / "_warc_manifest.json").read_text())
    assert sum(e["n_records"] for e in m) == 4


def test_write_warc_gzip_members_roundtrip(spark, tmp_path):
    """gzip_members=True writes one gzip member per record (the CC
    .warc.gz layout); read_warc decompresses the concatenated members
    transparently."""
    from data_ingestion_tool_bakasura__spark.sources.warc import (
        read_warc,
        write_warc,
    )

    src = _writer_rows(spark).coalesce(1)
    write_warc(src, str(tmp_path / "gz"), gzip_members=True,
               records_per_file=2)  # forces a file roll mid-partition
    files = sorted((tmp_path / "gz").glob("part-*.warc.gz"))
    assert len(files) == 2
    assert all(p.read_bytes()[:2] == b"\x1f\x8b" for p in files)
    back = read_warc(spark, str(tmp_path / "gz"))
    got = sorted(
        (r["url"], r["http_status"], bytes(r["payload"]))
        for r in back.collect()
    )
    want = sorted(
        (r["url"], r["http_status"], bytes(r["payload"]))
        for r in src.collect()
    )
    assert got == want


def test_warc_record_expr_matches_byte_builder(spark):
    """The codegen render (warc_record_expr) and the pure-Python byte
    builder (build_warc_record) are the same framing: for a text
    payload the expression's UTF-8 encoding equals the byte path."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_bakasura__spark.sources.warc import (
        build_warc_record,
        warc_record_expr,
    )

    rows = [("http://a.example/", "2026-01-02T03:04:05Z", "héllo <b>x</b>"),
            ("http://b.example/p?q=1", "2026-01-02T03:04:06Z", ""),
            # non-ASCII target URI above U+00FF (CJK path + emoji query,
            # routine in anchor-extracted crawl URLs): r13 moved the
            # byte builder to UTF-8 headers (latin-1 raised here and
            # diverged from the UTF-8-octet codegen twin)
            ("http://c.example/文档/页?q=🦉", "2026-01-02T03:04:07Z",
             "body")]
    df = spark.createDataFrame(rows, "url string, d string, body string")
    rendered = {
        r["url"]: r["rec"]
        for r in df.select(
            "url",
            warc_record_expr(
                F.col("url"), F.col("d"), F.col("body"),
                http_status=301, content_type="text/plain",
            ).alias("rec"),
        ).collect()
    }
    for url, d, body in rows:
        want = build_warc_record(
            url, d, body.encode("utf-8"),
            http_status=301, content_type="text/plain",
        )
        assert rendered[url].encode("utf-8") == want


def test_export_warc_cli_roundtrip(spark, tmp_path, capsys):
    """curate_cli export-warc: a curated corpus parquet exports to
    spec-framed WARC files that read_warc roundtrips — the archive-
    interchange journey an end user runs."""
    import json as _json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import curate_cli

    from data_ingestion_tool_bakasura__spark.sources.warc import read_warc

    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        [("https://a.example/p", "alpha body"),
         ("https://b.example/q", "beta body")],
        "url string, text string",
    ).write.parquet(corpus)
    out = str(tmp_path / "warc_out")
    rc = curate_cli.main([
        "export-warc", corpus, out, "--gzip", "--date",
        "2026-03-01T00:00:00Z",
    ])
    ev = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and ev["event"] == "warc_exported"
    assert ev["n_records"] == 2 and ev["n_files"] >= 1
    back = {
        r["url"]: (r["warc_date"], bytes(r["payload"]).decode())
        for r in read_warc(spark, out).collect()
    }
    assert back == {
        "https://a.example/p": ("2026-03-01T00:00:00Z", "alpha body"),
        "https://b.example/q": ("2026-03-01T00:00:00Z", "beta body"),
    }
    # r13/r14: --compression zstd routes to the gate when NO backend
    # (zstandard package or system libzstd via zstd_compat) resolves
    # (clear error, exit 1), and works end-to-end when one does
    from data_ingestion_tool_bakasura__spark.sources.zstd_compat import (
        get_zstd,
    )

    out_z = str(tmp_path / "warc_z")
    if get_zstd() is not None:
        rc = curate_cli.main([
            "export-warc", corpus, out_z, "--compression", "zstd",
            "--date", "2026-03-01T00:00:00Z",
        ])
        assert rc == 0
        assert read_warc(spark, out_z).count() == 2
    else:
        import pytest as _pytest

        with _pytest.raises(ValueError, match="zstandard"):
            curate_cli.main([
                "export-warc", corpus, out_z, "--compression", "zstd",
                "--date", "2026-03-01T00:00:00Z",
            ])


def test_write_warc_warcinfo_leader(spark, tmp_path):
    """warcinfo= makes every written file open with a warcinfo leader
    record (the CC file shape); the default read filter drops it so
    roundtrips are unaffected, and types=() surfaces it."""
    from data_ingestion_tool_bakasura__spark.sources.warc import (
        read_warc,
        write_warc,
    )

    src = _writer_rows(spark).coalesce(1)
    write_warc(src, str(tmp_path / "wi"),
               warcinfo={"software": "bakasura-spark", "format": "WARC/1.0"})
    f = sorted((tmp_path / "wi").glob("part-*.warc"))[0]
    raw = f.read_bytes()
    assert raw.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo\r\n")
    assert b"WARC-Filename: " + f.name.encode() in raw
    assert b"software: bakasura-spark" in raw
    # default read: responses only, roundtrip unaffected
    back = read_warc(spark, str(tmp_path / "wi"))
    assert back.count() == 4
    assert set(r["warc_type"] for r in back.collect()) == {"response"}
    # types=() keeps everything: the leader is visible
    all_types = read_warc(spark, str(tmp_path / "wi"), types=())
    assert sorted(r["warc_type"] for r in all_types.collect()) == [
        "response", "response", "response", "response", "warcinfo",
    ]


def test_write_warc_dedup_digest_revisits(spark, tmp_path):
    """r12: dedup_digest writes repeated payloads as revisit records
    (identical-payload-digest profile, WARC-Refers-To the original's
    deterministic id, empty body — the CC dedup-crawl shape);
    read_warc_deduped restores every pre-dedup row losslessly, and
    the CDX sidecar tags revisits with mime warc/revisit."""
    import json as _json

    from data_ingestion_tool_bakasura__spark.sources.warc import (
        read_warc,
        read_warc_deduped,
        read_warc_revisits,
        write_warc,
    )

    shared = b"<p>the same bytes</p>"
    src = spark.createDataFrame(
        [
            ("https://a.example/p", "2026-03-01T00:00:00Z", "text/html", 200, shared),
            # a 404 that served cached 200 bytes: its OWN metadata must
            # survive dedup (r12 review finding — revisit records carry
            # the capture's HTTP head)
            ("https://b.example/q", "2026-03-02T00:00:00Z", "text/plain", 404, shared),
            ("https://c.example/r", "2026-03-03T00:00:00Z", "text/html", 200, b"unique"),
            ("https://d.example/s", "2026-03-04T00:00:00Z", "text/html", 200, shared),
        ],
        "url string, warc_date string, content_type string,"
        " http_status int, payload binary",
    ).coalesce(1)
    out = str(tmp_path / "dedup")
    write_warc(src, out, dedup_digest=True, cdx=True, gzip_members=True)

    # stored responses: only the digest-first occurrences
    resp = read_warc(spark, out)
    assert sorted(r["url"] for r in resp.collect()) == [
        "https://a.example/p", "https://c.example/r",
    ]
    rev = read_warc_revisits(spark, out).collect()
    assert sorted(r["url"] for r in rev) == [
        "https://b.example/q", "https://d.example/s",
    ]
    a_id = next(r["record_id"] for r in resp.collect()
                if r["url"] == "https://a.example/p")
    assert all(r["refers_to"] == a_id for r in rev)
    assert len({r["payload_digest"] for r in rev}) == 1

    # lossless restore — INCLUDING each capture's own HTTP metadata
    back = read_warc_deduped(spark, out)
    got = sorted(
        (r["url"], r["warc_date"], r["content_type"], r["http_status"],
         bytes(r["payload"])) for r in back.collect()
    )
    want = sorted(
        (r["url"], r["warc_date"], r["content_type"], r["http_status"],
         bytes(r["payload"])) for r in src.collect()
    )
    assert got == want
    assert back.filter("warc_type = 'revisit'").count() == 2

    # CDX sidecar: 4 lines, revisits tagged warc/revisit
    lines = []
    for p in sorted((tmp_path / "dedup").glob("*.cdxj")):
        lines += p.read_text().splitlines()
    assert len(lines) == 4
    mimes = sorted(
        _json.loads(ln.split(" ", 2)[2])["mime"] for ln in lines
    )
    assert mimes == ["text/html", "text/html", "warc/revisit", "warc/revisit"]


def test_parse_warc_zstd_member_gate():
    """r12/r14: a zstd-magic member either decodes (zstandard package
    or the ctypes system-libzstd backend) or raises the gated
    ValueError naming the package — never misparses as framing
    bytes. With a backend present, corrupt bytes after a real magic
    still raise (the loud-failure side of the gate)."""
    import pytest as _pytest

    from data_ingestion_tool_bakasura__spark.sources.warc import (
        parse_warc_records,
    )
    from data_ingestion_tool_bakasura__spark.sources.zstd_compat import (
        get_zstd,
    )

    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://z.example/\r\n"
        b"Content-Length: 4\r\n\r\nbody\r\n\r\n"
    )
    z = get_zstd()
    if z is None:
        with _pytest.raises(ValueError, match="zstandard"):
            parse_warc_records(b"\x28\xb5\x2f\xfd" + b"junk")
        # the CC seekable layout OPENS with a skippable frame
        # (magic 0x184D2A5x): it must hit the same gate, never fall
        # through to the delimiter scan and return zero records
        with _pytest.raises(ValueError, match="zstandard"):
            parse_warc_records(b"\x50\x2a\x4d\x18" + b"\x04\x00\x00\x00dict")
    else:
        got = parse_warc_records(z.ZstdCompressor(level=3).compress(rec))
        assert len(got) == 1 and got[0][1] == b"body"
        # a skippable frame LEADER followed by the member decodes too
        # (the CC seekable layout shape, minus the dictionary use)
        sk = b"\x50\x2a\x4d\x18" + b"\x04\x00\x00\x00dict"
        got = parse_warc_records(sk + z.ZstdCompressor(level=3).compress(rec))
        assert len(got) == 1 and got[0][1] == b"body"
        # corrupt tail after a real magic fails LOUDLY, never a
        # silently-short relation
        with _pytest.raises(ValueError, match="zstd"):
            parse_warc_records(b"\x28\xb5\x2f\xfd" + b"junkjunk")


def test_write_warc_compression_param_and_zstd_gate(spark, tmp_path):
    """r13: compression='gzip' is byte-identical to the r12
    gzip_members spelling; compression='zstd' without the zstandard
    package raises a clear ValueError on the DRIVER (the read-side
    gate's discipline), and an unknown codec raises immediately."""
    import pytest as _pytest

    from data_ingestion_tool_bakasura__spark.sources.warc import write_warc

    src = _writer_rows(spark).coalesce(1)
    write_warc(src, str(tmp_path / "a"), gzip_members=True,
               records_per_file=2)
    write_warc(src, str(tmp_path / "b"), compression="gzip",
               records_per_file=2)
    a = b"".join(p.read_bytes()
                 for p in sorted((tmp_path / "a").glob("part-*.warc.gz")))
    b = b"".join(p.read_bytes()
                 for p in sorted((tmp_path / "b").glob("part-*.warc.gz")))
    assert a == b and len(a) > 0

    with _pytest.raises(ValueError, match="compression"):
        write_warc(src, str(tmp_path / "c"), compression="lz4")

    from data_ingestion_tool_bakasura__spark.sources.zstd_compat import (
        get_zstd,
    )

    if get_zstd() is None:
        with _pytest.raises(ValueError, match="zstandard"):
            write_warc(src, str(tmp_path / "z"), compression="zstd")


def test_write_warc_zstd_roundtrip(spark, tmp_path):
    """r13 (.warc.zst write side): per-record zstd members roundtrip
    through read_warc byte-exactly, write twice is byte-identical, and
    the CDX sidecar's offsets index the true compressed members
    (read_warc_ranges fetches exactly the indexed records). Gated on
    a resolvable zstd backend (zstandard package or the r14 ctypes
    system-libzstd shim — on this host the shim makes the leg RUN)."""
    import pytest as _pytest

    from data_ingestion_tool_bakasura__spark.sources.zstd_compat import (
        get_zstd,
    )

    if get_zstd() is None:
        _pytest.skip("no zstd backend (package or system libzstd)")

    from data_ingestion_tool_bakasura__spark.sources.cdx import (
        fetch_plan,
        read_cdx,
        read_warc_ranges,
    )
    from data_ingestion_tool_bakasura__spark.sources.warc import (
        read_warc,
        write_warc,
    )

    src = _writer_rows(spark).coalesce(1)
    man = write_warc(src, str(tmp_path / "z1"), compression="zstd",
                     records_per_file=2, cdx=True,
                     warcinfo={"software": "t"}).collect()
    assert sum(r["n_records"] for r in man) == 4
    files = sorted((tmp_path / "z1").glob("part-*.warc.zst"))
    assert len(files) == 2
    assert all(p.read_bytes()[:4] == b"\x28\xb5\x2f\xfd" for p in files)
    back = read_warc(spark, str(tmp_path / "z1"))
    got = sorted((r["url"], r["http_status"], bytes(r["payload"]))
                 for r in back.collect())
    want = sorted((r["url"], r["http_status"], bytes(r["payload"]))
                  for r in src.collect())
    assert got == want
    # byte determinism across writes
    write_warc(src, str(tmp_path / "z2"), compression="zstd",
               records_per_file=2, cdx=True, warcinfo={"software": "t"})
    z1 = b"".join(p.read_bytes()
                  for p in sorted((tmp_path / "z1").glob("part-*.warc.zst")))
    z2 = b"".join(p.read_bytes()
                  for p in sorted((tmp_path / "z2").glob("part-*.warc.zst")))
    assert z1 == z2 and len(z1) > 0
    # CDX offsets are true member offsets in the zstd files
    caps = read_cdx(spark, str(tmp_path / "z1") + "/*.cdxj")
    fetched = read_warc_ranges(fetch_plan(caps), str(tmp_path / "z1"))
    got_rng = sorted((r["url"], r["http_status"], bytes(r["payload"]))
                     for r in fetched.collect())
    assert got_rng == want  # offsets index the true compressed members


def test_zstd_compat_ctypes_backend_contract():
    """r14: the ctypes system-libzstd shim honors the exact contract
    the warc legs rely on — one deterministic frame per compress
    call, read-across concatenated + skippable frames, LOUD errors
    on truncated or corrupt input (never a silently short corpus)."""
    import pytest as _pytest

    from data_ingestion_tool_bakasura__spark.sources import zstd_compat

    if zstd_compat._load_lib() is None:
        _pytest.skip("no system libzstd")
    shim = zstd_compat._CtypesShim
    c = shim.ZstdCompressor(level=3)
    a = c.compress(b"alpha record bytes " * 64)
    b = c.compress(b"beta")
    assert a[:4] == b"\x28\xb5\x2f\xfd"
    assert c.compress(b"alpha record bytes " * 64) == a  # deterministic
    skippable = b"\x50\x2a\x4d\x18" + (4).to_bytes(4, "little") + b"dict"
    with shim.ZstdDecompressor().stream_reader(
        skippable + a + b, read_across_frames=True
    ) as r:
        assert r.read() == b"alpha record bytes " * 64 + b"beta"
    with _pytest.raises(shim.ZstdError, match="truncated"):
        with shim.ZstdDecompressor().stream_reader(a[:-3]) as r:
            r.read()
    with _pytest.raises(shim.ZstdError):
        with shim.ZstdDecompressor().stream_reader(
            b"\x28\xb5\x2f\xfd" + b"garbage!"
        ) as r:
            r.read()
    with shim.ZstdDecompressor().stream_reader(b"") as r:
        assert r.read() == b""


def test_parse_warc_zst_dictionary_frame(spark, tmp_path):
    """r14: dictionary-bearing seekable .warc.zst — CC's layout,
    where the file OPENS with a skippable frame (magic 0x184D2A5D,
    the IIPC warc.zst convention) carrying the zstd dictionary every
    member was compressed with. parse_warc_records resolves the
    dictionary (raw or itself zstd-compressed) and decodes the
    members against it; a dictionary-compressed member with NO
    dictionary frame fails loudly (never a silently short corpus), a
    truncated dictionary frame fails loudly, and the full archive
    reads back through read_warc's distributed path. Gated on a
    resolvable zstd backend."""
    import pytest as _pytest

    from data_ingestion_tool_bakasura__spark.sources.warc import (
        parse_warc_records,
        read_warc,
    )
    from data_ingestion_tool_bakasura__spark.sources.zstd_compat import (
        get_zstd,
    )

    z = get_zstd()
    if z is None:
        _pytest.skip("no zstd backend (package or system libzstd)")

    # raw-content dictionary: the WARC header boilerplate the members
    # share — matches into it make member decode REQUIRE the dict
    dict_bytes = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
        b"http://zdict.example/common/path/prefix\r\n"
        b"Content-Type: text/html\r\n"
    ) * 8
    d = z.ZstdCompressionDict(dict_bytes)

    def rec(i: int, body: bytes) -> bytes:
        return (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: http://zdict.example/common/path/"
            f"prefix{i}\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body + b"\r\n\r\n"

    c = z.ZstdCompressor(level=3, dict_data=d)
    m1 = c.compress(rec(1, b"body-one"))
    m2 = c.compress(rec(2, b"body-two"))
    # the dictionary is genuinely referenced: dict members compress
    # far smaller than the no-dict frame of the same record
    assert len(m1) < len(z.ZstdCompressor(level=3).compress(rec(1, b"body-one")))

    def dict_frame(payload: bytes) -> bytes:
        return (b"\x5d\x2a\x4d\x18"
                + len(payload).to_bytes(4, "little") + payload)

    got = parse_warc_records(dict_frame(dict_bytes) + m1 + m2)
    assert [b for _, b in got] == [b"body-one", b"body-two"]

    # CC compresses the dictionary itself: payload = plain zstd frame
    dz = z.ZstdCompressor(level=3).compress(dict_bytes)
    got = parse_warc_records(dict_frame(dz) + m1 + m2)
    assert [b for _, b in got] == [b"body-one", b"body-two"]

    # dictionary-compressed members with NO dictionary frame: loud
    with _pytest.raises(ValueError, match="zstd WARC member"):
        parse_warc_records(m1 + m2)

    # truncated dictionary frame: loud, never a partial dictionary
    with _pytest.raises(ValueError, match="truncated"):
        parse_warc_records(
            b"\x5d\x2a\x4d\x18" + (9999).to_bytes(4, "little") + b"xx"
        )

    # the distributed read path resolves the dictionary per file
    p = tmp_path / "cc-layout.warc.zst"
    p.write_bytes(dict_frame(dz) + m1 + m2)
    back = read_warc(spark, str(p))
    rows = sorted((r["url"], bytes(r["payload"])) for r in back.collect())
    assert rows == [
        ("http://zdict.example/common/path/prefix1", b"body-one"),
        ("http://zdict.example/common/path/prefix2", b"body-two"),
    ]

    # CDX RANGE fetch into a dictionary-bearing archive — CC's
    # canonical access pattern: a member slice alone cannot decode, so
    # read_warc_ranges sniffs the leading dictionary frame once per
    # file and resolves it for every slice
    from data_ingestion_tool_bakasura__spark.sources.cdx import (
        fetch_plan,
        read_warc_ranges,
    )

    df_len = len(dict_frame(dz))
    caps = spark.createDataFrame(
        [("cc-layout.warc.zst", df_len, len(m1)),
         ("cc-layout.warc.zst", df_len + len(m1), len(m2))],
        "warc_file string, offset bigint, length bigint",
    )
    fetched = read_warc_ranges(fetch_plan(caps), str(tmp_path))
    got = sorted((r["url"], bytes(r["payload"])) for r in fetched.collect())
    assert got == rows


def test_write_warc_orphan_temp_invisible(spark, tmp_path):
    """r13 ADVICE (medium): a zombie attempt's orphaned temp file must
    be INVISIBLE to read-back. Temps are now dot-prefixed hidden files
    — Spark's binaryFile listing skips them — so a stray truncated
    temp in the output dir can never be parsed as a real archive, and
    a stray .cdxj temp never feeds read_cdx."""
    from data_ingestion_tool_bakasura__spark.sources.cdx import read_cdx
    from data_ingestion_tool_bakasura__spark.sources.warc import (
        read_warc,
        write_warc,
    )

    src = _writer_rows(spark).coalesce(1)
    out = tmp_path / "o"
    write_warc(src, str(out), cdx=True)
    # plant orphans shaped exactly like a died-mid-write attempt:
    # truncated archive bytes under the attempt-temp naming scheme
    real = sorted(out.glob("part-*.warc"))[0]
    (out / f".{real.name}.99.tmp").write_bytes(real.read_bytes()[:37])
    (out / ".part-00000-0000.cdxj.99.tmp").write_text("garbage not cdxj\n")
    back = read_warc(spark, str(out))
    assert back.count() == 4  # the orphan contributed nothing
    assert sorted(set(r["path"].rsplit("/", 1)[-1] for r in back.collect()))[0].startswith("part-")
    caps = read_cdx(spark, str(out) + "/*.cdxj")
    assert caps.count() == 4


def test_parse_warc_latin1_header_fallback():
    """r13: a FOREIGN archive whose WARC header block carries raw
    latin-1 bytes (invalid UTF-8 — e.g. a crawler that wrote 0xE9 for
    'é') still parses via the latin-1 fallback; our own UTF-8-written
    non-ASCII URIs decode exactly."""
    from data_ingestion_tool_bakasura__spark.sources.warc import (
        parse_warc_records,
    )

    body = b"payload"
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://caf\xe9.example/p\r\n"  # raw latin-1
        b"Content-Length: %d\r\n\r\n" % len(body)
    )
    recs = parse_warc_records(head + body + b"\r\n\r\n")
    assert len(recs) == 1
    assert recs[0][0]["warc-target-uri"] == "http://caf\xe9.example/p"
    assert recs[0][1] == body

    utf8_head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Target-URI: http://caf\xe9.example/文\r\n"
        "Content-Length: %d\r\n\r\n" % len(body)
    ).encode("utf-8")
    recs = parse_warc_records(utf8_head + body + b"\r\n\r\n")
    assert recs[0][0]["warc-target-uri"] == "http://caf\xe9.example/文"


def test_write_warc_roundtrip_property(spark, tmp_path):
    """PROPERTY (one Spark roundtrip over a seeded adversarial batch):
    write_warc -> read_warc recovers every row byte-exactly for URLs
    spanning ASCII / latin-1 / CJK / emoji / percent-encoded forms and
    payloads containing CRLFs, the 'WARC/' magic, NULs, gzip magic and
    empty bytes — in both the plain and gzip-member layouts (r13: the
    UTF-8 header + attempt-safe rename writer)."""
    import random

    from data_ingestion_tool_bakasura__spark.sources.warc import (
        read_warc,
        write_warc,
    )

    rng = random.Random(13)
    url_forms = [
        "https://plain.example/p{}",
        "https://caf\xe9.example/{}/\xe9t\xe9",
        "http://例え.jp/パス/{}",
        "https://emoji.example/{}?q=🦉&x=1",
        "https://pct.example/a%20b/{}",
    ]
    payload_pool = [
        b"", b"\x00", b"\r\n\r\nWARC/1.0\x00\xff", b"\x1f\x8b fake gzip",
        b"plain words " * 50, bytes(rng.randrange(256) for _ in range(257)),
    ]
    rows = [
        (url_forms[i % len(url_forms)].format(i),
         f"2026-05-0{1 + i % 9}T0{i % 10}:00:00Z",
         "text/html" if i % 2 else "application/octet-stream",
         200 if i % 3 else 404,
         payload_pool[i % len(payload_pool)])
        for i in range(23)
    ]
    src = spark.createDataFrame(
        rows,
        "url string, warc_date string, content_type string,"
        " http_status int, payload binary",
    ).repartition(3, "url")
    want = sorted(
        (r["url"], r["warc_date"], r["content_type"], r["http_status"],
         bytes(r["payload"])) for r in src.collect()
    )
    for layout, kw in (("plain", {}), ("gz", {"gzip_members": True})):
        out = str(tmp_path / layout)
        man = write_warc(src, out, records_per_file=7, **kw).collect()
        assert sum(r["n_records"] for r in man) == 23
        got = sorted(
            (r["url"], r["warc_date"], r["content_type"], r["http_status"],
             bytes(r["payload"])) for r in read_warc(spark, out).collect()
        )
        assert got == want, layout


def test_read_warc_ranges_truncated_dictionary_frame_is_loud(spark, tmp_path):
    """r14-late review: a dictionary frame whose declared size overruns
    the FILE (partial download) must fail loudly at the range-fetch
    sniff — a short read silently padded with member bytes would
    defeat the whole-file path's truncation guard and mis-seek into
    the member."""
    import pytest as _pytest

    from data_ingestion_tool_bakasura__spark.sources.cdx import (
        fetch_plan,
        read_warc_ranges,
    )

    p = tmp_path / "cut.warc.zst"
    p.write_bytes(b"\x5d\x2a\x4d\x18" + (9999).to_bytes(4, "little") + b"xx")
    caps = spark.createDataFrame(
        [("cut.warc.zst", 10, 5)],
        "warc_file string, offset bigint, length bigint",
    )
    with _pytest.raises(Exception, match="dictionary frame truncated"):
        read_warc_ranges(fetch_plan(caps), str(tmp_path)).collect()


def test_zstd_shim_large_record_drain_and_flag():
    """r14-late review of the ctypes backend: (1) payloads well past
    ZSTD_DStreamOutSize (~128 KB) — incompressible, compressible, and
    exactly-buffer-sized — roundtrip byte-identically: per zstd.h the
    decoder must be called again whenever it fills the output buffer,
    even with no input left, or internally buffered tail bytes are
    dropped and a valid archive mis-reports as truncated; (2) the shim
    REFUSES read_across_frames=False instead of silently concatenating
    (record framing must not differ between package- and shim-backed
    hosts); (3) genuine truncation is still loud."""
    import os

    import pytest as _pytest

    from data_ingestion_tool_bakasura__spark.sources import zstd_compat as Z

    if Z._load_lib() is None:
        _pytest.skip("no system libzstd")
    osz = Z._load_lib().ZSTD_DStreamOutSize()
    for payload in (
        os.urandom(1 << 20),
        b"WARC record boilerplate " * 43691,
        os.urandom(osz),
        b"x",
    ):
        comp = Z.ZstdCompressor(level=3).compress(payload)
        with Z.ZstdDecompressor().stream_reader(
            comp, read_across_frames=True
        ) as r:
            assert r.read() == payload
    with _pytest.raises(NotImplementedError):
        Z.ZstdDecompressor().stream_reader(b"", read_across_frames=False)
    comp = Z.ZstdCompressor(level=3).compress(os.urandom(400000))
    with _pytest.raises(Z.ZstdError, match="truncated"):
        with Z.ZstdDecompressor().stream_reader(
            comp[:-37], read_across_frames=True
        ) as r:
            r.read()


def test_error_channel_readers_skip_blank_lines(spark, tmp_path):
    """r16 review (reproduced): a blank line made from_json/from_csv
    return a NULL struct whose corrupt field is also null, so it
    classified as GOOD and emitted a phantom all-null row in both
    error-channel readers; the built-in readers skip blank lines, and
    these now match. null literals / bare scalars still quarantine."""
    from pyspark.sql import types as T

    from data_ingestion_tool_bakasura__spark.sources.readers import (
        read_csv_with_errors,
        read_json_with_errors,
    )

    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    jp = tmp_path / "data.jsonl"
    jp.write_text('{"a": 1, "b": "x"}\n\n   \nnull\n5\n')
    good, bad = read_json_with_errors(spark, str(jp), schema)
    assert [(r["a"], r["b"]) for r in good.collect()] == [(1, "x")]
    assert sorted(r["raw"] for r in bad.collect()) == ["5", "null"]

    cp = tmp_path / "data.csv"
    cp.write_text("1,x\n\nzz,y\n")
    good2, bad2 = read_csv_with_errors(spark, str(cp), schema)
    assert [(r["a"], r["b"]) for r in good2.collect()] == [(1, "x")]
    assert [r["raw"] for r in bad2.collect()] == ["zz,y"]


def test_json_error_reader_skips_tab_only_lines(spark, tmp_path):
    """r16 fix-chain review (reproduced): F.trim strips only ASCII
    spaces, so a tab-only line slipped the blank-line filter and
    emitted a phantom all-null good row; the filter now keeps lines
    with ANY non-whitespace (rlike)."""
    from pyspark.sql import types as T

    from data_ingestion_tool_bakasura__spark.sources.readers import (
        read_json_with_errors,
    )

    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    jp = tmp_path / "tabs.jsonl"
    jp.write_text('{"a": 1, "b": "x"}\n\t\n \t \n')
    good, bad = read_json_with_errors(spark, str(jp), schema)
    assert [(r["a"], r["b"]) for r in good.collect()] == [(1, "x")]
    assert bad.count() == 0
