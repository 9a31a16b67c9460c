"""CDX capture-index source (sources/cdx.py): typed parse, malformed
quarantine, latest-capture selection, per-WARC fetch planning."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.sources.cdx import (
    fetch_plan,
    latest_captures,
    read_cdx,
)


def _line(urlkey, ts, **j):
    return f"{urlkey} {ts} {json.dumps(j)}"


def _fixture(tmp_path):
    lines = [
        _line("org,example)/a", "20260101000000", url="https://example.org/a",
              mime="text/html", status="200", digest="AAA", length="500",
              offset="0", filename="w1.warc.gz"),
        # newer capture of the same urlkey -> must win
        _line("org,example)/a", "20260301000000", url="https://example.org/a",
              mime="text/html", status="200", digest="AAB", length="480",
              offset="9000", filename="w2.warc.gz"),
        # newest capture but a 404 -> filtered before the window
        _line("org,example)/a", "20260401000000", url="https://example.org/a",
              mime="text/html", status="404", digest="AAC", length="300",
              offset="99", filename="w2.warc.gz"),
        _line("org,example)/b", "20260101000000", url="https://example.org/b",
              mime="text/plain", status="200", digest="BBB", length="700",
              offset="600", filename="w1.warc.gz"),
        "this line is not cdx at all",
        "key 20260101000000 {not json",
    ]
    f = tmp_path / "idx.cdx"
    f.write_text("\n".join(lines) + "\n")
    return str(f)


def test_read_cdx_typed_and_quarantine(spark, tmp_path):
    df = read_cdx(spark, _fixture(tmp_path))
    ok = df.filter(F.col("url").isNotNull())
    bad = df.filter(F.col("url").isNull())
    assert ok.count() == 4 and bad.count() == 2
    row = ok.filter(F.col("digest") == "AAA").first()
    assert (row["urlkey"], row["ts"]) == ("org,example)/a", "20260101000000")
    assert row["status"] == 200 and row["offset"] == 0
    assert row["length"] == 500 and row["warc_file"] == "w1.warc.gz"


def test_latest_captures_status_first(spark, tmp_path):
    df = read_cdx(spark, _fixture(tmp_path)).filter(F.col("url").isNotNull())
    latest = {r["urlkey"]: r for r in latest_captures(df).collect()}
    assert len(latest) == 2
    # the 20260301 200-capture wins; the newer 404 was filtered first
    assert latest["org,example)/a"]["digest"] == "AAB"
    assert latest["org,example)/b"]["digest"] == "BBB"


def test_fetch_plan_grouping(spark, tmp_path):
    df = read_cdx(spark, _fixture(tmp_path)).filter(F.col("url").isNotNull())
    plan = {r["warc_file"]: r for r in
            fetch_plan(latest_captures(df)).collect()}
    assert set(plan) == {"w1.warc.gz", "w2.warc.gz"}
    assert plan["w1.warc.gz"]["n_records"] == 1
    assert plan["w1.warc.gz"]["bytes_total"] == 700
    w2 = plan["w2.warc.gz"]
    assert w2["n_records"] == 1 and w2["bytes_total"] == 480
    assert [tuple(r) for r in w2["ranges"]] == [(9000, 480)]


def test_read_cdx_streaming_parity(spark, tmp_path):
    path = _fixture(tmp_path)
    batch = read_cdx(spark, path).filter(F.col("url").isNotNull())
    sdf = read_cdx(spark, str(tmp_path), streaming=True)
    assert sdf.isStreaming and sdf.schema == read_cdx(spark, path).schema
    out = str(tmp_path / "out")
    q = (
        sdf.filter(F.col("url").isNotNull()).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want


def test_read_warc_ranges_matches_full_read(spark, tmp_path):
    """fetch_plan -> read_warc_ranges reads EXACTLY the planned record
    slices: fetching a 2-of-3 capture subset yields those records
    byte-identical to the full-archive read_warc rows."""
    from data_ingestion_tool_bakasura__spark.sources.cdx import (
        fetch_plan,
        read_warc_ranges,
    )
    from data_ingestion_tool_bakasura__spark.sources.warc import read_warc

    def rec(uri, text, rid):
        body = text.encode()
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"WARC-Target-URI: {uri}\r\nWARC-Date: 2026-08-15T00:00:00Z\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        return head + http + b"\r\n\r\n"

    recs = [rec(f"https://e.org/{i}", f"payload number {i}", f"r{i}")
            for i in range(3)]
    buf = b"".join(recs)
    (tmp_path / "a.warc").write_bytes(buf)

    # index captures 0 and 2 only (true offsets)
    offs = [0, len(recs[0]), len(recs[0]) + len(recs[1])]
    lines = [
        _line("org,e)/0", "20260101000000", url="https://e.org/0",
              mime="text/plain", status="200", digest="0",
              length=str(len(recs[0])), offset=str(offs[0]),
              filename="a.warc"),
        _line("org,e)/2", "20260101000000", url="https://e.org/2",
              mime="text/plain", status="200", digest="2",
              length=str(len(recs[2])), offset=str(offs[2]),
              filename="a.warc"),
    ]
    (tmp_path / "idx.cdx").write_text("\n".join(lines) + "\n")

    plan = fetch_plan(read_cdx(spark, str(tmp_path / "idx.cdx")))
    got = {r["url"]: r for r in
           read_warc_ranges(plan, str(tmp_path)).collect()}
    full = {r["url"]: r for r in
            read_warc(spark, str(tmp_path)).collect()}
    assert set(got) == {"https://e.org/0", "https://e.org/2"}
    for u in got:
        assert bytes(got[u]["payload"]) == bytes(full[u]["payload"])
        assert got[u]["record_id"] == full[u]["record_id"]
        assert got[u]["http_status"] == 200


def test_read_warc_ranges_skip_missing(spark, tmp_path):
    """skip_missing=True drops plan rows for absent archives instead of
    failing the fetch job (the index often outlives retired archives)."""
    from data_ingestion_tool_bakasura__spark.sources.cdx import (
        fetch_plan,
        read_warc_ranges,
    )

    lines = [
        _line("org,e)/0", "20260101000000", url="https://e.org/0",
              mime="text/plain", status="200", digest="0",
              length="100", offset="0", filename="gone.warc"),
    ]
    (tmp_path / "idx.cdx").write_text("\n".join(lines) + "\n")
    plan = fetch_plan(read_cdx(spark, str(tmp_path / "idx.cdx")))
    assert read_warc_ranges(plan, str(tmp_path), skip_missing=True).count() == 0


# --- CDX write side (r11: cdx_lines + surt_key) ------------------------------


def test_surt_key_cases(spark):
    from pyspark.sql import functions as F

    from data_ingestion_tool_bakasura__spark.functions.urls import surt_key

    cases = [
        ("https://WWW.Ex.COM:443/A/b?z=1&a=2", "com,ex,www)/a/b?a=2&z=1"),
        ("http://ex.com", "com,ex)/"),
        ("https://user:pw@sub.ex.org/P?utm_source=x", "org,ex,sub)/p"),
        ("https://ex.com/x#frag", "com,ex)/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = {r["url"]: r["k"] for r in
           df.withColumn("k", surt_key(F.col("url"))).collect()}
    for u, want in cases:
        assert got[u] == want, (u, got[u])


def test_cdx_write_read_roundtrip(spark, tmp_path):
    """cdx_lines -> text write -> read_cdx -> latest_captures: the
    write and read sides share the surt expression, so the urlkey a
    reader windows on is exactly the one the writer emitted."""
    from data_ingestion_tool_bakasura__spark.sources.cdx import (
        cdx_lines,
        latest_captures,
        read_cdx,
    )

    rows = [
        ("https://a.com/p?utm_source=x", "20260101000000", "200",
         "w1.warc.gz", 0, 100),
        ("https://A.com:443/p", "20260201000000", "200",
         "w2.warc.gz", 50, 120),   # same page, newer capture
        ("https://a.com/q", "20260102000000", "404",
         "w1.warc.gz", 100, 80),   # dropped by the status filter
    ]
    df = spark.createDataFrame(
        rows, "url string, ts string, status string, filename string,"
        " offset string, length string"
    )
    out = str(tmp_path / "cdx")
    cdx_lines(df).write.text(out)
    caps = read_cdx(spark, out)
    assert caps.count() == 3
    latest = latest_captures(caps).collect()
    assert len(latest) == 1
    r = latest[0]
    # both spellings collapsed to one urlkey; the newer capture won
    assert r["urlkey"] == "com,a)/p"
    assert r["warc_file"] == "w2.warc.gz" and r["offset"] == 50


def test_write_warc_cdx_index_full_circle(spark, tmp_path):
    """r12: the archive-publisher pairing — write_warc(cdx=True)
    emits sibling .cdxj files with the TRUE member offsets/lengths,
    and the existing index stack consumes them unmodified:
    read_cdx -> latest_captures -> fetch_plan -> read_warc_ranges
    range-reads exactly the written records back (gzip members +
    warcinfo leader shifting the offsets)."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_bakasura__spark.sources.cdx import (
        fetch_plan,
        latest_captures,
        read_cdx,
    )
    from data_ingestion_tool_bakasura__spark.sources.warc import write_warc

    src = spark.createDataFrame(
        [
            ("https://a.example/p", "2026-03-01T10:20:30Z", "text/html",
             200, b"<p>alpha</p>"),
            ("https://b.example/q?x=1", "2026-03-02T00:00:00Z",
             "text/plain", 200, b"beta \r\n\r\nWARC/ bytes"),
            ("https://c.example/r", "2026-03-03T00:00:00Z", "text/html",
             404, b"gone"),
        ],
        "url string, warc_date string, content_type string,"
        " http_status int, payload binary",
    ).repartition(2, "url")
    out = str(tmp_path / "pub")
    write_warc(
        src, out, gzip_members=True, cdx=True,
        warcinfo={"software": "bakasura-spark"}, records_per_file=2,
    )
    caps = read_cdx(spark, out + "/*.cdxj")
    assert caps.count() == 3
    got = {r["url"]: r for r in caps.collect()}
    assert got["https://a.example/p"]["ts"] == "20260301102030"
    assert got["https://a.example/p"]["status"] == 200
    # the 404 is filtered by the default capture selection
    plan = fetch_plan(latest_captures(caps))
    from data_ingestion_tool_bakasura__spark.sources.cdx import (
        read_warc_ranges,
    )

    back = read_warc_ranges(plan, out)
    fetched = {
        r["url"]: bytes(r["payload"]) for r in back.collect()
    }
    assert fetched == {
        "https://a.example/p": b"<p>alpha</p>",
        "https://b.example/q?x=1": b"beta \r\n\r\nWARC/ bytes",
    }
    # offsets are member-true: every planned range starts past the
    # warcinfo leader (offset 0 is the leader, never a response)
    for row in plan.collect():
        assert all(r["offset"] > 0 for r in row["ranges"])


def _one_rec_archive(tmp_path, name="a.warc"):
    body = b"payload bytes here"
    http = (
        f"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body
    head = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Record-ID: <urn:uuid:x1>\r\n"
        "WARC-Target-URI: https://e.org/x\r\n"
        "WARC-Date: 2026-08-15T00:00:00Z\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    raw = head + http + b"\r\n\r\n"
    (tmp_path / name).write_bytes(raw)
    return len(raw)


def _plan_row(spark, wf, off, ln):
    return spark.createDataFrame(
        [(wf, 1, ln, [(off, ln)])],
        "warc_file string, n_records long, bytes_total long, "
        "ranges array<struct<offset: long, length: long>>",
    )


def test_read_warc_ranges_untrusted_plan_guards(spark, tmp_path):
    """r15 review: every plan field is untrusted index data. A short
    range read (stale index vs rewritten archive) must fail loudly
    instead of silently truncating or dropping the record; negative
    lengths (read-to-EOF over-emission) and base_dir-escaping
    filenames refuse; NULL fields raise a named error, not an opaque
    TypeError."""
    import pytest

    from data_ingestion_tool_bakasura__spark.sources.cdx import (
        read_warc_ranges,
    )

    n = _one_rec_archive(tmp_path)
    base = str(tmp_path)
    # stale index: planned length runs past EOF
    with pytest.raises(Exception, match="short range read"):
        read_warc_ranges(_plan_row(spark, "a.warc", 0, n + 100), base).collect()
    # offset at/past EOF: previously returned zero records silently
    with pytest.raises(Exception, match="short range read"):
        read_warc_ranges(_plan_row(spark, "a.warc", n + 5, 50), base).collect()
    # negative length: previously f.read(-1) read to EOF
    with pytest.raises(Exception, match="implausible plan range"):
        read_warc_ranges(_plan_row(spark, "a.warc", 0, -1), base).collect()
    # path traversal out of base_dir
    with pytest.raises(Exception, match="escapes base_dir"):
        read_warc_ranges(
            _plan_row(spark, "../a.warc", 0, n), base + "/sub"
        ).collect()
    # NULL length: named error, not TypeError
    null_plan = spark.createDataFrame(
        [("a.warc", 1, 0, [(0, None)])],
        "warc_file string, n_records long, bytes_total long, "
        "ranges array<struct<offset: long, length: long>>",
    )
    with pytest.raises(Exception, match="NULL offset/length"):
        read_warc_ranges(null_plan, base).collect()
    # the valid plan still fetches (guards don't over-fire)
    ok = read_warc_ranges(_plan_row(spark, "a.warc", 0, n), base).collect()
    assert len(ok) == 1 and bytes(ok[0]["payload"]) == b"payload bytes here"


def test_fetch_plan_dedupes_duplicate_index_lines(spark, tmp_path):
    """r15 review: byte-identical duplicate index lines (routine in
    merged CC indexes) used to double-fetch and double-emit the
    record; the plan now collapses them to one range and its
    n_records/bytes_total count the deduplicated schedule."""
    from data_ingestion_tool_bakasura__spark.sources.cdx import (
        read_warc_ranges,
    )

    n = _one_rec_archive(tmp_path)
    line = _line("org,e)/x", "20260101000000", url="https://e.org/x",
                 mime="text/plain", status="200", digest="X",
                 length=str(n), offset="0", filename="a.warc")
    (tmp_path / "idx.cdx").write_text(line + "\n" + line + "\n")
    plan = fetch_plan(read_cdx(spark, str(tmp_path / "idx.cdx")))
    row = plan.collect()[0]
    assert row["n_records"] == 1 and row["bytes_total"] == n
    assert len(row["ranges"]) == 1
    got = read_warc_ranges(plan, str(tmp_path)).collect()
    assert len(got) == 1  # emitted once, not twice


def test_latest_captures_total_order_across_archives(spark):
    """r15 review: equal (ts, offset) across two archives (the merged-
    index shape) now breaks ties on warc_file, so the fetch plan is
    deterministic run to run."""
    caps = spark.createDataFrame(
        [("k", "20260101000000", "https://e.org/x", "text/html", 200,
          "D", wf, 0, 100) for wf in ("w2.warc.gz", "w1.warc.gz")],
        "urlkey string, ts string, url string, mime string, status int, "
        "digest string, warc_file string, offset long, length long",
    )
    winners = [latest_captures(caps.repartition(8)).collect()[0]["warc_file"]
               for _ in range(3)]
    assert winners == ["w2.warc.gz"] * 3  # desc tie-break, stable
