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
