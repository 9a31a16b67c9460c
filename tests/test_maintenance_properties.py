"""Compaction test + hypothesis property tests for the pure text
functions (SURVEY §5.5): chunk reassembly covers the source, normalize
idempotence, sanitize output alphabet, chunker window contract."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.functions.text import chunk_text_py
from data_ingestion_tool_bakasura__spark.operators.maintenance import compact, table_file_stats
from data_ingestion_tool_bakasura__spark.sources.readers import load_table
from tests.conftest import SF_SMOKE

# -- compaction -------------------------------------------------------------


def test_compact_preserves_rows_and_merges_files(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    p = str(tmp_path / "frag")
    # simulate micro-batch fragmentation: 30 tiny appends
    for i in range(30):
        docs.filter(F.col("doc_id") % 30 == i).coalesce(1).write.mode("append").parquet(p)
    before = table_file_stats(spark, p)
    want = sorted(map(tuple, spark.read.parquet(p).collect()))
    report = compact(spark, p)
    got = sorted(map(tuple, spark.read.parquet(p).collect()))
    assert got == want
    assert report["after"]["n_files"] < before["n_files"]
    assert report["after"]["total_bytes"] > 0


def test_swap_directory_recovers_from_prior_crash(spark, tmp_path):
    """A leftover *_swap_old (prior crash between the two renames) must
    not wedge the next swap with EEXIST; and when the crash left `path`
    missing, the displaced copy is restored, not deleted."""
    import os

    from data_ingestion_tool_bakasura__spark.operators.maintenance import swap_directory

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(20)
    p = str(tmp_path / "tbl")
    docs.write.parquet(p)
    # case 1: superseded _swap_old left behind, live path present
    docs.limit(5).write.parquet(p + "_swap_old")
    docs.limit(10).write.parquet(p + "_tmp1")
    swap_directory(spark, p, p + "_tmp1")
    assert spark.read.parquet(p).count() == 10
    assert not os.path.exists(p + "_swap_old")
    # case 2: crash window — path missing, data stranded in _swap_old;
    # the stranded copy is restored and then swapped out normally
    os.rename(p, p + "_swap_old")
    docs.limit(7).write.parquet(p + "_tmp2")
    swap_directory(spark, p, p + "_tmp2")
    assert spark.read.parquet(p).count() == 7
    assert not os.path.exists(p + "_swap_old")


# -- hypothesis properties (pure python, no Spark in the loop) --------------

_text = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs"), whitelist_characters="\n.!"),
    max_size=2000,
)


@settings(max_examples=200, deadline=None)
@given(_text)
def test_chunks_cover_source_tokens(s):
    """Every non-space character run of the normalized source appears in
    some chunk (no content loss)."""
    norm = re.sub(r"\s+", " ", s).strip()
    chunks = chunk_text_py(norm, chunk_size=50, chunk_overlap=10)
    joined = " ".join(chunks)
    for word in norm.split(" "):
        if word and len(word) <= 50:
            assert word in joined
        elif word:
            # words longer than the window are hard-split across chunks
            # (unsplittable unit, LangChain fidelity) — chars still covered
            assert word in joined.replace(" ", "")


@settings(max_examples=200, deadline=None)
@given(_text)
def test_chunk_size_contract(s):
    norm = re.sub(r"\s+", " ", s).strip()
    for c in chunk_text_py(norm, chunk_size=50, chunk_overlap=10):
        assert c == c.strip() and c != ""
        # recursive splitter may overflow size only when a single token
        # exceeds the window (unsplittable unit)
        assert len(c) <= 50 or " " not in c


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=500))
def test_normalize_idempotent(s):
    once = re.sub(r"\s+", " ", s).strip()
    assert re.sub(r"\s+", " ", once).strip() == once


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_sanitize_alphabet(s):
    out = re.sub(r"[^a-zA-Z0-9_\-=]", "_", s)
    assert re.fullmatch(r"[a-zA-Z0-9_\-=]*", out)


# -- winnowing fingerprint properties (pure-python mirror) ------------------

def _winnow_ref(tokens: list[str], n: int = 3, w: int = 4) -> set:
    """Direct transcription of operators/dedup.py winnow_fingerprints
    semantics over a token list (the Spark==python equality is pinned in
    test_dedup_similarity; here we property-check the algorithm)."""
    import hashlib

    if not tokens:
        tokens = [""]
    if len(tokens) < n:
        grams = [" ".join(tokens)]
    else:
        grams = [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:13], 16) for g in grams]
    return {min(hs[i : i + w]) for i in range(max(len(hs) - w, 0) + 1)}


_words = st.lists(st.text(alphabet="abcdef", min_size=1, max_size=5), min_size=1, max_size=60)


@settings(max_examples=200, deadline=None)
@given(_words)
def test_winnow_sketch_bounds(toks):
    """Sketch is non-empty, no larger than the window-start count, and
    every fingerprint is a real gram hash (subset property)."""
    import hashlib

    fps = _winnow_ref(toks)
    g = max(len(toks) - 2, 1)
    assert 1 <= len(fps) <= max(g - 4, 0) + 1
    if len(toks) < 3:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    all_h = {int(hashlib.md5(x.encode()).hexdigest()[:13], 16) for x in grams}
    assert fps <= all_h


@settings(max_examples=200, deadline=None)
@given(_words, _words, st.lists(st.text(alphabet="ghijk", min_size=1, max_size=5), min_size=6, max_size=12))
def test_winnow_coverage_guarantee(prefix, suffix, shared):
    """SIGMOD'03 guarantee: any shared run of >= w + n - 1 = 6 tokens
    yields at least one shared fingerprint, regardless of what
    surrounds it (position-shift robustness)."""
    a = prefix + shared + suffix
    b = list(reversed(suffix)) + shared + list(reversed(prefix))
    assert _winnow_ref(a) & _winnow_ref(b)


# -- upsert merge grouping-insensitivity ------------------------------------


def test_upsert_grouping_insensitive_under_version_order(spark):
    """With order_by=[version] and batch order consistent with version
    order (the CDC case: each batch's rows carry its sequence number),
    every grouping of the batch stream merges to the same final table:
    ((b1+b2)+b3) == (b1+(b2+b3)) == one combined batch. This is the
    invariant that makes streaming-upsert replays safe when a lost
    checkpoint regroups micro-batches (see start_streaming_upsert).
    Within-batch key conflicts resolve by the remaining-column tiebreak,
    so the test plants them deliberately."""
    import random

    from data_ingestion_tool_bakasura__spark.operators.upsert import upsert_by_key

    rng = random.Random(7)
    batches = []
    for v in (1, 2, 3):
        rows = [
            (rng.randrange(20), v, f"p{rng.randrange(1000):03d}")
            for _ in range(30)  # ~30 rows over 20 keys -> conflicts
        ]
        batches.append(
            spark.createDataFrame(rows, "id long, version int, payload string")
        )
    b1, b2, b3 = batches
    empty = b1.limit(0)

    def merge(cur, upd):
        return upsert_by_key(cur, upd, key="id", order_by=["version"])

    def rows(df):
        return sorted(map(tuple, df.collect()))

    seq = rows(merge(merge(merge(empty, b1), b2), b3))
    right = rows(merge(merge(empty, b1), b2.unionByName(b3)))
    left = rows(merge(merge(empty, b1.unionByName(b2)), b3))
    combined = rows(merge(empty, b1.unionByName(b2).unionByName(b3)))
    assert seq == right == left == combined
    # exactly one row per key survives
    keys = [r[0] for r in combined]
    assert len(keys) == len(set(keys))


def test_delete_keys_removes_exactly_the_keys(spark, tmp_path):
    """Targeted delete: exactly the listed keys disappear, everything
    else survives byte-for-byte; counts are opt-in (an extra 2 scans)
    and honest when requested."""
    from data_ingestion_tool_bakasura__spark.operators.maintenance import delete_keys

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text", "lang")
    p = str(tmp_path / "tbl")
    docs.write.parquet(p)
    gone = [3, 7, 11]
    # default: no stats scans — the op is one scan + one write
    report = delete_keys(spark, p, gone, key_col="doc_id")
    assert report == {"n_before": None, "n_after": None, "n_deleted": None}
    after = spark.read.parquet(p)
    assert after.filter(F.col("doc_id").isin(gone)).count() == 0
    want = sorted(map(tuple, docs.filter(~F.col("doc_id").isin(gone)).collect()))
    assert sorted(map(tuple, after.collect())) == want
    # opt-in counts on a second takedown (keys already gone -> 0 deleted)
    report2 = delete_keys(spark, p, gone, key_col="doc_id", count_rows=True)
    assert report2["n_deleted"] == 0 and report2["n_before"] == report2["n_after"]


def test_upsert_large_updates_no_forced_broadcast(spark):
    """updates_small=False must not force-broadcast the update keys: with
    auto-broadcast disabled the merge plan contains no broadcast join on
    the anti-join side (a backfill batch degrades to a shuffled join
    instead of OOMing); the default hint path still broadcasts."""
    from data_ingestion_tool_bakasura__spark.operators.upsert import upsert_by_key

    current = spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
    updates = spark.range(500, 1500).selectExpr("id", "id * 3 AS v")
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big = upsert_by_key(current, updates, updates_small=False)
        plan_big = big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_big, plan_big
        small = upsert_by_key(current, updates)  # default: hint honored
        plan_small = small._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_small, plan_small
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    # same result either way
    assert sorted(map(tuple, big.collect())) == sorted(map(tuple, small.collect()))


def test_write_clustered_disjoint_footer_stats(spark, tmp_path):
    """write_clustered produces files whose parquet footer min/max
    ranges on the cluster column are pairwise near-disjoint (each file
    owns a contiguous slice — the mechanism behind row-group/file
    skipping), while a plain unsorted write overlaps almost totally.
    Rows survive byte-for-byte."""
    import pyarrow.parquet as pq
    import glob

    from data_ingestion_tool_bakasura__spark.operators.maintenance import write_clustered

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "ts", "value")
    want = ev.count()

    def ranges(path):
        out = []
        for f in glob.glob(path + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = hi = None
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)  # event_id is column 0
                s = col.statistics
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            out.append((lo, hi))
        return sorted(out)

    plain = str(tmp_path / "plain")
    ev.repartition(8).write.parquet(plain)
    clustered = str(tmp_path / "clustered")
    write_clustered(ev, clustered, ["event_id"], n_files=8)

    assert spark.read.parquet(clustered).count() == want
    r = ranges(clustered)
    assert len(r) >= 4
    # contiguous ownership: each file's min exceeds the previous file's max
    overlaps = sum(1 for (a, b), (c, d) in zip(r, r[1:]) if c <= b)
    assert overlaps == 0, r
    # the plain write overlaps nearly everywhere (hash round-robin)
    rp = ranges(plain)
    overlaps_plain = sum(1 for (a, b), (c, d) in zip(rp, rp[1:]) if c <= b)
    assert overlaps_plain >= len(rp) - 2, rp


def test_write_clustered_size_derived_file_count(spark, tmp_path):
    """VERDICT r7 #7: with n_files omitted, write_clustered derives the
    file count from Catalyst's size estimate / target_file_bytes (for
    a scan-rooted frame the estimate is the sum of input file sizes,
    so the derivation matches compact's). Disjoint footer ownership
    must hold at the computed count too."""
    import glob
    import math

    import pyarrow.parquet as pq

    from data_ingestion_tool_bakasura__spark.operators.maintenance import (
        table_file_stats,
        write_clustered,
    )

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "ts", "value")
    src = str(tmp_path / "src")
    ev.write.parquet(src)
    nbytes = table_file_stats(spark, src)["total_bytes"]
    target = max(1, nbytes // 5)  # force ~5 output files from a tiny fixture

    out = str(tmp_path / "clustered")
    write_clustered(spark.read.parquet(src), out, ["event_id"], target_file_bytes=target)

    files = glob.glob(out + "/part-*.parquet")
    assert len(files) == math.ceil(nbytes / target)
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.schema.column(i).name == "event_id"
        )
        lo = hi = None
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(idx).statistics
            lo = s.min if lo is None else min(lo, s.min)
            hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            ranges.append((lo, hi))
    ranges.sort()
    assert sum(1 for (a, b), (c, d) in zip(ranges, ranges[1:]) if c <= b) == 0, ranges


# -- r8 perceptual-hash properties (pure python, no Spark in the loop) ------

from data_ingestion_tool_bakasura__spark.multimodal.media import ahash64_py


@settings(max_examples=200, deadline=None)
@given(st.one_of(st.text(max_size=400), st.binary(max_size=400)))
def test_ahash_shape_and_determinism(payload):
    h = ahash64_py(payload)
    assert len(h) == 64 and set(h) <= {"0", "1"}
    assert ahash64_py(payload) == h


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_ahash_bytes_equal_latin1_text(payload):
    """The binary-acceptance contract image/video/audio dedup rely on:
    hashing raw bytes == hashing their latin-1 text form, so string
    payload columns and binary media columns land in one hash space."""
    assert ahash64_py(payload) == ahash64_py(payload.decode("latin-1"))


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=128, max_size=400), st.integers(min_value=0, max_value=127))
def test_ahash_oracle_arithmetic_parity(s, flip_at):
    """ahash64_py must equal the DuckDB-oracle arithmetic the
    q_image_near_dup SQL re-derives (md5 of fixed character blocks,
    first byte as pixel, strict mean threshold) — checked here by an
    independent re-derivation, including after a single-char edit."""
    import hashlib

    def oracle(t):
        L = max(1, len(t) // 64)
        px = [hashlib.md5(t[i * L:i * L + L].encode()).digest()[0] for i in range(64)]
        m = sum(px) / 64.0
        return "".join("1" if p > m else "0" for p in px)

    assert ahash64_py(s) == oracle(s)
    edited = s[:flip_at] + ("X" if s[flip_at] != "X" else "Y") + s[flip_at + 1:]
    assert ahash64_py(edited) == oracle(edited)


def test_crash_between_renames_does_not_lose_table(spark, tmp_path):
    """r14-late review (the data-loss path): a crash between
    swap_directory's two renames leaves `path` missing with the full
    table at *_swap_old. Every operation that reads BEFORE swapping
    must recover first — previously the parquet upsert's exists-check
    took the fresh-table branch, rewrote the table as just the batch,
    and the NEXT swap's entry cleanup deleted the only full copy."""
    import os

    from data_ingestion_tool_bakasura__spark.operators.upsert import (
        upsert_into_path,
    )

    p = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    ).write.parquet(p)
    # simulate the crash: path displaced to *_swap_old, path missing
    os.rename(p, p + "_swap_old")
    # replayed upsert of batch {2': B, 4: D} must merge with the FULL
    # restored table, not just rewrite the batch
    upd = spark.createDataFrame([(2, "B"), (4, "D")], "id long, v string")
    upsert_into_path(spark, p, upd, key="id", use_delta=False)
    got = dict(
        (r["id"], r["v"]) for r in spark.read.parquet(p).collect()
    )
    assert got == {1: "a", 2: "B", 3: "c", 4: "D"}
    assert not os.path.exists(p + "_swap_old")
    # compact after the same simulated crash also recovers
    os.rename(p, p + "_swap_old")
    compact(spark, p)
    got = dict((r["id"], r["v"]) for r in spark.read.parquet(p).collect())
    assert got == {1: "a", 2: "B", 3: "c", 4: "D"}
    # and delete_keys
    os.rename(p, p + "_swap_old")
    from data_ingestion_tool_bakasura__spark.operators.maintenance import (
        delete_keys,
    )

    delete_keys(spark, p, [4], key_col="id")
    got = dict((r["id"], r["v"]) for r in spark.read.parquet(p).collect())
    assert got == {1: "a", 2: "B", 3: "c"}


def test_upsert_temporary_only_dir_takes_fresh_branch(spark, tmp_path):
    """r14-late review: a crashed FIRST write leaves table_path holding
    only Spark's _temporary dir. 'Directory exists' must not be read
    as 'table exists' — the replay takes the fresh-write branch
    (overwrite clears the debris) instead of wedging the read-merge
    branch on an unreadable directory."""
    import os

    from data_ingestion_tool_bakasura__spark.operators.upsert import (
        upsert_into_path,
    )

    p = str(tmp_path / "tbl2")
    os.makedirs(os.path.join(p, "_temporary", "0"))
    upd = spark.createDataFrame([(1, "a")], "id long, v string")
    upsert_into_path(spark, p, upd, key="id", use_delta=False)
    assert [tuple(r) for r in spark.read.parquet(p).collect()] == [(1, "a")]


def test_upsert_into_path_accepts_file_uri(spark, tmp_path):
    """r14-late review: upsert_into_path strips file:// for its
    exists-check but previously handed the RAW URI to swap_directory,
    whose os.rename cannot resolve a scheme — every merge-path upsert
    on a file:// table failed at the swap after paying the rewrite."""
    from data_ingestion_tool_bakasura__spark.operators.upsert import (
        upsert_into_path,
    )

    uri = "file://" + str(tmp_path / "tbl3")
    upsert_into_path(
        spark, uri,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        key="id", use_delta=False,
    )
    upsert_into_path(  # merge path: read + rewrite + swap
        spark, uri,
        spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"),
        key="id", use_delta=False,
    )
    got = dict((r["id"], r["v"]) for r in spark.read.parquet(uri).collect())
    assert got == {1: "a", 2: "B", 3: "c"}


def test_swap_directory_verify_failure_restores_good_copy(spark, tmp_path):
    """r14-late review: when the post-swap read-back verify FAILS (the
    new copy is unreadable — the exact case the verify guards), the
    GOOD copy must come back live at `path`, with the bad bytes parked
    at tmp for inspection — not left live to fail every reader."""
    import os

    import pytest as _pytest

    from data_ingestion_tool_bakasura__spark.operators.maintenance import (
        swap_directory,
    )

    p = str(tmp_path / "tbl4")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(p)
    bad = str(tmp_path / "tbl4_bad_tmp")
    os.makedirs(bad)
    with open(os.path.join(bad, "part-00000.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    with _pytest.raises(Exception):
        swap_directory(spark, p, bad)
    # good copy live again; bad bytes parked at tmp; no _swap_old left
    assert [tuple(r) for r in spark.read.parquet(p).collect()] == [(1, "a")]
    assert os.path.exists(bad)
    assert not os.path.exists(p + "_swap_old")
