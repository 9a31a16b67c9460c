"""Multimodal extraction + media column tests (A4-A9, C15): binaryFile
scan -> page explode -> OCR gate -> assembly -> ingest, plus the media
metadata / resize / frame-sample / audio-feature plumbing with the
deterministic container formats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.multimodal import extract as MX
from data_ingestion_tool_bakasura__spark.multimodal import media as MM
from data_ingestion_tool_bakasura__spark.operators.ingest import IngestConfig, ingest_documents
from data_ingestion_tool_bakasura__spark.sources.readers import read_binary_files


@pytest.fixture(scope="module")
def doc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rawdocs")
    long_text = ("alpha beta gamma delta epsilon " * 10).strip()  # >= 100 chars
    (d / "a.txt").write_bytes(
        f"{long_text}\fTABLE|x|y\nshort page".encode()
    )
    (d / "b.txt").write_bytes(b"tiny")  # single short page -> OCR
    (d / "bad.txt").write_bytes(b"\xff\xfe broken \xff")  # decodes w/ replacement
    return str(d)


def test_binaryfile_scan_to_pages(spark, doc_dir):
    raw = read_binary_files(spark, doc_dir, glob="*.txt")
    pages = MX.extract_pages(raw)
    rows = {(r["path"].rsplit("/", 1)[-1], r["page_number"]): r for r in pages.collect()}
    assert rows[("a.txt", 1)]["needs_ocr"] is False
    assert rows[("a.txt", 2)]["needs_ocr"] is True
    assert rows[("a.txt", 2)]["tables"] == ["x y"]
    assert rows[("a.txt", 2)]["page_text"].startswith("ocr:")
    assert rows[("b.txt", 1)]["needs_ocr"] is True
    assert all(r["error"] is None for r in rows.values())


def test_extract_assemble_ingest_e2e(spark, doc_dir):
    raw = read_binary_files(spark, doc_dir, glob="*.txt")
    docs = MX.extract_to_documents(raw)
    assert docs.count() == 3
    a = docs.filter(F.col("doc_id").endswith("a.txt")).first()
    assert a["n_pages"] == 2 and a["n_ocr_pages"] == 1
    assert "[Page 1 Text]:" in a["text"] and "[Page 2 Table]:" in a["text"]
    # feeds the standard ingest pipeline unchanged
    rows = ingest_documents(docs, cfg=IngestConfig(embedding_dim=8))
    assert rows.count() >= 3
    assert rows.filter(F.size("content_vector") != 8).count() == 0


def test_extractor_dead_letter(spark):
    df = spark.createDataFrame([("p1", b"ok page")], "path string, content binary")

    def boom(content: bytes):
        raise RuntimeError("parser exploded")

    pages = MX.extract_pages(df, parser=boom)
    dead = MX.dead_letters(pages).collect()
    assert len(dead) == 1 and "parser exploded" in dead[0]["error"]
    assert MX.assemble_documents(pages).count() == 0  # clean side empty


def test_image_meta_and_resize(spark):
    rows = [
        ("i1", b"IMG1|640|480|3|" + b"\x01" * 16),
        ("i2", b"not-an-image"),
        ("i3", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, media binary")
    meta = {r["media_id"]: r["meta"] for r in MM.with_image_meta(df).collect()}
    assert (meta["i1"]["width"], meta["i1"]["height"], meta["i1"]["channels"]) == (640, 480, 3)
    assert meta["i2"]["error"] is not None and meta["i3"]["error"] is not None

    resized = (
        df.filter(F.col("media_id") == "i1")
        .select(MM.resize_image_stub("media", F.lit(320)).alias("out"))
        .first()["out"]
    )
    assert bytes(resized).startswith(b"IMG1|320|240|3|")


def test_decode_image_raises_not_implemented():
    # non-PNG payloads still need PIL (absent here) -> gated seam holds
    with pytest.raises(NotImplementedError):
        MX_decode = MM.decode_image
        MX_decode(b"IMG1|2|2|3|xx")


def test_decode_image_png_runs_ungated():
    """r11: the stdlib baseline-PNG leg makes decode_image real for
    PNG bytes with no codec libs installed."""
    from data_ingestion_tool_bakasura__spark.multimodal.png import encode_png_gray

    w, h, c, px = MM.decode_image(encode_png_gray(3, 2, bytes(range(6))))
    assert (w, h, c) == (3, 2, 1)
    assert px == bytes(range(6))


def test_frame_sampling(spark):
    frames = b"\x00".join(b"frame%d" % i for i in range(10))
    df = spark.createDataFrame(
        [("v1", b"VID1|24|10|" + frames), ("i1", b"IMG1|1|1|1|x")],
        "media_id string, media binary",
    )
    out = MM.sample_frames(df, every_k=3).collect()
    assert {(r["video_id"], r["frame_index"]) for r in out} == {
        ("v1", 0), ("v1", 3), ("v1", 6), ("v1", 9)
    }
    assert all(bytes(r["frame"]) == b"frame%d" % r["frame_index"] for r in out)


def test_audio_features(spark):
    df = spark.createDataFrame(
        [("a1", b"AUD1|16000|32000|" + bytes(range(10)))],
        "media_id string, media binary",
    )
    r = MM.audio_features(df).first()
    assert r["duration_s"] == 2.0 and r["sample_rate"] == 16000
    assert r["byte_energy"] > 0


def test_image_near_dup_planted_pairs(spark):
    """r8 C15 x C13: banded aHash finds the perturbed twin and the
    byte-identical copy, ignores unrelated payloads and NULLs, and
    reports distance 0 for exact duplicates."""
    from data_ingestion_tool_bakasura__spark.multimodal.media import (
        ahash64_udf,
        image_near_dup,
    )

    base = "IMG1|8|8|1|" + "the quick brown fox jumps over the lazy dog " * 8
    rows = [
        (1, base),
        (2, base),                      # exact duplicate -> hamming 0
        (3, "Z" + base[1:]),            # one-block perturbation -> near dup
        (4, "IMG1|8|8|1|" + "completely different payload contents here " * 8),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup(df, "media_id", "payload", max_hamming=8).collect()
    }
    assert got[(1, 2)] == 0
    assert (1, 3) in got and 0 < got[(1, 3)] <= 8
    assert all(4 not in pair and 5 not in pair for pair in got)

    # hash shape + determinism
    h = df.filter("payload is not null").select(ahash64_udf()("payload").alias("h")).collect()
    assert all(len(r["h"]) == 64 and set(r["h"]) <= {"0", "1"} for r in h)


def test_video_near_dup_shot_fingerprints(spark):
    """r8: shot-fingerprint video dedup — a re-encode sharing 5 of 6
    sampled frames pairs at jaccard 5/7; a disjoint video does not
    pair; a boilerplate frame present in EVERY video is capped out of
    candidate generation and set sizes."""
    from data_ingestion_tool_bakasura__spark.multimodal.media import video_near_dup

    import hashlib

    def vid(frames):
        return b"VID1|24|%d|" % len(frames) + b"\x00".join(frames)

    def frame(seed):
        # pseudorandom, deterministic, zero-free (VID1 splits on \\x00),
        # long enough that distinct frames get distinct aHashes (short
        # near-identical byte strings can legitimately share a
        # perceptual hash — that is the operator working as intended)
        d = hashlib.sha256(seed).digest()
        return bytes((b % 255) + 1 for b in d) * 8

    f = [frame(b"frame-%d" % i) for i in range(8)]
    black = frame(b"black")
    rows = [
        ("A", vid([f[0], f[1], f[2], f[3], f[4], f[5], black])),
        ("B", vid([f[0], f[1], f[2], f[3], f[4], f[6], black])),  # 5 of 6 shared
        ("C", vid([f[7], frame(b"unique-c"), black])),
        ("D", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, media binary")
    got = {
        (r["id_a"], r["id_b"]): r.asDict()
        for r in video_near_dup(
            df, every_k=1, min_jaccard=0.5, max_videos_per_frame=2
        ).collect()
    }
    assert set(got) == {("A", "B")}
    ab = got[("A", "B")]
    # the black frame (in 3 > 2 videos) is capped from sizes too: 6+6 frames
    assert (ab["shared"], ab["n_a"], ab["n_b"]) == (5, 6, 6)
    assert abs(ab["jaccard"] - 5 / 7) < 1e-6


def test_video_near_dup_leaves_no_registered_cache(spark):
    """r18 (VERDICT r17 #6): video_near_dup's two share points used to
    persist() with no unpersist — each call pinned its frame tables in
    the CacheManager for the app lifetime. They are GC-scoped local
    checkpoints now: after the operator returns and its result is
    materialized, the SQL cache registry holds nothing new."""
    import hashlib

    from pyspark.sql import functions as F

    from data_ingestion_tool_bakasura__spark.multimodal.media import video_near_dup

    def frame(seed):
        d = hashlib.sha256(seed).digest()
        return bytes((b % 255) + 1 for b in d) * 8

    f = [frame(b"cache-frame-%d" % i) for i in range(4)]
    rows = [
        ("A", b"VID1|24|3|" + b"\x00".join([f[0], f[1], f[2]])),
        ("B", b"VID1|24|3|" + b"\x00".join([f[0], f[1], f[3]])),
    ]
    df = spark.createDataFrame(rows, "media_id string, media binary")
    cm = spark._jsparkSession.sharedState().cacheManager()
    was_empty = cm.isEmpty()
    out = video_near_dup(df, every_k=1, min_jaccard=0.1)
    out.write.format("noop").mode("overwrite").save()
    # nothing newly registered by the operator or its materialization
    assert cm.isEmpty() == was_empty
    if was_empty:
        assert cm.isEmpty()
    # and the result is still the shared-frame pair
    assert {(r["id_a"], r["id_b"]) for r in out.collect()} == {("A", "B")}


def test_image_near_dup_incremental_wave_parity(spark, tmp_path):
    """r8 incremental closure: hashing the corpus once and probing a
    wave against the persisted hash index yields exactly the batch
    operator's NEW pairs (pairs involving at least one wave image);
    corpus payloads are never re-hashed (the probe reads the 65-byte
    index rows only)."""
    from data_ingestion_tool_bakasura__spark.multimodal.media import (
        image_hash_index,
        image_near_dup,
        image_near_dup_increment,
    )

    base = "IMG1|8|8|1|" + "the quick brown fox jumps over the lazy dog " * 8
    other = "IMG1|8|8|1|" + "completely different payload contents here " * 8
    corpus = spark.createDataFrame(
        [(1, base), (2, other)], "media_id long, payload string"
    )
    wave = spark.createDataFrame(
        [(10, base), (11, "Z" + base[1:]), (12, "IMG1|8|8|1|" + "unrelated new " * 20)],
        "media_id long, payload string",
    )

    path = str(tmp_path / "img_idx")
    image_hash_index(corpus).write.parquet(path)
    inc = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup_increment(spark.read.parquet(path), wave).collect()
    }

    batch = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup(corpus.unionByName(wave), max_hamming=8).collect()
    }
    new_batch_pairs = {p: h for p, h in batch.items() if p[0] >= 10 or p[1] >= 10}
    assert inc == new_batch_pairs
    assert (1, 10) in inc and inc[(1, 10)] == 0  # exact dup across the seam
    assert (1, 11) in inc and 0 < inc[(1, 11)] <= 8


def test_image_near_dup_band_cap_subset_and_accounting(spark):
    """r8 verdict #2: the oversized-band cap. aHash-identical-but-
    byte-different boilerplate (identical leading 64 blocks, differing
    ignored tails) forms one bucket per band; with the cap those
    buckets are dropped BEFORE the self-join, capped output is a strict
    subset of uncapped, genuine near-dups outside the bucket survive,
    and image_band_stats surfaces exactly the dropped buckets."""
    from data_ingestion_tool_bakasura__spark.multimodal.media import (
        image_band_stats,
        image_near_dup,
    )

    head = "x" * 64  # L=1 -> only the first 64 chars are hashed
    boiler = [(i, head + f"tail-{i}") for i in range(12)]  # byte-distinct
    real = "IMG1|8|8|1|" + "the quick brown fox jumps over the lazy dog " * 8
    rows = boiler + [(100, real), (101, "Z" + real[1:])]
    df = spark.createDataFrame(rows, "media_id long, payload string")

    uncapped = {
        (r["id_a"], r["id_b"])
        for r in image_near_dup(df, max_bucket_size=None).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in image_near_dup(df, max_bucket_size=5).collect()
    }
    assert capped <= uncapped
    assert (100, 101) in capped           # genuine near-dup survives
    assert all(a >= 100 for a, _ in capped)  # boilerplate pairs dropped
    assert {(a, b) for a, b in uncapped if a < 12} == {
        (a, b) for a in range(12) for b in range(a + 1, 12)
    }  # uncapped really did emit the n^2/2 cluster

    stats = image_band_stats(df, max_bucket_size=5).collect()
    assert len(stats) == 4  # the cluster shares all 4 bands
    assert all(r["n_members"] == 12 for r in stats)
    assert image_band_stats(df, max_bucket_size=50).count() == 0


def test_image_near_dup_increment_replay_and_cap(spark, tmp_path):
    """r8 ADVICE: wave ids already in the index are anti-joined away —
    a replayed wave emits no pairs (and thus no mirrored (a,b)/(b,a)
    duplicates across the two join legs); the combined-count band cap
    mirrors the batch operator."""
    from data_ingestion_tool_bakasura__spark.multimodal.media import (
        image_hash_index,
        image_near_dup_increment,
    )

    base = "IMG1|8|8|1|" + "the quick brown fox jumps over the lazy dog " * 8
    corpus = spark.createDataFrame(
        [(1, base), (2, "IMG1|8|8|1|" + "something else entirely here " * 10)],
        "media_id long, payload string",
    )
    path = str(tmp_path / "img_idx")
    image_hash_index(corpus).write.parquet(path)
    idx = spark.read.parquet(path)

    # full replay: every wave id already indexed -> zero pairs
    assert image_near_dup_increment(idx, corpus).count() == 0

    # mixed wave: the replayed id contributes nothing; the new near-dup
    # pairs once, in canonical order, with its index witness
    wave = spark.createDataFrame(
        [(1, base), (10, "Z" + base[1:])], "media_id long, payload string"
    )
    got = [(r["id_a"], r["id_b"]) for r in image_near_dup_increment(idx, wave).collect()]
    assert sorted(got) == [(1, 10)] and len(got) == len(set(got))

    # combined-count cap: an index bucket of 4 + wave of 3 crosses a cap
    # of 5, so the wave pairs nothing despite each side being under-cap
    head = "y" * 64
    bidx = spark.createDataFrame(
        [(i, head + f"t{i}") for i in range(4)], "media_id long, payload string"
    )
    bpath = str(tmp_path / "boiler_idx")
    image_hash_index(bidx).write.parquet(bpath)
    bwave = spark.createDataFrame(
        [(20 + i, head + f"w{i}") for i in range(3)], "media_id long, payload string"
    )
    assert image_near_dup_increment(
        spark.read.parquet(bpath), bwave, max_bucket_size=5
    ).count() == 0
    assert image_near_dup_increment(
        spark.read.parquet(bpath), bwave, max_bucket_size=None
    ).count() == 4 * 3 + 3  # cross + within-wave


def test_audio_near_dup_via_payload_hash(spark):
    """The perceptual-hash dedup is payload-agnostic: binary AUD1
    payloads pair exactly like image payloads (exact dup at 0, a
    small corruption within the Hamming budget, distinct audio out)."""
    from data_ingestion_tool_bakasura__spark.multimodal.media import image_near_dup

    samples = bytes(range(1, 200)) * 4
    a = b"AUD1|16000|796|" + samples
    corrupt = b"AUD1|16000|796|" + b"\x7f" + samples[1:]
    rows = [
        ("a1", a),
        ("a2", a),
        ("a3", corrupt),
        ("a4", b"AUD1|16000|100|" + bytes(reversed(samples))),
    ]
    df = spark.createDataFrame(rows, "media_id string, media binary")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup(df, "media_id", "media", max_hamming=8).collect()
    }
    assert got[("a1", "a2")] == 0
    assert ("a1", "a3") in got and got[("a1", "a3")] <= 8
    assert all("a4" not in p for p in got)


# --- r11: BMP + WAV real-media legs ----------------------------------------


def test_bmp_roundtrip_and_dispatch():
    from data_ingestion_tool_bakasura__spark.multimodal.bmp import (
        ahash64_bmp,
        decode_bmp_luma,
        encode_bmp_gray,
    )

    for w, h in [(13, 7), (32, 32)]:
        px = bytes(((x * 9 + y * 5) % 256) for y in range(h) for x in range(w))
        for td in (False, True):
            dw, dh, luma = decode_bmp_luma(encode_bmp_gray(w, h, px, top_down=td))
            assert (dw, dh, luma) == (w, h, px)
    bmpb = encode_bmp_gray(16, 16, bytes(range(256)))
    assert MM.ahash64_py(bmpb) == ahash64_bmp(bmpb)
    # RLE-compressed header field -> ValueError -> stand-in fallback
    broken = bytearray(bmpb)
    broken[30] = 1  # BI_RLE8
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_bmp_luma(bytes(broken))
    assert MM.ahash64_py(bytes(broken)) == MM.ahash64_py(bytes(broken))


def test_bmp_png_cross_format_identical_hash():
    """Lossless pair: the same pixels as BMP and PNG hash identically."""
    from data_ingestion_tool_bakasura__spark.multimodal.bmp import encode_bmp_gray
    from data_ingestion_tool_bakasura__spark.multimodal.png import encode_png_gray

    w = h = 64
    pic = bytes(((x * 4) if y < 32 else (255 - x * 4)) & 0xFF
                for y in range(h) for x in range(w))
    assert MM.ahash64_py(encode_bmp_gray(w, h, pic)) == MM.ahash64_py(
        encode_png_gray(w, h, pic)
    )


def _wav_bytes(sr=8000, n=4000, sw=2, amp=0.5):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(sw)
        wf.setframerate(sr)
        if sw == 2:
            frames = b"".join(
                struct.pack("<h", int(amp * 32767 * math.sin(2 * math.pi * 440 * i / sr)))
                for i in range(n)
            )
        else:
            frames = bytes(
                128 + int(amp * 127 * math.sin(2 * math.pi * 440 * i / sr))
                for i in range(n)
            )
        wf.writeframes(frames)
    return buf.getvalue()


def test_wav_features_real_pcm(spark):
    """RIFF/WAVE payloads yield REAL sample-domain features: a 0.5-amp
    sine has mean-square energy ~ amp^2/2 = 0.125; the AUD1 stand-in
    rows keep their historical semantics side by side."""
    from data_ingestion_tool_bakasura__spark.multimodal.media import wav_features_py

    wav16 = _wav_bytes(sw=2)
    sr, ns, dur, energy = wav_features_py(wav16)
    assert (sr, ns, dur) == (8000, 4000, 0.5)
    assert abs(energy - 0.125) < 0.01
    sr8, ns8, _, energy8 = wav_features_py(_wav_bytes(sw=1))
    assert (sr8, ns8) == (8000, 4000) and abs(energy8 - 0.125) < 0.02

    df = spark.createDataFrame(
        [("w1", wav16), ("a1", b"AUD1|16000|32000|" + bytes(range(10))),
         ("junk", b"RIFF1234WAVEgarbage")],
        "media_id string, media binary",
    )
    rows = {r["audio_id"]: r for r in MM.audio_features(df).collect()}
    assert set(rows) == {"w1", "a1"}  # malformed WAV dropped, not crashed
    assert rows["w1"]["duration_s"] == 0.5
    assert abs(rows["w1"]["byte_energy"] - 0.125) < 0.01
    assert rows["a1"]["duration_s"] == 2.0  # stand-in semantics unchanged


def test_audio_features_zero_rate_header_survives(spark):
    """r17 (reproduced): a crafted AUD1 header with sample_rate 0
    raised ZeroDivisionError OUTSIDE the _parse_header catch and
    killed the whole task — one hostile row poisoning the batch. It
    now yields duration 0.0 (the WAVE leg's existing guard) and the
    neighboring rows are unaffected."""
    df = spark.createDataFrame(
        [("z0", bytearray(b"AUD1|0|100|xyz")),
         ("ok", bytearray(b"AUD1|8000|16000|abcd"))],
        "media_id string, media binary",
    )
    rows = {r["audio_id"]: r for r in MM.audio_features(df).collect()}
    assert rows["z0"]["duration_s"] == 0.0 and rows["z0"]["sample_rate"] == 0
    assert rows["ok"]["duration_s"] == 2.0
