"""RIFF/AVI MJPEG container (multimodal/avi.py) + the real-pixel
video-near-dup leg it enables: AVI bytes -> per-frame JPEG payloads
(sample_frames dispatch) -> real-pixel aHash (jpeg luma decoder) ->
shot-fingerprint Jaccard — no stand-in anywhere on the path. The
fixture writer is this module's own minimal muxer (encode_avi_mjpeg),
so the parse side is checked against independently-framed bytes."""

from __future__ import annotations

import pytest

from data_ingestion_tool_bakasura__spark.multimodal.avi import (
    avi_frames,
    avi_meta,
    encode_avi_mjpeg,
    is_avi,
)
from data_ingestion_tool_bakasura__spark.multimodal.jpeg import encode_jpeg_gray


def _gradient(w=48, h=32, o=0):
    return bytes(((x * 5 + y * 3 + o) % 256) for y in range(h) for x in range(w))


def _jpeg(o=0, w=48, h=32):
    return encode_jpeg_gray(w, h, _gradient(w, h, o))


def _avi(offsets, fps=10):
    return encode_avi_mjpeg([_jpeg(o) for o in offsets], fps=fps)


# --- parser ---------------------------------------------------------------

def test_roundtrip_and_meta():
    frames = [_jpeg(o) for o in (0, 7, 14)]
    avi = encode_avi_mjpeg(frames, fps=25)
    assert is_avi(avi)
    assert avi_frames(avi) == frames
    assert avi_meta(avi) == {"format": "AVI", "fps": 25, "n_frames": 3}


def test_odd_sized_frames_pad_to_even():
    # chunk data pads to even length; an odd JPEG must survive exactly
    f = _jpeg(3)
    if len(f) % 2 == 0:
        f = f + b"\xff\xd9"[:1]  # force odd (trailing byte is ignored bytes-wise)
    out = avi_frames(encode_avi_mjpeg([f, _jpeg(5)]))
    assert out[0] == f and len(out) == 2


def test_truncated_file_stops_quietly():
    avi = _avi([0, 7, 14])
    cut = avi[: int(len(avi) * 0.6)]
    assert len(avi_frames(cut)) <= 3  # no raise, partial frames at most


def test_non_avi_rejected():
    with pytest.raises(ValueError, match="AVI"):
        avi_frames(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="AVI"):
        avi_meta(b"\x89PNG\r\n\x1a\n")
    assert not is_avi(b"") and not is_avi(None)


def test_zero_video_chunks_yields_no_frames():
    import struct

    body = b"AVI " + b"JUNK" + struct.pack("<I", 4) + b"abcd"
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    assert avi_frames(avi) == []
    assert avi_meta(avi)["n_frames"] == 0


# --- Spark legs -----------------------------------------------------------

def test_sample_frames_avi_dispatch(spark):
    from data_ingestion_tool_bakasura__spark.multimodal.media import sample_frames

    avi = _avi([0, 7, 14, 21])
    vid1 = b"VID1|10|2|fa\x00fb"
    df = spark.createDataFrame(
        [("a", bytearray(avi)), ("v", bytearray(vid1)), ("n", None)],
        "media_id string, media binary",
    )
    rows = sample_frames(df, every_k=2).collect()
    got = {(r["video_id"], r["frame_index"]): bytes(r["frame"], "latin-1")
           if isinstance(r["frame"], str) else bytes(r["frame"])
           for r in rows}
    # AVI: frames 0 and 2 of 4; VID1: frame 0 of 2 — every_k respected
    assert set(got) == {("a", 0), ("a", 2), ("v", 0)}
    assert got[("a", 0)] == _jpeg(0) and got[("a", 2)] == _jpeg(14)


def test_with_image_meta_avi(spark):
    from data_ingestion_tool_bakasura__spark.multimodal.media import with_image_meta

    df = spark.createDataFrame(
        [("a", bytearray(_avi([0, 7], fps=12)))], "media_id string, media binary"
    )
    m = with_image_meta(df).select("meta.*").collect()[0]
    assert m["format"] == "AVI" and m["error"] is None


def test_video_near_dup_real_pixels_ungated(spark):
    """Two MJPEG AVIs sharing 3 of 4 frames pair through the REAL
    JPEG luma decode (no PIL, no stand-in: every frame carries the
    \\xff\\xd8 magic so ahash64_py takes the jpeg leg); a disjoint
    third video pairs with neither."""
    from data_ingestion_tool_bakasura__spark.multimodal.media import video_near_dup

    a = encode_avi_mjpeg([_jpeg(0), _jpeg(7), _jpeg(14), _jpeg(21)])
    # re-cut of a: same first three frames, different tail
    b = encode_avi_mjpeg([_jpeg(0), _jpeg(7), _jpeg(14), _jpeg(120)])
    c = encode_avi_mjpeg([_jpeg(60), _jpeg(67)])
    df = spark.createDataFrame(
        [("a", bytearray(a)), ("b", bytearray(b)), ("c", bytearray(c))],
        "media_id string, media binary",
    )
    pairs = video_near_dup(df, every_k=1, min_jaccard=0.5).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["id_a"], p["id_b"]) == ("a", "b")
    assert p["shared"] == 3 and p["n_a"] == 4 and p["n_b"] == 4
    assert p["jaccard"] == round(3 / 5, 6)
