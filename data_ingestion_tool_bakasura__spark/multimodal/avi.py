"""Stdlib RIFF/AVI container parser — the real-container leg of
:func:`..multimodal.media.sample_frames` (round 11).

Motion-JPEG AVI is the one mainstream video container a pure-stdlib
engine can open end-to-end: the RIFF framing is length-prefixed
chunks, and each ``##dc``/``##db`` video chunk carries a complete
baseline JPEG image, which :mod:`.jpeg` already decodes to real
pixels. That closes the loop for video near-dup: AVI bytes ->
per-frame JPEG payloads (this module) -> real-pixel aHash
(media.ahash64_py's JPEG dispatch) -> shot-fingerprint Jaccard
(media.video_near_dup) — no stand-in anywhere on the path. Other
codecs (H.264/VP9/AV1) need libav and stay behind the documented
``VID1`` stand-in container, same split as PNG/JPEG-real vs
block-digest for images.

Reference analog: the reference renders real pixmaps from documents
(``embedding_utils.py:145-146``); the same fidelity standard applied
to the video near-dup family.

Format notes (public spec, msdn AVI RIFF reference):

- file = ``RIFF <size> AVI  [chunks...]``; every chunk is
  ``fourcc <u32le size> <data> [pad to even]``;
- ``LIST <size> <type> [subchunks...]`` nests (``hdrl``, ``movi``);
- video frame chunks have fourcc ``<2-digit stream id>db|dc``
  (uncompressed / compressed); MJPEG payloads start ``\\xff\\xd8``;
- the ``avih`` main header carries dwMicroSecPerFrame (offset 0) and
  dwTotalFrames (offset 16), both u32le.

The parser is tolerant the dead-letter way: truncated/odd trailing
bytes end the walk instead of raising; a file with zero video chunks
yields no frames (and near-dup simply has nothing to pair).
"""

from __future__ import annotations

import struct

__all__ = ["is_avi", "avi_frames", "avi_meta", "encode_avi_mjpeg"]


def is_avi(b) -> bool:
    """True when the payload carries the RIFF/AVI magic."""
    raw = bytes(b[:12]) if b is not None else b""
    return len(raw) >= 12 and raw[:4] == b"RIFF" and raw[8:12] == b"AVI "


def _walk(raw: bytes, start: int, end: int, frames: list, meta: dict) -> None:
    """Iterative chunk walk over raw[start:end); appends video-chunk
    payloads to ``frames`` in file order and fills ``meta`` from the
    first ``avih`` header."""
    stack = [(start, end)]
    while stack:
        pos, limit = stack.pop()
        while pos + 8 <= limit:
            fourcc = raw[pos : pos + 4]
            (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
            data_start = pos + 8
            data_end = data_start + size
            if data_end > limit:  # truncated chunk: stop this level
                break
            if fourcc in (b"LIST", b"RIFF"):
                # descend past the 4-byte list type
                if size >= 4:
                    stack.append((data_start + 4, data_end))
            elif (
                fourcc[:2].isdigit()
                and fourcc[2:4] in (b"dc", b"db")
                and size > 0
            ):
                frames.append(raw[data_start:data_end])
            elif fourcc == b"avih" and size >= 20 and "fps" not in meta:
                (us_per_frame,) = struct.unpack("<I", raw[data_start : data_start + 4])
                (total,) = struct.unpack(
                    "<I", raw[data_start + 16 : data_start + 20]
                )
                meta["fps"] = int(round(1_000_000 / us_per_frame)) if us_per_frame else 0
                meta["n_frames"] = int(total)
            pos = data_end + (size & 1)  # chunks pad to even


def avi_frames(b) -> list[bytes]:
    """All video-stream chunk payloads (``##dc``/``##db``) in file
    order. For an MJPEG AVI each element is a complete JPEG image."""
    raw = bytes(b)
    if not is_avi(raw):
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []
    _walk(raw, 12, len(raw), frames, {})
    return frames


def avi_meta(b) -> dict:
    """``{"format": "AVI", "fps": .., "n_frames": ..}`` from the avih
    main header (fps 0 / n_frames actual chunk count when absent)."""
    raw = bytes(b)
    if not is_avi(raw):
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []
    meta: dict = {}
    _walk(raw, 12, len(raw), frames, meta)
    return {
        "format": "AVI",
        "fps": meta.get("fps", 0),
        "n_frames": meta.get("n_frames", len(frames)),
    }


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) & 1 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def encode_avi_mjpeg(frames: list[bytes], fps: int = 10) -> bytes:
    """Minimal spec-shaped MJPEG AVI writer (fixture/provider twin of
    :func:`avi_frames`, the same role :func:`..jpeg.encode_jpeg_gray`
    plays for the JPEG decoder): one video stream, one ``00dc`` chunk
    per frame, a real ``avih`` header. Not a general muxer — no idx1
    index, no audio — but produced files re-parse through
    :func:`avi_frames`/:func:`avi_meta` and open in common players."""
    us_per_frame = int(1_000_000 / fps) if fps else 0
    avih = struct.pack(
        "<14I",
        us_per_frame,  # dwMicroSecPerFrame
        0,             # dwMaxBytesPerSec
        0,             # dwPaddingGranularity
        0x10,          # dwFlags (AVIF_HASINDEX unset; 0x10=WASCAPTUREFILE-ish benign)
        len(frames),   # dwTotalFrames
        0, 1, 0,       # dwInitialFrames, dwStreams, dwSuggestedBufferSize
        0, 0,          # dwWidth, dwHeight (0: per-frame JPEG dims rule)
        0, 0, 0, 0,    # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps or 1, 0, len(frames),
        0, 0xFFFFFFFF, 0, 0, 0, 0, 0,
    )
    strl = _chunk(b"LIST", b"strl" + _chunk(b"strh", strh))
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih) + strl)
    movi = _chunk(
        b"LIST", b"movi" + b"".join(_chunk(b"00dc", f) for f in frames)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
