"""Stdlib baseline-PNG decoder (multimodal/png.py) + the real-pixel
aHash leg it gives image near-dup (r11; VERDICT r10 "What's missing"
#1). Decode correctness is checked against independently
forward-filtered scanlines (the test applies the PNG filters itself,
the decoder must invert them); the e2e test plants REAL PNGs — an
original and a one-pixel edit — and asserts they pair through the
unmodified ``image_near_dup`` seam with no codec libs installed."""

from __future__ import annotations

import struct
import zlib

import pytest

from data_ingestion_tool_bakasura__spark.multimodal import media as MM
from data_ingestion_tool_bakasura__spark.multimodal.png import (
    ahash64_png,
    decode_png,
    encode_png_gray,
    is_png,
    luma_grid8,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png(width, height, color_type, raw_scanlines, palette=None, depth=8,
         interlace=0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0,
                       interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette)
    return out + _chunk(b"IDAT", zlib.compress(raw_scanlines)) + _chunk(b"IEND", b"")


def _filter_rows(pixels, width, height, bpp, filter_types):
    """FORWARD-apply PNG filters (independent arithmetic the decoder
    must invert)."""
    stride = width * bpp
    out = bytearray()
    prev = bytes(stride)
    for y, ft in zip(range(height), filter_types):
        row = pixels[y * stride : (y + 1) * stride]
        out.append(ft)
        for i in range(stride):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                v = row[i]
            elif ft == 1:
                v = row[i] - a
            elif ft == 2:
                v = row[i] - b
            elif ft == 3:
                v = row[i] - ((a + b) >> 1)
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = row[i] - pr
            out.append(v & 0xFF)
        prev = row
    return bytes(out)


def test_roundtrip_gray():
    px = bytes((x * 7 + y * 31) & 0xFF for y in range(5) for x in range(9))
    w, h, c, got = decode_png(encode_png_gray(9, 5, px))
    assert (w, h, c) == (9, 5, 1) and got == px


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_every_filter_inverts(ft):
    """Each scanline filter 0-4, forward-applied here, must be undone
    exactly by the decoder — for a 3-channel image (bpp=3 exercises
    the i>=bpp branches)."""
    wpx, hpx = 6, 4
    px = bytes((x * 29 + y * 83 + ch * 17) & 0xFF
               for y in range(hpx) for x in range(wpx) for ch in range(3))
    raw = _filter_rows(px, wpx, hpx, 3, [ft] * hpx)
    w, h, c, got = decode_png(_png(wpx, hpx, 2, raw))
    assert (w, h, c) == (wpx, hpx, 3) and got == px


def test_mixed_filters_and_rgba():
    wpx, hpx = 4, 4
    px = bytes((x * 53 + y * 11 + ch * 7) & 0xFF
               for y in range(hpx) for x in range(wpx) for ch in range(4))
    raw = _filter_rows(px, wpx, hpx, 4, [0, 1, 2, 4])
    w, h, c, got = decode_png(_png(wpx, hpx, 6, raw))
    assert (w, h, c) == (wpx, hpx, 4) and got == px


def test_palette_expands_to_rgb():
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = bytes([0, 1, 2, 2, 1, 0])
    raw = b"\x00" + idx[:3] + b"\x00" + idx[3:]
    w, h, c, got = decode_png(_png(3, 2, 3, raw, palette=palette))
    assert (w, h, c) == (3, 2, 3)
    assert got[:3] == bytes([255, 0, 0]) and got[3:6] == bytes([0, 255, 0])
    assert got[15:18] == bytes([255, 0, 0])


def test_unsupported_and_malformed_raise_value_error():
    px = bytes(4)
    raw = _filter_rows(px, 2, 2, 1, [0, 0])
    with pytest.raises(ValueError):
        decode_png(_png(2, 2, 0, raw, depth=16))  # 16-bit
    with pytest.raises(ValueError):
        decode_png(_png(2, 2, 0, raw, interlace=1))  # Adam7
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\njunk")  # truncated
    with pytest.raises(ValueError):
        decode_png(b"IMG1|2|2|1|xx")  # not a PNG at all
    assert not is_png(b"IMG1|...") and is_png(encode_png_gray(1, 1, b"\x00"))


def test_luma_grid_every_cell_nonempty_at_any_size():
    for w, h in [(1, 1), (3, 2), (8, 8), (13, 7), (40, 40)]:
        px = bytes((i * 37) & 0xFF for i in range(w * h))
        grid = luma_grid8(w, h, 1, px)
        assert len(grid) == 64
        assert all(0.0 <= v <= 255.0 for v in grid)


def test_luma_numpy_and_stdlib_paths_agree(monkeypatch):
    """The hash must not depend on whether numpy was importable."""
    import data_ingestion_tool_bakasura__spark.multimodal.png as P

    px = bytes((x * 3 + y * 5) & 0xFF for y in range(20) for x in range(20) )
    with_np = P.luma_grid8(20, 20, 1, px)
    monkeypatch.setattr(P, "_np", None)
    assert P.luma_grid8(20, 20, 1, px) == with_np


def _gradient_png(edit_xy=None) -> bytes:
    w = h = 64
    px = bytearray(((x * 4) if y < h // 2 else (255 - x * 4)) & 0xFF
                   for y in range(h) for x in range(w))
    if edit_xy:
        x, y = edit_xy
        px[y * w + x] ^= 0xFF
    return encode_png_gray(w, h, bytes(px))


def test_ahash_png_one_pixel_edit_is_near():
    a = ahash64_png(_gradient_png())
    b = ahash64_png(_gradient_png(edit_xy=(5, 5)))
    assert len(a) == 64 and set(a) <= {"0", "1"}
    assert sum(x != y for x, y in zip(a, b)) <= 2
    # a structurally different image is far
    flat = encode_png_gray(64, 64, bytes([40, 220] * 2048))
    c = ahash64_png(flat)
    assert sum(x != y for x, y in zip(a, c)) > 8


def test_ahash64_py_dispatch_and_standin_unchanged():
    """PNG magic -> real-pixel hash; IMG1/text payloads -> the exact
    historical block-digest hash (byte-identical: the q_image_near_dup
    oracle mirrors it in SQL)."""
    import hashlib

    png = _gradient_png()
    assert MM.ahash64_py(png) == ahash64_png(png)
    # str round-trip of the same bytes dispatches identically
    assert MM.ahash64_py(png.decode("latin-1")) == ahash64_png(png)

    s = "IMG1|8|8|1|" + "payload " * 16
    L = max(1, len(s) // 64)
    px = [hashlib.md5(s[i * L : i * L + L].encode()).digest()[0] for i in range(64)]
    mean = sum(px) / 64
    want = "".join("1" if p > mean else "0" for p in px)
    assert MM.ahash64_py(s) == want

    # malformed PNG (good magic, junk body) falls back deterministically
    junk = b"\x89PNG\r\n\x1a\n" + b"zz" * 40
    assert MM.ahash64_py(junk) == MM.ahash64_py(bytearray(junk))


def test_image_near_dup_real_png_pair_ungated(spark):
    """The r10 verdict's done-criterion: a planted pair of REAL PNGs
    (original + 1-pixel edit) lands in image_near_dup output on this
    container (no PIL), while an unrelated PNG stays unpaired —
    through the SAME banded seam the stand-in uses."""
    rows = [
        (1, _gradient_png()),
        (2, _gradient_png(edit_xy=(30, 10))),
        (3, encode_png_gray(64, 64, bytes([7, 250] * 2048))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in MM.image_near_dup(df, "media_id", "payload", max_hamming=3).collect()
    }
    assert (1, 2) in got and got[(1, 2)] <= 2
    assert all(3 not in pair for pair in got)


def test_adversarial_dims_and_inflate_are_bounded():
    """r16 codec trust-boundary review (reproduced, peak-RSS measured):
    crawl images are untrusted bytes — a tiny file declaring huge IHDR
    dims must refuse BEFORE allocation, and a surplus-IDAT bomb must
    inflate only the expected filtered bytes (the one-shot
    zlib.decompress inflated everything first)."""
    import struct
    import zlib

    import pytest

    from data_ingestion_tool_bakasura__spark.multimodal import png as P

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    # declared 50000x50000 (2.5e9 px) from ~1 KB of input: refused
    ihdr = struct.pack(">IIBBBBB", 50000, 50000, 8, 0, 0, 0, 0)
    bomb = (P.PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\0" * 1000)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="MAX_PIXELS"):
        P.decode_png(bomb)

    # legit dims + 50 MB of surplus decompressed zeros: inflate stops
    # at the expected byte count and the decode succeeds
    ihdr2 = struct.pack(">IIBBBBB", 100, 100, 8, 0, 0, 0, 0)
    big = zlib.compress(b"\0" * 50_000_000)
    ok = (P.PNG_MAGIC + chunk(b"IHDR", ihdr2) + chunk(b"IDAT", big)
          + chunk(b"IEND", b""))
    w, h, c, px = P.decode_png(ok)
    assert (w, h, c) == (100, 100, 1) and len(px) == 100 * 100
