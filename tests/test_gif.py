"""Stdlib GIF luma decoder (multimodal/gif.py): lossless roundtrip
through real variable-width LZW (the fixture encoder emits literal
codes with periodic CLEARs — valid LZW, distinct arithmetic from the
decoder), interlace reordering, extension skipping, and the aHash
dispatch completing the PNG/JPEG/GIF web trio (r11)."""

from __future__ import annotations

import pytest

from data_ingestion_tool_bakasura__spark.multimodal import media as MM
from data_ingestion_tool_bakasura__spark.multimodal.gif import (
    ahash64_gif,
    decode_gif_luma,
    encode_gif_gray,
    is_gif,
)


def _grad(w, h):
    return bytes(((x * 7 + y * 11) % 256) for y in range(h) for x in range(w))


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("dims", [(40, 24), (13, 9), (300, 5)])
def test_roundtrip_lossless(dims, interlace):
    w, h = dims
    px = _grad(w, h)
    dw, dh, luma = decode_gif_luma(encode_gif_gray(w, h, px, interlace=interlace))
    assert (dw, dh, luma) == (w, h, px)  # GIF is lossless


def test_extensions_skipped_and_first_frame_only():
    """A GCE extension before the frame, and a second frame after it,
    must not disturb the first frame's pixels."""
    px = _grad(16, 16)
    g = bytearray(encode_gif_gray(16, 16, px))
    # splice a Graphic Control Extension right before the image
    # descriptor (0x2C after the 768-byte palette + 13-byte header)
    i = g.index(0x2C, 13 + 768)
    gce = bytes((0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00))
    g2 = g[:i] + gce + g[i:]
    # append a second frame (different pixels) before the trailer
    frame2 = encode_gif_gray(16, 16, bytes(256))
    j = frame2.index(0x2C, 13 + 768)
    g3 = g2[:-1] + frame2[j:]  # frame2's descriptor..trailer
    dw, dh, luma = decode_gif_luma(bytes(g3))
    assert (dw, dh, luma) == (16, 16, px)


def test_malformed_raises_value_error():
    with pytest.raises(ValueError):
        decode_gif_luma(b"GIF89a" + b"\x00" * 4)  # truncated
    with pytest.raises(ValueError):
        decode_gif_luma(b"not a gif")
    ok = encode_gif_gray(4, 4, bytes(16))
    assert is_gif(ok) and not is_gif(b"\x89PNG")
    with pytest.raises(ValueError):
        decode_gif_luma(ok[:-10])  # LZW cut short


def test_ahash_dispatch_and_cross_format_pair(spark):
    """GIF magic routes to real pixels; the SAME picture as GIF and
    PNG (zero shared bytes) pairs through image_near_dup while junk
    with a GIF magic falls back to the stand-in."""
    from data_ingestion_tool_bakasura__spark.multimodal.png import encode_png_gray

    w = h = 64
    pic = bytes(((x * 4) if y < 32 else (255 - x * 4)) & 0xFF
                for y in range(h) for x in range(w))
    g = encode_gif_gray(w, h, pic)
    assert MM.ahash64_py(g) == ahash64_gif(g)
    junk = b"GIF89a" + b"zz" * 30
    assert MM.ahash64_py(junk) == MM.ahash64_py(bytearray(junk))

    rows = [
        (1, g),
        (2, encode_png_gray(w, h, pic)),
        (3, encode_gif_gray(w, h, bytes([9, 246] * 2048))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in MM.image_near_dup(df, "media_id", "payload", max_hamming=3).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 0  # both lossless: identical hash
    assert all(3 not in pair for pair in got)


def test_decode_image_gif_fallback():
    try:
        import PIL  # type: ignore  # noqa: F401
    except ImportError:
        w, h, c, luma = MM.decode_image(encode_gif_gray(5, 3, bytes(range(15))))
        assert (w, h, c) == (5, 3, 1) and luma == bytes(range(15))


def test_adversarial_descriptor_dims_refused_before_lzw():
    """r16 codec trust-boundary review (reproduced): _lzw_decode's
    output bound IS w*h from the image descriptor, so hostile 16-bit
    dims (65535^2 ~ 4.3e9 px) set a multi-gigabyte expansion budget
    from a tiny input; the cap refuses before the LZW loop runs."""
    import struct

    import pytest

    from data_ingestion_tool_bakasura__spark.multimodal import gif as G

    hdr = (b"GIF89a" + struct.pack("<HHBBB", 10, 10, 0x80, 0, 0)
           + b"\x00\x00\x00\xff\xff\xff")
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, 65535, 65535, 0)
    hostile = hdr + desc + bytes([2]) + b"\x01\x04\x00" + b"\x3b"
    with pytest.raises(ValueError, match="MAX_PIXELS"):
        G.decode_gif_luma(hostile)


def test_multiframe_cost_is_one_frame(monkeypatch):
    """r17 advice adjudication (reproduction FAILED, invariant locked):
    the advice claimed _decode walks every image descriptor, so an
    animated GIF could cost frames x MAX_PIXELS of LZW work. It does
    not — _decode returns inside the loop at the FIRST 0x2C block, so
    the per-frame pixel cap IS the per-file budget. This test pins
    that: _lzw_decode must run exactly once no matter how many frames
    follow, so a future refactor that starts walking frames inherits
    the cumulative-budget concern loudly."""
    from data_ingestion_tool_bakasura__spark.multimodal import gif as G

    px = _grad(32, 32)
    single = encode_gif_gray(32, 32, px)
    body = single[6 + 7 + 3 * 256 : -1]  # descriptor..before-trailer
    assert body[0] == 0x2C
    multi = single[:-1] + body * 199 + b"\x3B"  # 200 frames

    calls = []
    real = G._lzw_decode

    def counting(mcs, data, n_expected):
        calls.append(n_expected)
        return real(mcs, data, n_expected)

    monkeypatch.setattr(G, "_lzw_decode", counting)
    dw, dh, luma = decode_gif_luma(multi)
    assert (dw, dh, luma) == (32, 32, px)
    assert calls == [32 * 32]  # one frame decoded, ever
