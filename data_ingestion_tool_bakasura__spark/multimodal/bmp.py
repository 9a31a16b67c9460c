"""Stdlib BMP (uncompressed DIB) luma decoder — the fourth real-pixel
aHash leg (r11). Screenshots and legacy exports ship as BMP often
enough that the dispatch is worth the ~60 lines: BITMAPINFOHEADER-family
headers, 8-bit palette / 24-bit BGR / 32-bit BGRA, bottom-up and
top-down row orders, 4-byte row padding. Compressed BMPs (BI_RLE*,
BI_BITFIELDS beyond the identity masks) raise ``ValueError`` -> the
stand-in/PIL legs."""

from __future__ import annotations

import struct

BMP_MAGIC = b"BM"


def is_bmp(b) -> bool:
    return b is not None and bytes(b[:2]) == BMP_MAGIC


def decode_bmp_luma(b: bytes) -> tuple[int, int, bytes]:
    """BMP bytes -> (width, height, luma) row-major top-down."""
    raw = bytes(b)
    if not is_bmp(raw):
        raise ValueError("not a BMP (bad magic)")
    try:
        return _decode(raw)
    except (IndexError, struct.error) as e:
        raise ValueError(f"malformed BMP: {e}") from e


def _decode(raw: bytes) -> tuple[int, int, bytes]:
    (data_off,) = struct.unpack_from("<I", raw, 10)
    (hdr_size,) = struct.unpack_from("<I", raw, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack_from("<ii", raw, 18)
    planes, bpp = struct.unpack_from("<HH", raw, 26)
    (compression,) = struct.unpack_from("<I", raw, 30)
    if width <= 0 or height == 0:
        raise ValueError("bad dimensions")
    top_down = height < 0
    height = abs(height)
    if compression not in (0,):
        raise ValueError(f"compressed BMP unsupported (method {compression})")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported bit depth {bpp}")
    lut = None
    if bpp == 8:
        (n_colors,) = struct.unpack_from("<I", raw, 46)
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = raw[pal_off : pal_off + 4 * n_colors]
        if len(pal) < 4 * n_colors:
            raise ValueError("palette truncated")
        lut = [
            (299 * pal[4 * i + 2] + 587 * pal[4 * i + 1] + 114 * pal[4 * i])
            // 1000
            for i in range(n_colors)
        ]
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    if len(raw) < data_off + stride * height:
        raise ValueError("pixel data truncated")
    luma = bytearray(width * height)
    for row in range(height):
        src_row = row if top_down else height - 1 - row
        base = data_off + src_row * stride
        out_base = row * width
        if bpp == 8:
            for x in range(width):
                idx = raw[base + x]
                luma[out_base + x] = lut[idx] if idx < len(lut) else 0
        else:  # BGR(A), little-endian byte order
            for x in range(width):
                o = base + x * bytes_pp
                luma[out_base + x] = (
                    299 * raw[o + 2] + 587 * raw[o + 1] + 114 * raw[o]
                ) // 1000
    return width, height, bytes(luma)


def ahash64_bmp(b: bytes) -> str:
    from data_ingestion_tool_bakasura__spark.multimodal.png import luma_grid8

    w, h, luma = decode_bmp_luma(b)
    grid = luma_grid8(w, h, 1, luma)
    mean = sum(grid) / 64.0
    return "".join("1" if v > mean else "0" for v in grid)


def encode_bmp_gray(width: int, height: int, pixels: bytes,
                    top_down: bool = False) -> bytes:
    """Minimal 8-bit palettized BMP writer (fixtures only)."""
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")
    stride = (width + 3) & ~3
    pal = b"".join(bytes((i, i, i, 0)) for i in range(256))
    data_off = 14 + 40 + len(pal)
    rows = range(height) if top_down else range(height - 1, -1, -1)
    body = b"".join(
        pixels[r * width : (r + 1) * width].ljust(stride, b"\x00") for r in rows
    )
    h_field = -height if top_down else height
    return (
        b"BM"
        + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, width, h_field, 1, 8, 0,
                      len(body), 2835, 2835, 256, 0)
        + pal
        + body
    )
