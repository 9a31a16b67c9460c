"""Stdlib-only GIF **luma** decoder (C15 real-pixel leg, round 11 —
completes the web-image trio with :mod:`.png` and :mod:`.jpeg`).

Decodes the FIRST frame of GIF87a/GIF89a: logical screen + image
descriptors, global/local color tables, extension-block skipping,
variable-width LZW (T.81's sibling spec, GIF89a Appendix F), Adam-less
interlace reordering — then maps palette indices to integer BT.601
luma. Animated GIFs hash by their first frame (the standard
perceptual-dedup convention). Malformed bytes raise ``ValueError`` so
the aHash dispatch falls back to the deterministic stand-in.

The fixture encoder writes valid LZW by emitting literal index codes
with periodic CLEAR codes (the classic "uncompressed GIF" technique),
so roundtrip tests drive the real variable-width decode path without a
compressing encoder.
"""

from __future__ import annotations

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def is_gif(b) -> bool:
    return b is not None and bytes(b[:6]) in GIF_MAGICS


def _lzw_decode(mcs: int, data: bytes, n_expected: int) -> list[int]:
    """Variable-width LZW (GIF flavor): clear/end codes, dict growth to
    12 bits, KwKwK case. Returns palette indices (truncated/padded is
    an error)."""
    clear = 1 << mcs
    end = clear + 1
    out: list[int] = []
    # bit reader: LSB-first within bytes
    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            raise ValueError("LZW data truncated")
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            v |= ((byte >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        return v

    width = mcs + 1
    table: list[list[int]] = [[i] for i in range(clear + 2)]
    prev: list[int] | None = None
    while True:
        code = read_code(width)
        if code == clear:
            table = [[i] for i in range(clear + 2)]
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]  # KwKwK
        else:
            raise ValueError("bad LZW code")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= n_expected:
            break
    if len(out) < n_expected:
        raise ValueError("LZW output short of frame size")
    return out[:n_expected]


def decode_gif_luma(b: bytes) -> tuple[int, int, bytes]:
    """GIF bytes -> (width, height, luma) for the first frame, at the
    frame's own dims (frames smaller than the logical screen return
    their own size — correct for hashing the visible content)."""
    raw = bytes(b)
    if not is_gif(raw):
        raise ValueError("not a GIF (bad signature)")
    try:
        return _decode(raw)
    except (IndexError, ValueError) as e:
        raise ValueError(f"malformed GIF: {e}") from e


def _decode(raw: bytes) -> tuple[int, int, bytes]:
    pos = 6
    flags = raw[pos + 4]
    pos += 7  # logical screen descriptor
    global_pal = b""
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = raw[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(raw):
        block = raw[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while raw[pos]:
                pos += 1 + raw[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02X}")
        w = raw[pos + 4] | (raw[pos + 5] << 8)
        h = raw[pos + 6] | (raw[pos + 7] << 8)
        # refuse adversarial dims BEFORE the LZW decode (r16 codec
        # review): _lzw_decode's output bound IS w*h, so a hostile
        # descriptor (16-bit dims allow 65535^2 ~ 4.3e9) sets a
        # multi-gigabyte expansion budget from a tiny input. This cap
        # is also the PER-FILE budget, not just per-frame: the return
        # below fires on the first image descriptor, so later frames
        # of an animated GIF are never decoded (invariant pinned by
        # test_multiframe_cost_is_one_frame — a refactor that walks
        # frames must add a cumulative budget here)
        from data_ingestion_tool_bakasura__spark.multimodal.png import (
            check_pixel_cap,
        )

        check_pixel_cap(w, h, "GIF image descriptor")
        iflags = raw[pos + 8]
        pos += 9
        pal = global_pal
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            pal = raw[pos : pos + 3 * n]
            pos += 3 * n
        if not pal:
            raise ValueError("no color table")
        mcs = raw[pos]
        pos += 1
        chunks = []
        while raw[pos]:
            ln = raw[pos]
            chunks.append(raw[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(mcs, b"".join(chunks), w * h)
        if iflags & 0x40:  # interlaced: reorder rows (4-pass layout)
            rows = [idx[r * w : (r + 1) * w] for r in range(h)]
            order = (
                list(range(0, h, 8)) + list(range(4, h, 8))
                + list(range(2, h, 4)) + list(range(1, h, 2))
            )
            deint: list[list[int]] = [[]] * h
            for src_row, dst in zip(rows, order):
                deint[dst] = src_row
            idx = [v for row in deint for v in row]
        luma = bytearray(w * h)
        n_colors = len(pal) // 3
        lut = [
            (299 * pal[3 * i] + 587 * pal[3 * i + 1] + 114 * pal[3 * i + 2]) // 1000
            for i in range(n_colors)
        ]
        for i, v in enumerate(idx):
            luma[i] = lut[v] if v < n_colors else 0
        return w, h, bytes(luma)
    raise ValueError("no image descriptor")


def ahash64_gif(b: bytes) -> str:
    """Real-pixel average hash for GIF payloads (first frame)."""
    from data_ingestion_tool_bakasura__spark.multimodal.png import luma_grid8

    w, h, luma = decode_gif_luma(b)
    grid = luma_grid8(w, h, 1, luma)
    mean = sum(grid) / 64.0
    return "".join("1" if v > mean else "0" for v in grid)


def encode_gif_gray(
    width: int, height: int, pixels: bytes, interlace: bool = False
) -> bytes:
    """Minimal valid GIF89a from an 8-bit grayscale buffer: 256-entry
    gray palette, literal LZW codes with periodic CLEARs. Fixture
    writer only."""
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")
    out = bytearray(b"GIF89a")
    out += bytes((width & 0xFF, width >> 8, height & 0xFF, height >> 8))
    out += bytes((0x80 | 0x07, 0, 0))  # global table, 256 entries
    for i in range(256):
        out += bytes((i, i, i))
    out += b"\x2c" + bytes(4) + bytes(
        (width & 0xFF, width >> 8, height & 0xFF, height >> 8)
    )
    out.append(0x40 if interlace else 0x00)
    if interlace:
        order = (
            list(range(0, height, 8)) + list(range(4, height, 8))
            + list(range(2, height, 4)) + list(range(1, height, 2))
        )
        seq = [pixels[r * width + c] for r in order for c in range(width)]
    else:
        seq = list(pixels)
    mcs = 8
    clear, end = 1 << mcs, (1 << mcs) + 1
    width_bits = mcs + 1
    # literal codes: each emitted code grows the table by one; CLEAR
    # before the width would have to grow keeps every code 9-bit
    bits = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width_bits
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    budget = (1 << width_bits) - (clear + 2) - 1  # codes before width grows
    n_since_clear = 0
    for v in seq:
        if n_since_clear >= budget:
            emit(clear)
            n_since_clear = 0
        emit(v)
        n_since_clear += 1
    emit(end)
    if nacc:
        bits.append(acc & 0xFF)
    out.append(mcs)
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
