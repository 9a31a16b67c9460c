"""r17 themed review: adversarial-allocation budgets for every codec
that inflates UNTRUSTED compressed bytes (the MAX_PIXELS analogue the
r16 image codecs got). Reproduced before fixing: a 1 MiB crafted
.warc.zst (RLE blocks) decompressed ~20 GiB through the old unbounded
``r.read()``; ``gzip.decompress`` has the same shape at 1032:1. These
tests pin (1) the budget policy, (2) bomb refusal on every leg, and
(3) byte-identical semantics with the stdlib one-shots on non-bomb
input — including the exception CLASSES callers dispatch on."""

from __future__ import annotations

import gzip
import zlib

import pytest

from data_ingestion_tool_bakasura__spark.sources import zstd_compat as zc
from data_ingestion_tool_bakasura__spark.sources.warc import (
    _bounded_brotli_body,
    _bounded_gunzip,
    _bounded_zlib_body,
    _bounded_zstd_read,
    parse_warc_records,
    split_http_response,
)


def _shrink_budget(monkeypatch, floor=1 << 20, ratio=4):
    monkeypatch.setattr(zc, "MIN_INFLATE_BUDGET", floor)
    monkeypatch.setattr(zc, "MAX_INFLATE_RATIO", ratio)


def test_inflate_budget_policy():
    # floor for tiny inputs, ratio in the middle, hard ceiling on top
    assert zc.inflate_budget(0) == zc.MIN_INFLATE_BUDGET
    assert zc.inflate_budget(1024) == zc.MIN_INFLATE_BUDGET
    mid = zc.MIN_INFLATE_BUDGET // zc.MAX_INFLATE_RATIO * 8
    assert zc.inflate_budget(mid) == mid * zc.MAX_INFLATE_RATIO
    assert zc.inflate_budget(1 << 40) == zc.MAX_INFLATE_BUDGET
    # a real Common Crawl shape (~1 GiB member at ~4x) must be admitted
    assert zc.inflate_budget(1 << 30) >= 5 * (1 << 30)


def test_bounded_gunzip_matches_gzip_semantics():
    m = gzip.compress(b"hello")
    # multi-member concat (the CC per-record layout)
    assert _bounded_gunzip(m + m) == b"hellohello"
    # trailing zero padding tolerated (tape-padding convention)
    assert _bounded_gunzip(m + b"\x00" * 8) == b"hello"
    # garbage after the last member -> the same class gzip raises
    with pytest.raises(gzip.BadGzipFile):
        _bounded_gunzip(m + b"JUNK")
    # truncation -> the same class gzip raises
    with pytest.raises(EOFError):
        _bounded_gunzip(m[:-4])


def test_gzip_bomb_refused(monkeypatch):
    _shrink_budget(monkeypatch)
    bomb = gzip.compress(b"\x00" * (8 << 20))  # ~8 KiB compressed
    with pytest.raises(ValueError, match="adversarial allocation"):
        _bounded_gunzip(bomb)
    # under the budget the same data inflates fine
    ok = gzip.compress(b"\x00" * (1 << 19))
    assert _bounded_gunzip(ok) == b"\x00" * (1 << 19)


@pytest.mark.skipif(zc.get_zstd() is None, reason="no zstd backend")
def test_zstd_shim_bomb_refused(monkeypatch):
    z = zc.get_zstd()
    if getattr(z, "backend", "") != "ctypes-libzstd":
        pytest.skip("zstandard package leg active; shim loop not reachable")
    _shrink_budget(monkeypatch)
    bomb = z.ZstdCompressor().compress(b"\x00" * (8 << 20))
    with pytest.raises(z.ZstdError, match="adversarial allocation"):
        with z.ZstdDecompressor().stream_reader(
            bomb, read_across_frames=True
        ) as r:
            r.read()
    # ...and parse_warc_records converts that into its loud ValueError
    with pytest.raises(ValueError, match="failed to decode"):
        parse_warc_records(bomb)


def test_bounded_zstd_read_package_leg(monkeypatch):
    """The zstandard-package leg is exercised through a fake backend:
    a reader yielding 1 MiB slices forever must be refused at the
    budget, and a finite reader must concatenate exactly."""
    _shrink_budget(monkeypatch)

    class Finite:
        def __init__(self, chunks):
            self._chunks = list(chunks)

        def read(self, n):
            return self._chunks.pop(0) if self._chunks else b""

    class Endless:
        def read(self, n):
            return b"\x00" * n

    class FakePkg:  # no .backend attr -> treated as the package
        pass

    assert _bounded_zstd_read(FakePkg, Finite([b"ab", b"cd"]), 4, "t") == b"abcd"
    with pytest.raises(ValueError, match="adversarial allocation"):
        _bounded_zstd_read(FakePkg, Endless(), 4, "t")


def test_http_body_bomb_kept_compressed(monkeypatch):
    """Per-record isolation: one hostile page body must not kill the
    archive task — an over-budget body stays compressed, exactly like
    a corrupt one."""
    _shrink_budget(monkeypatch)
    bomb = gzip.compress(b"\x00" * (8 << 20))
    resp = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + bomb
    )
    status, ctype, payload = split_http_response(resp)
    assert status == 200 and payload == bomb  # passed through, task alive
    # non-bomb bodies still decode (semantics preserved)
    ok = gzip.compress(b"<p>hi</p>")
    _, _, p = split_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + ok
    )
    assert p == b"<p>hi</p>"
    # truncation still raises zlib.error internally -> pass-through
    assert _bounded_zlib_body(ok, 47) == b"<p>hi</p>"
    with pytest.raises(zlib.error):
        _bounded_zlib_body(ok[:-3], 47)


def test_brotli_leg_budget_with_fake_lib(monkeypatch):
    """The brotli leg is import-gated (no lib in this sandbox), so the
    budget path is driven through a fake module: an incremental
    decompressor that inflates past the budget must be refused (body
    passes through compressed); a well-behaved one decodes."""
    import sys

    _shrink_budget(monkeypatch)

    class BombDecompressor:
        def decompress(self, data):
            return b"\x00" * (4 << 20)  # 4 MiB per 64 KiB slice

    class OkDecompressor:
        def __init__(self):
            self._out = b"<p>br body</p>"

        def decompress(self, data):
            out, self._out = self._out, b""
            return out

    class FakeBrotli:
        Decompressor = BombDecompressor

    monkeypatch.setitem(sys.modules, "brotli", FakeBrotli)
    assert _bounded_brotli_body(b"x" * 100) == b"x" * 100  # refused

    FakeBrotli.Decompressor = OkDecompressor
    assert _bounded_brotli_body(b"x" * 100) == b"<p>br body</p>"
