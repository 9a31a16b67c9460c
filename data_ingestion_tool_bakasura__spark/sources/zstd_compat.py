"""zstd access seam for the ``.warc.zst`` legs.

Common Crawl's current interchange compression is Zstandard
(``.warc.zst``), so the WARC reader/writer (``sources/warc.py``)
needs a zstd codec. Resolution order, cached per process:

1. the ``zstandard`` package — the full API;
2. a minimal :mod:`ctypes` binding to the SYSTEM ``libzstd`` shared
   library (the public zstd C API from facebook/zstd ``zstd.h``:
   ``ZSTD_compress`` / ``ZSTD_compressBound`` /
   ``ZSTD_decompressStream`` / ``ZSTD_isError`` /
   ``ZSTD_getErrorName``) — enough for the one-frame-per-record CC
   member layout this repo writes and reads. ``ZSTD_decompressStream``
   natively reads concatenated frames and skips skippable frames, so
   multi-member ``.warc.zst`` files decode exactly like the package
   leg. Dictionary-bearing seekable archives (CC's layout: a leading
   skippable frame carrying the dictionary) are supported through the
   same API shape the package exposes — ``ZstdCompressionDict(bytes)``
   plus ``dict_data=`` on both codec classes (``ZSTD_createDDict`` /
   ``ZSTD_DCtx_refDDict`` on the read side,
   ``ZSTD_compress_usingDict`` on the write side); ``warc.py``
   resolves the dictionary frame itself and stays backend-agnostic.
3. neither — :func:`get_zstd` returns ``None`` and callers raise the
   same driver-side gate ``ValueError`` as before.

The shim exposes exactly the surface ``sources/warc.py`` consumes
from the real package: ``ZstdCompressor(level=N).compress(bytes)``,
``ZstdDecompressor().stream_reader(raw, read_across_frames=True)``
as a context manager with ``.read()``, ``ZstdCompressionDict`` +
``dict_data=`` on both codec classes, and ``ZstdError``. One-shot
``ZSTD_compress`` at a fixed level writes the frame content size and
no checksum — byte-deterministic for a given libzstd version, the
same contract the package leg documents.

Reference parity note: the reference app has no archive writer at
all (SURVEY.md §2.C2 is mandated-extension scope); the zstd framing
here follows RFC 8878 via the public C API only.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import threading


class ZstdError(Exception):
    """Codec failure from the ctypes libzstd leg (mirrors
    ``zstandard.ZstdError`` so callers catch one shape)."""


#: Adversarial-allocation budget for inflating UNTRUSTED compressed
#: bytes — the codecs' MAX_PIXELS analogue (r17 themed review,
#: reproduced: a 1 MiB crafted .warc.zst of RLE blocks decompresses
#: ~20 GiB and OOMs the worker before any caller can look at the
#: output size). Real archive ratios sit at 3–10×; the 256× ratio
#: plus the 8 GiB ceiling admits every plausible legitimate archive
#: while bounding what a bomb can make one task allocate. The floor
#: keeps tiny members (single-record range fetches) from tripping on
#: ratio alone. Read at call time so tests can shrink them.
MAX_INFLATE_RATIO = 256
MIN_INFLATE_BUDGET = 64 * 1024 * 1024
MAX_INFLATE_BUDGET = 8 * 1024 * 1024 * 1024


def inflate_budget(n_compressed: int) -> int:
    """Max decompressed bytes one inflate of ``n_compressed`` input
    may produce before it is refused as a decompression bomb."""
    return min(
        MAX_INFLATE_BUDGET,
        max(MIN_INFLATE_BUDGET, MAX_INFLATE_RATIO * int(n_compressed)),
    )


class _InBuffer(ctypes.Structure):
    # ZSTD_inBuffer: {const void* src; size_t size; size_t pos;}
    _fields_ = [
        ("src", ctypes.c_void_p),
        ("size", ctypes.c_size_t),
        ("pos", ctypes.c_size_t),
    ]


class _OutBuffer(ctypes.Structure):
    # ZSTD_outBuffer: {void* dst; size_t size; size_t pos;}
    _fields_ = [
        ("dst", ctypes.c_void_p),
        ("size", ctypes.c_size_t),
        ("pos", ctypes.c_size_t),
    ]


_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_lib_failed = False


def _load_lib() -> ctypes.CDLL | None:
    """Load and sign the system libzstd once per process (worker
    processes each pay this once; the handle is then shared across
    tasks in that worker). Lock-free fast path once resolved: this is
    called per compress()/read(), and taking the lock per record
    would serialize every local[N] task thread through one mutex
    (r14-late review); the ZSTD_* calls themselves are stateless or
    per-context and thread-safe."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        name = ctypes.util.find_library("zstd") or "libzstd.so.1"
        try:
            lib = ctypes.CDLL(name)
            lib.ZSTD_versionNumber.restype = ctypes.c_uint
            lib.ZSTD_isError.restype = ctypes.c_uint
            lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
            lib.ZSTD_getErrorName.restype = ctypes.c_char_p
            lib.ZSTD_getErrorName.argtypes = [ctypes.c_size_t]
            lib.ZSTD_compressBound.restype = ctypes.c_size_t
            lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
            lib.ZSTD_compress.restype = ctypes.c_size_t
            lib.ZSTD_compress.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ]
            lib.ZSTD_createDCtx.restype = ctypes.c_void_p
            lib.ZSTD_freeDCtx.restype = ctypes.c_size_t
            lib.ZSTD_freeDCtx.argtypes = [ctypes.c_void_p]
            lib.ZSTD_DStreamOutSize.restype = ctypes.c_size_t
            lib.ZSTD_decompressStream.restype = ctypes.c_size_t
            lib.ZSTD_decompressStream.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(_OutBuffer),
                ctypes.POINTER(_InBuffer),
            ]
            # dictionary API (r14: dictionary-bearing seekable
            # .warc.zst — the CC layout): DDict for the read side,
            # one-shot compress_usingDict for test/fixture writes
            lib.ZSTD_createDDict.restype = ctypes.c_void_p
            lib.ZSTD_createDDict.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
            ]
            lib.ZSTD_freeDDict.restype = ctypes.c_size_t
            lib.ZSTD_freeDDict.argtypes = [ctypes.c_void_p]
            lib.ZSTD_DCtx_refDDict.restype = ctypes.c_size_t
            lib.ZSTD_DCtx_refDDict.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.ZSTD_createCCtx.restype = ctypes.c_void_p
            lib.ZSTD_freeCCtx.restype = ctypes.c_size_t
            lib.ZSTD_freeCCtx.argtypes = [ctypes.c_void_p]
            lib.ZSTD_compress_usingDict.restype = ctypes.c_size_t
            lib.ZSTD_compress_usingDict.argtypes = [
                ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_int,
            ]
        except (OSError, AttributeError):
            _lib_failed = True
            return None
        _lib = lib
        return lib


def _check(lib: ctypes.CDLL, code: int) -> int:
    if lib.ZSTD_isError(code):
        raise ZstdError(lib.ZSTD_getErrorName(code).decode("ascii"))
    return code


class ZstdCompressionDict:
    """Dictionary holder mirroring ``zstandard.ZstdCompressionDict``
    for the one shape ``warc.py`` uses: wrap bytes, pass as
    ``dict_data=``. libzstd auto-detects the format (magic
    ``0xEC30A437`` = trained dictionary, anything else = raw-content
    prefix dictionary) in both ``ZSTD_createDDict`` and
    ``ZSTD_compress_usingDict`` — same sniff the package performs."""

    def __init__(self, data: bytes):
        self._data = bytes(data)

    def as_bytes(self) -> bytes:
        return self._data


class ZstdCompressor:
    """One-shot frame compressor over ``ZSTD_compress`` — one frame
    per call, content size in the header, no checksum (the simple-API
    defaults), matching the member shape ``write_warc`` needs. With
    ``dict_data`` the frame is built by ``ZSTD_compress_usingDict``
    (the seekable-.warc.zst member shape)."""

    def __init__(
        self, level: int = 3, dict_data: ZstdCompressionDict | None = None
    ):
        self._level = int(level)
        self._dict = dict_data

    def compress(self, data: bytes) -> bytes:
        lib = _load_lib()
        if lib is None:  # callers only reach here after require_zstd
            raise ZstdError("system libzstd unavailable")
        data = bytes(data)
        bound = lib.ZSTD_compressBound(len(data))
        dst = ctypes.create_string_buffer(bound)
        if self._dict is None:
            n = _check(
                lib,
                lib.ZSTD_compress(dst, bound, data, len(data), self._level),
            )
            return dst.raw[:n]
        d = self._dict.as_bytes()
        cctx = lib.ZSTD_createCCtx()
        if not cctx:
            raise ZstdError("ZSTD_createCCtx failed")
        try:
            n = _check(
                lib,
                lib.ZSTD_compress_usingDict(
                    cctx,
                    ctypes.cast(dst, ctypes.c_void_p), bound,
                    data, len(data),
                    d, len(d),
                    self._level,
                ),
            )
            return dst.raw[:n]
        finally:
            lib.ZSTD_freeCCtx(cctx)


class _StreamReader:
    """Context manager mirroring ``zstandard``'s ``stream_reader``
    for the one call shape ``parse_warc_records`` uses: enter, one
    ``.read()`` spanning every concatenated frame, exit."""

    def __init__(
        self, data: bytes, dict_data: ZstdCompressionDict | None = None
    ):
        self._data = bytes(data)
        self._dict = dict_data

    def __enter__(self) -> "_StreamReader":
        return self

    def __exit__(self, *exc) -> bool:
        return False

    def read(self) -> bytes:
        lib = _load_lib()
        if lib is None:
            raise ZstdError("system libzstd unavailable")
        data = self._data
        if not data:
            return b""
        dctx = lib.ZSTD_createDCtx()
        if not dctx:
            raise ZstdError("ZSTD_createDCtx failed")
        ddict = None
        try:
            if self._dict is not None:
                d = self._dict.as_bytes()
                ddict = lib.ZSTD_createDDict(d, len(d))
                if not ddict:
                    raise ZstdError("ZSTD_createDDict failed")
                # the referenced DDict applies to every following
                # frame on this context; frames written without a
                # dictionary still decode (their matches never reach
                # before frame start)
                _check(lib, lib.ZSTD_DCtx_refDDict(dctx, ddict))
            src = ctypes.create_string_buffer(data, len(data))
            inb = _InBuffer(
                ctypes.cast(src, ctypes.c_void_p), len(data), 0
            )
            osz = lib.ZSTD_DStreamOutSize()
            obuf = ctypes.create_string_buffer(osz)
            chunks: list[bytes] = []
            ret = 0
            # decompressStream consumes concatenated frames back to
            # back (skippable frames are swallowed); ret == 0 marks a
            # frame boundary and the next iteration opens the next
            # frame with the same context. Every iteration offers a
            # fresh full output buffer, so the stream always advances
            # or errors — no livelock case. When a call FILLS the
            # output buffer, zstd may hold flushed-pending bytes
            # internally and must be called again even with no input
            # left (r14-late review: exiting on input exhaustion alone
            # dropped that tail and mis-reported a valid large record
            # as truncated — real CC records routinely decompress past
            # the ~128 KB ZSTD_DStreamOutSize). `status` records the
            # return of the last PRODUCTIVE call (consumed input or
            # produced output): a final unproductive drain probe on a
            # fresh-frame boundary returns a next-frame hint and must
            # not be read as mid-frame truncation.
            status = 0
            budget = inflate_budget(len(data))
            total = 0
            while True:
                before = inb.pos
                outb = _OutBuffer(
                    ctypes.cast(obuf, ctypes.c_void_p), osz, 0
                )
                ret = _check(
                    lib,
                    lib.ZSTD_decompressStream(
                        dctx, ctypes.byref(outb), ctypes.byref(inb)
                    ),
                )
                if outb.pos or inb.pos > before:
                    status = ret
                if outb.pos:
                    total += outb.pos
                    if total > budget:
                        # r17 themed review: enforced INSIDE the loop —
                        # a caller checking len(read()) is already OOM
                        raise ZstdError(
                            f"decompressed output exceeds the "
                            f"{budget}-byte inflate budget for "
                            f"{len(data)} compressed bytes: refusing "
                            f"adversarial allocation (zstd bomb?)"
                        )
                    chunks.append(obuf.raw[: outb.pos])
                if inb.pos >= inb.size and outb.pos < osz:
                    break
            if status != 0:
                # input exhausted mid-frame: a truncated archive must
                # fail loudly, never return a silently short corpus
                raise ZstdError(
                    "truncated zstd frame (input ended mid-frame)"
                )
            return b"".join(chunks)
        finally:
            if ddict is not None:
                lib.ZSTD_freeDDict(ddict)
            lib.ZSTD_freeDCtx(dctx)


class ZstdDecompressor:
    def __init__(self, dict_data: ZstdCompressionDict | None = None):
        self._dict = dict_data

    def stream_reader(
        self, data: bytes, read_across_frames: bool = True
    ) -> _StreamReader:
        if not read_across_frames:
            # the shim always concatenates frames; silently honoring
            # only the True semantics would make record framing differ
            # between package-backed and shim-backed hosts
            raise NotImplementedError(
                "ctypes zstd shim only supports read_across_frames=True"
            )
        return _StreamReader(data, dict_data=self._dict)


class _CtypesShim:
    """Namespace with the exact attribute surface warc.py touches."""

    ZstdError = ZstdError
    ZstdCompressor = ZstdCompressor
    ZstdCompressionDict = ZstdCompressionDict
    ZstdDecompressor = ZstdDecompressor
    backend = "ctypes-libzstd"


def get_zstd():
    """The resolved zstd namespace (package first, then the ctypes
    libzstd shim), or ``None`` when neither backend exists."""
    try:
        import zstandard  # type: ignore[import-not-found]

        return zstandard
    except ImportError:
        pass
    if _load_lib() is not None:
        return _CtypesShim
    return None


def require_zstd(what: str):
    """``get_zstd()`` or a driver-grade gate error naming the fix."""
    z = get_zstd()
    if z is None:
        raise ValueError(
            f"{what}: install the 'zstandard' package (no system "
            "libzstd shared library found either) to handle "
            ".warc.zst archives"
        )
    return z
