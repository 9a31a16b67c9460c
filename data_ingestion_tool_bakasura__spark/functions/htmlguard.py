"""Cost-bounded driving of the stdlib ``html.parser`` (r17 themed
review — the HTML analogue of the codecs' MAX_PIXELS and the archive
readers' inflate budget).

Reproduced before fixing: ``HTMLParser`` is quadratic on several
degenerate inputs because, for every position whose construct never
terminates, it rescans the rest of the buffer (``parse_endtag`` /
``parse_comment`` / ``check_for_whole_start_tag`` all scan to EOF,
then ``goahead``'s end-stage fallback advances a few characters and
repeats). Measured on this box, one ``feed``+``close`` of a crafted
page costs:

    ``"</" * n``      100 KB ->   1.5 s   (8x bytes -> 48x time)
    ``"<!--" * n``    100 KB ->   7.0 s
    ``"<a " * n``     100 KB -> 129.8 s   (~3.6 h at 1 MB)

i.e. ONE hostile crawled page wedges an executor thread for hours.
These parsers sit directly on raw crawl bytes (html_to_text, jusText
blocks, page metadata, outlinks), the same trust boundary the robots
and PII regexes were hardened against in r16.

The guard: :func:`bounded_parse` feeds the document in geometrically
growing slices and charges each feed the backlog it may rescan
(``len(parser.rawdata)``, the upper bound of one end=0 pass — every
non-terminating construct breaks ``goahead`` after a single scan).
When the cumulative charge crosses a budget LINEAR in the document
size, the rest of the page is dropped — the same "keep whatever
parsed" contract the callers already apply to parser exceptions. At
EOF, a backlog larger than :data:`CLOSE_BACKLOG_CAP` is discarded
instead of fed to ``close()``, whose end-stage pass is quadratic in
the backlog with a heavy regex constant (the 130 s case above; a
truncated multi-KB construct at EOF is garbage bytes, not content —
dropping it is strictly better text). Deliberately work-counted, not
wall-clock-timed, so the same page always yields the same output.

A well-formed page never trips any of this: its backlog stays at a
few bytes (constructs complete within a slice or two), so the charge
is ~``len(html)`` against a budget of ``8 * len(html)``, and its EOF
backlog is empty. Pinned by tests: bounded output == unbounded
output over the repo's legitimate HTML fixtures.
"""

from __future__ import annotations

#: first feed slice; doubles each feed (geometric growth keeps the
#: legit-page rescan overhead of slicing itself at <= 2x one pass)
FIRST_SLICE = 64 * 1024
MAX_SLICE = 1024 * 1024
#: work-units (~bytes scanned) allowed per page: linear in the page
#: with a generous floor so small hostile pages still terminate fast
BUDGET_FLOOR = 1 << 24
BUDGET_RATIO = 8
#: max unparseable backlog handed to close(); close()'s end-stage is
#: O(backlog^2) with a ~(B/25KB)^2 * 8s regex constant, so 2 KB keeps
#: the worst close() under ~0.1 ms-scale work
CLOSE_BACKLOG_CAP = 2048


def bounded_parse(parser, html: str) -> None:
    """Drive ``parser`` over ``html`` under the work budget. Tolerant
    like the call sites' own try/except: never raises for content
    reasons; on budget exhaustion the remaining input is dropped and
    the parser keeps everything handled so far."""
    budget = max(BUDGET_FLOOR, BUDGET_RATIO * len(html))
    spent = 0
    pos = 0
    slice_len = FIRST_SLICE
    n = len(html)
    while pos < n:
        piece = html[pos : pos + slice_len]
        pos += len(piece)
        # one end=0 pass rescans at most the current backlog plus the
        # new slice before it either consumes or breaks — charge that
        spent += len(parser.rawdata) + len(piece)
        if spent > budget:
            return  # drop the rest; keep what parsed (tolerant)
        parser.feed(piece)
        slice_len = min(slice_len * 2, MAX_SLICE)
    if len(parser.rawdata) > CLOSE_BACKLOG_CAP:
        # a big EOF backlog is a construct that never terminated —
        # close() would salami-scan it quadratically to emit garbage
        parser.rawdata = ""
    parser.close()
