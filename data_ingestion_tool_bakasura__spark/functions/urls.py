"""URL functions (crawl-curation leg of the C1 WARC aperture, round 10):
host/domain extraction, tracking-param-stripping normalization, path
depth — the string ops a Common-Crawl-scale curation pipeline runs on
every record URL (C4 / RefinedWeb-style: URL dedup, per-domain caps,
domain blocklists).

Design: every op is a pure Spark *Column expression* built from
``regexp_extract`` / higher-order ``filter`` — JVM-side, codegen'd, no
Python in the hot path — and each has a DuckDB SQL *twin* generated
from the SAME pattern constants (``host_sql`` etc.), so the oracle
queries in ``plans/crawl_q.py`` cannot drift from the implementation.
The regexes are deliberately RE2-and-Java compatible: character
classes and one optional non-capturing group only — no lookaround, no
backreferences.

Scope, stated honestly: absolute ``http(s)://`` URLs (the WARC
``WARC-Target-URI`` shape). A URL with no scheme extracts to empty
host/path — callers filter on ``url_host != ''`` if the input is
dirty. ``registrable_domain`` uses a small built-in multi-part-suffix
table, not the full Public Suffix List; pass ``extra_suffixes`` (or a
broadcast join against a full PSL table) when country-code coverage
matters.

The reference never touches URLs (its inputs are uploaded files); this
family comes from the mandated training-data-pipeline extension list.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- shared pattern constants (single source for Spark AND the oracle) ---

#: scheme, e.g. 'https' (group 1)
SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
#: host:port after optional userinfo (group 1), e.g. 'www.ex.com:8080'
HOSTPORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]*)"
#: host without port (group 1), e.g. 'www.ex.com'
HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^:/?#]*)"
#: path including leading '/', '' when absent (group 1)
PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
#: query string without '?' (group 1): from the FIRST '?' *before* any
#: '#' up to the fragment. Anchoring the pre-'?' span to `[^#?]*` means
#: (a) a '?' inside a fragment is NOT misparsed as a query
#: ('https://ex.com/page#sec?x=1' has no query), and (b) a second '?'
#: belongs to the query per RFC 3986 ('a?b?c#d' -> 'b?c').
QUERY_RE = r"^[^#?]*\?([^#]*)"
#: query params that are tracking noise, dropped by url_normalize
TRACKING_RE = r"^(utm_[a-zA-Z]+|fbclid|gclid|msclkid|mc_eid|igshid)="
#: last two / last three dot-labels of a host (group 1)
#: last-N-labels extractors, BOUNDED at RFC 1035's 63-octet label
#: limit (r17 ReDoS review, measured in Spark's Java regex before
#: fixing: the unbounded `[^.]+\.[^.]+$` form retries at every start
#: position of a dotless host, O(n^2) — 20s for ONE crafted 80 KB
#: host, ~50 min at 1 MB, and the host string comes straight from
#: hostile page links via url_host). With the bound, per-start work
#: is <= ~130 chars -> linear. Real hosts are unaffected (no
#: deliverable DNS label exceeds 63 octets); a degenerate >63-char
#: label matches only its LAST 63 chars (the start is unanchored —
#: an RE2-incompatible lookbehind is not available to the DuckDB
#: twin), so the extracted domain is the truncated tail of such a
#: host. Deterministic, and only non-deliverable hosts differ. The
#: DuckDB twins embed these SAME constants, so the oracle cannot
#: drift.
LAST2_RE = r"([^.]{1,63}\.[^.]{1,63})$"
LAST3_RE = r"([^.]{1,63}\.[^.]{1,63}\.[^.]{1,63})$"

#: href starts with a scheme ('https:', 'mailto:', ...) -> already absolute
HREF_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*:"
#: scheme://authority of a base URL (group 1), port and userinfo kept
ORIGIN_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
#: dirname-with-slash of a path: everything through the LAST '/'
#: (group 1; no match -> '' for a slashless path). ANCHORED on
#: purpose (r17 ReDoS review, measured): the old unanchored
#: ``[^/]*$`` replace retried at every start of a long final
#: segment — O(n^2), 28 s for one crafted 80 KB path — while this
#: single-start greedy backtrack is linear. ``(?s)`` so a hostile
#: path containing newlines cannot split the match (``.`` excludes
#: them by default in BOTH Java and RE2, so the twin agrees).
DIRPATH_RE = r"(?s)^(.*/)"
#: base URL up to (not including) the first '?' or '#' (group 1)
PREQUERY_RE = r"^([^?#]*)"
#: base URL up to (not including) the first '#' (group 1)
PREFRAG_RE = r"^([^#]*)"

#: multi-part public suffixes where the registrable domain is 3 labels
MULTIPART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.sg", "com.tr", "co.za", "com.ar", "co.nz",
)


def url_scheme(url: Column) -> Column:
    """Lower-cased scheme; '' when the URL has none."""
    return F.lower(F.regexp_extract(url, SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lower-cased host without port or userinfo; '' when unparseable."""
    return F.lower(F.regexp_extract(url, HOST_RE, 1))


def url_path(url: Column) -> Column:
    """Path including its leading '/'; '' when the URL stops at host."""
    return F.regexp_extract(url, PATH_RE, 1)


def url_query(url: Column) -> Column:
    """Raw query string (no '?'), '' when absent."""
    return F.regexp_extract(url, QUERY_RE, 1)


def url_path_depth(url: Column) -> Column:
    """Number of non-empty path segments ('/a//b/' -> 2)."""
    return F.size(F.filter(F.split(url_path(url), "/"), lambda x: x != ""))


def registrable_domain(host: Column, extra_suffixes: tuple[str, ...] = ()) -> Column:
    """eTLD+1 heuristic: last two labels, or last three when the last
    two are a known multi-part suffix (co.uk etc.). Single-label hosts
    (localhost, bare IP-less names) pass through unchanged. Input is
    expected lower-case (compose with ``url_host``)."""
    suffixes = MULTIPART_SUFFIXES + tuple(extra_suffixes)
    last2 = F.regexp_extract(host, LAST2_RE, 1)
    last3 = F.regexp_extract(host, LAST3_RE, 1)
    return (
        F.when(last2 == "", host)
        .when(last2.isin(*suffixes) & (last3 != ""), last3)
        .otherwise(last2)
    )


def clean_query(query: Column) -> Column:
    """Drop tracking params and empty segments from a query string."""
    return F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda x: (x != "") & ~x.rlike(TRACKING_RE),
        ),
        "&",
    )


def url_normalize(url: Column) -> Column:
    """Canonical form for URL-level dedup: lower-case scheme+host,
    default port stripped (:80 for http, :443 for https), fragment
    dropped, tracking params and empty query segments removed, empty
    path -> '/'. Purely syntactic — no DNS, no redirects."""
    scheme = url_scheme(url)
    hostport = F.lower(F.regexp_extract(url, HOSTPORT_RE, 1))
    host_n = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = url_path(url)
    path_n = F.when(path == "", "/").otherwise(path)
    q_n = clean_query(url_query(url))
    return F.concat(
        scheme, F.lit("://"), host_n, path_n,
        F.when(q_n == "", "").otherwise(F.concat(F.lit("?"), q_n)),
    )


def resolve_url(base: Column, href: Column) -> Column:
    """RFC 3986 reference resolution, the subset an HTML link
    extractor needs (round 11, link-graph leg): scheme'd hrefs pass
    through, ``//host/p`` inherits the base scheme, ``/p`` is
    origin-relative, ``?q`` replaces the base query, ``#f`` / ''
    resolve to the base sans fragment, anything else is
    dirname-relative. Dot segments ('../', './') are NOT collapsed —
    documented out of scope (the normalized URL still dedups
    consistently because both spellings resolve identically). Pure
    codegen; twin: ``resolve_sql``."""
    origin = F.regexp_extract(base, ORIGIN_RE, 1)
    dirpath = F.regexp_extract(url_path(base), DIRPATH_RE, 1)
    dirpath = F.when(dirpath == "", "/").otherwise(dirpath)
    return (
        F.when(href.rlike(HREF_SCHEME_RE), href)
        .when(href.startswith("//"), F.concat(url_scheme(base), F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
        .when(href.startswith("?"), F.concat(F.regexp_extract(base, PREQUERY_RE, 1), href))
        .when((href == "") | href.startswith("#"), F.regexp_extract(base, PREFRAG_RE, 1))
        .otherwise(F.concat(origin, dirpath, href))
    )


def surt_key(url: Column) -> Column:
    """SURT urlkey (Sort-friendly URI Reordering Transform — the
    Common-Crawl cc-index key shape our ``sources/cdx.py`` reader
    consumes): host labels reversed and comma-joined, then ``)`` +
    lower-cased path ('/' when empty) + the query with params SORTED
    (byte order), tracking params and empty segments dropped.

    'https://WWW.Ex.COM:443/A/b?z=1&a=2' -> 'com,ex,www)/a/b?a=2&z=1'

    Subset, stated honestly: no %-encoding canonicalization and no
    www-stripping (pywb's default rules differ between tools; the key
    only has to be CONSISTENT between index writer and reader, which
    sharing this one expression guarantees). Twin: ``surt_sql``."""
    host = url_host(url)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.lower(url_path(url))
    path_n = F.when(path == "", "/").otherwise(path)
    q = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.lower(url_query(url)), "&"),
                lambda x: (x != "") & ~x.rlike(TRACKING_RE),
            )
        ),
        "&",
    )
    return F.concat(
        rev, F.lit(")"), path_n,
        F.when(q == "", "").otherwise(F.concat(F.lit("?"), q)),
    )


# --- DuckDB twins (oracle side; same constants, same semantics) ----------


def host_sql(e: str) -> str:
    return f"lower(regexp_extract({e}, '{HOST_RE}', 1))"


def path_sql(e: str) -> str:
    return f"regexp_extract({e}, '{PATH_RE}', 1)"


def depth_sql(e: str) -> str:
    return (
        f"len(list_filter(string_split({path_sql(e)}, '/'), x -> x <> ''))"
    )


def domain_sql(host_e: str) -> str:
    in_list = ", ".join(f"'{s}'" for s in MULTIPART_SUFFIXES)
    last2 = f"regexp_extract({host_e}, '{LAST2_RE}', 1)"
    last3 = f"regexp_extract({host_e}, '{LAST3_RE}', 1)"
    return (
        f"CASE WHEN {last2} = '' THEN {host_e} "
        f"WHEN {last2} IN ({in_list}) AND {last3} <> '' THEN {last3} "
        f"ELSE {last2} END"
    )


def resolve_sql(base_e: str, href_e: str) -> str:
    """Twin of ``resolve_url`` (same constants, same branch order)."""
    scheme = f"lower(regexp_extract({base_e}, '{SCHEME_RE}', 1))"
    origin = f"regexp_extract({base_e}, '{ORIGIN_RE}', 1)"
    path = path_sql(base_e)
    dirp = f"regexp_extract({path}, '{DIRPATH_RE}', 1)"
    dirp = f"CASE WHEN {dirp} = '' THEN '/' ELSE {dirp} END"
    return (
        f"CASE WHEN regexp_matches({href_e}, '{HREF_SCHEME_RE}') THEN {href_e} "
        f"WHEN starts_with({href_e}, '//') THEN {scheme} || ':' || {href_e} "
        f"WHEN starts_with({href_e}, '/') THEN {origin} || {href_e} "
        f"WHEN starts_with({href_e}, '?') THEN regexp_extract({base_e}, '{PREQUERY_RE}', 1) || {href_e} "
        f"WHEN {href_e} = '' OR starts_with({href_e}, '#') THEN regexp_extract({base_e}, '{PREFRAG_RE}', 1) "
        f"ELSE {origin} || {dirp} || {href_e} END"
    )


def surt_sql(e: str) -> str:
    """Twin of ``surt_key`` (same constants, same branch order)."""
    host = host_sql(e)
    rev = f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    path = f"lower({path_sql(e)})"
    path_n = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    query = f"lower(regexp_extract({e}, '{QUERY_RE}', 1))"
    q = (
        f"coalesce(array_to_string(list_sort(list_filter("
        f"string_split({query}, '&'), "
        f"x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_RE}'))), '&'), '')"
    )
    return (
        f"{rev} || ')' || {path_n} || "
        f"CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END"
    )


def normalize_sql(e: str) -> str:
    scheme = f"lower(regexp_extract({e}, '{SCHEME_RE}', 1))"
    hostport = f"lower(regexp_extract({e}, '{HOSTPORT_RE}', 1))"
    host_n = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END"
    )
    path = path_sql(e)
    path_n = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    query = f"regexp_extract({e}, '{QUERY_RE}', 1)"
    # DuckDB's array_to_string returns NULL on an empty list (Spark's
    # array_join returns ''); coalesce keeps the twins identical.
    q_n = (
        f"coalesce(array_to_string(list_filter(string_split({query}, '&'), "
        f"x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_RE}')), '&'), '')"
    )
    return (
        f"{scheme} || '://' || {host_n} || {path_n} || "
        f"CASE WHEN {q_n} = '' THEN '' ELSE '?' || {q_n} END"
    )
