"""Crawl-curation queries (round 10): URL parsing/normalization,
URL-level dedup, per-domain caps, domain blocklists — the WARC
source's record-selection pass, oracle-checked.

The fixture tables carry no URL column, so each query synthesizes an
adversarial URL per document from ``doc_id`` with ONE SQL fragment
(``_SYNTH``) evaluated verbatim by both engines (Spark ``F.expr`` and
the DuckDB oracle) — uppercase schemes/hosts, default ports, userinfo,
fragments, tracking params in first/middle position, empty query
segments, multi-part suffixes, hostless paths. What's under test is
``functions/urls.py`` (Spark Column exprs vs their ``*_sql`` DuckDB
twins, generated from the same pattern constants) and the
``operators/crawl.py`` window/anti-join plans on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.functions import quality as Q
from data_ingestion_tool_bakasura__spark.functions import urls as U
from data_ingestion_tool_bakasura__spark.operators import crawl as C
from data_ingestion_tool_bakasura__spark.sources.readers import load_table

ORACLE: dict[str, str] = {}

_D = "CAST(doc_id % 13 AS STRING)"
_I = "CAST(doc_id AS STRING)"

#: one URL per document; identical text runs under Spark SQL and DuckDB.
#: Branch 2 varies only the fbclid with doc_id, so all branch-2 docs
#: sharing doc_id%13 normalize to the SAME URL (the dedup fixture).
_SYNTH = f"""CASE CAST(doc_id % 7 AS INT)
  WHEN 0 THEN 'HTTPS://WWW.Example' || {_D} || '.COM:443/articles/' || {_I} || '/index.html?utm_source=feed&id=' || {_I} || '#top'
  WHEN 1 THEN 'http://news.site' || {_D} || '.co.uk:80/politics/' || {_I} || '?utm_campaign=x&utm_medium=y'
  WHEN 2 THEN 'https://blog.example' || {_D} || '.com/posts/' || {_D} || '?id=' || {_D} || '&fbclid=a' || {_I}
  WHEN 3 THEN 'http://example' || {_D} || '.com'
  WHEN 4 THEN 'https://user:pw@files.example' || {_D} || '.net/dl//' || {_I} || '/?'
  WHEN 5 THEN 'https://Example' || {_D} || '.Co.Uk/a/b/c?x=1&&y=2&gclid=z#frag'
  ELSE 'https://cdn.example' || {_D} || '.com/img/' || {_I} || '.png?v=2'
END"""

_HOST = U.host_sql(f"({_SYNTH})")
_DOMAIN = U.domain_sql(f"({_HOST})")
_NORM = U.normalize_sql(f"({_SYNTH})")
_DEPTH = U.depth_sql(f"({_SYNTH})")


def _with_url(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "documents")
        .select("doc_id")
        .withColumn("url", F.expr(_SYNTH))
    )


# --- URL parsing + normalization ------------------------------------------

def q_url_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Every urls.py op over every adversarial branch, row by row."""
    d = _with_url(spark, sf)
    host = U.url_host(F.col("url"))
    return d.select(
        "doc_id",
        "url",
        host.alias("host"),
        U.registrable_domain(host).alias("domain"),
        U.url_path_depth(F.col("url")).alias("depth"),
        U.url_normalize(F.col("url")).alias("norm_url"),
    ).orderBy("doc_id")


ORACLE["q_url_normalize"] = f"""
SELECT doc_id, ({_SYNTH}) AS url, ({_HOST}) AS host, ({_DOMAIN}) AS domain,
       CAST(({_DEPTH}) AS INT) AS depth, ({_NORM}) AS norm_url
FROM documents ORDER BY doc_id
"""


# --- URL-level dedup -------------------------------------------------------

def q_url_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Keep-lowest-doc_id per normalized URL: branch-2 docs collapse to
    one survivor per doc_id%13; every other branch is unique."""
    return (
        C.url_dedup(_with_url(spark, sf), "url", order_col="doc_id")
        .select("doc_id", "norm_url")
        .orderBy("doc_id")
    )


ORACLE["q_url_dedup"] = f"""
SELECT doc_id, norm_url FROM (
  SELECT doc_id, ({_NORM}) AS norm_url,
         row_number() OVER (PARTITION BY ({_NORM}) ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1 ORDER BY doc_id
"""


# --- per-domain cap --------------------------------------------------------

def q_domain_cap(spark: SparkSession, sf: str) -> DataFrame:
    """At most 5 docs per registrable domain, lowest doc_id first."""
    return (
        C.domain_cap(_with_url(spark, sf), "url", max_per_domain=5, order_col="doc_id")
        .select("doc_id", "domain")
        .orderBy("doc_id")
    )


ORACLE["q_domain_cap"] = f"""
SELECT doc_id, domain FROM (
  SELECT doc_id, ({_DOMAIN}) AS domain,
         row_number() OVER (PARTITION BY ({_DOMAIN}) ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn <= 5 ORDER BY doc_id
"""


# --- domain blocklist ------------------------------------------------------

_BLOCKED = ("example3.com", "site5.co.uk", "example7.co.uk")


def q_domain_blocklist(spark: SparkSession, sf: str) -> DataFrame:
    """Broadcast anti-join on registrable domain (blocking example3.com
    also drops www./blog./cdn. subdomain rows), then a per-domain
    count so the oracle pins the whole survivor set compactly."""
    kept = C.domain_blocklist_filter(_with_url(spark, sf), _BLOCKED, "url")
    return (
        kept.withColumn("domain", U.registrable_domain(U.url_host(F.col("url"))))
        .groupBy("domain")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("domain")
    )


ORACLE["q_domain_blocklist"] = f"""
SELECT domain, count(*) AS n_docs FROM (
  SELECT ({_DOMAIN}) AS domain FROM documents
) WHERE domain NOT IN ({", ".join(f"'{b}'" for b in _BLOCKED)})
GROUP BY domain ORDER BY domain
"""


# --- composed crawl pipeline (one lazy plan, single oracle) ----------------

_SW = "('the','a','of','and','to','in','is','for','on','with')"
_Q_TOKS = "regexp_split_to_array(trim(text), '\\s+')"
#: DuckDB twin of textstats.quality_score (same fragment as the
#: q_token_budget oracle in curation_q)
_QUALITY = f"""round(0.5 * least(length(text) / 1000.0, 1.0)
  + 0.5 * least((CASE WHEN (CASE WHEN text IS NULL OR length(trim(text)) = 0
                            THEN 0 ELSE len({_Q_TOKS}) END) = 0 THEN 0.0
                 ELSE len(list_filter({_Q_TOKS}, x -> lower(x) IN {_SW}))
                      / (CASE WHEN text IS NULL OR length(trim(text)) = 0
                         THEN 1 ELSE len({_Q_TOKS}) END)::DOUBLE END) * 5.0, 1.0)
  - 0.25 * least((CASE WHEN length(text) = 0 THEN 0.0
                  ELSE length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                       / length(text)::DOUBLE END) * 5.0, 1.0), 6)"""


def q_crawl_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The crawl family composed end-to-end in ONE lazy plan: synth URL
    -> URL-level dedup (lowest doc_id survives) -> domain blocklist ->
    3-per-domain cap -> C4-style quality score of each surviving page
    -> per-domain rollup. Mirrors q_curation_pipeline's role: proves
    the operators compose without materialization barriers."""
    from data_ingestion_tool_bakasura__spark.functions import textstats as TS

    docs = (
        load_table(spark, sf, "documents")
        .select("doc_id", "text")
        .withColumn("url", F.expr(_SYNTH))
    )
    kept = C.domain_cap(
        C.domain_blocklist_filter(
            C.url_dedup(docs, "url", order_col="doc_id"), _BLOCKED, "url"
        ),
        "url", max_per_domain=3, order_col="doc_id",
    )
    return (
        kept.select("domain", F.length("text").alias("n_chars"),
                    TS.quality_score("text").alias("quality"))
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
        .orderBy("domain")
    )


ORACLE["q_crawl_pipeline"] = f"""
WITH w AS (
  SELECT doc_id, text, ({_NORM}) AS norm_url, ({_DOMAIN}) AS domain
  FROM documents
), d1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY norm_url ORDER BY doc_id) AS rn
    FROM w
  ) WHERE rn = 1
), d2 AS (
  SELECT * FROM d1
  WHERE domain NOT IN ({", ".join(f"'{b}'" for b in _BLOCKED)})
), d3 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn2
    FROM d2
  ) WHERE rn2 <= 3
)
SELECT domain, count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars,
       round(avg({_QUALITY}), 6) AS avg_quality
FROM d3 GROUP BY domain ORDER BY domain
"""


# --- WET / WAT siblings (round 11): the Common-Crawl formats users ------
# actually consume. The fixture WET/WAT files are DERIVED from the
# documents table by a deterministic driver-side writer (pyarrow footer
# read + byte concat — zero Spark jobs, per-run mkdtemp), so the DuckDB
# oracle can compute the expected result straight from the table: a
# framing/decode bug anywhere in read_wet/read_wat breaks value parity.

_WET_URL = "'https://example' || CAST(doc_id % 13 AS VARCHAR) || '.com/doc/' || CAST(doc_id AS VARCHAR)"

_wet_cache: dict[str, str] = {}


def _wet_wat_fixture(sf: str) -> str:
    """Write WET + WAT twin files for the documents fixture into a
    per-process scratch dir (cached per sf). Every doc becomes one
    ``conversion`` (WET) and one ``metadata`` (WAT) record; docs with
    ``doc_id % 7 == 0`` additionally get a tracking-param URL twin in
    the WET file — url_dedup must collapse it or the oracle's sums
    double-count."""
    import json
    import os
    import tempfile

    import pyarrow.parquet as pq

    if sf in _wet_cache:
        return _wet_cache[sf]
    t = pq.read_table(
        os.path.join(sf, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_pylist()
    out_dir = tempfile.mkdtemp(prefix="wet_fixture_")

    def rec(rtype: str, url: str, rid: str, body: bytes) -> bytes:
        head = (
            f"WARC/1.0\r\nWARC-Type: {rtype}\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        return head + body + b"\r\n\r\n"

    wet = [bytearray(), bytearray()]  # two members: multi-file scan path
    # 8 WAT members: the per-record parse parallelizes per FILE, and a
    # single-member archive serializes the whole scan onto one core
    # (q_pagerank read ~8s single-file vs ~1s sharded at sf0.1)
    wat = [bytearray() for _ in range(8)]
    for row in t:
        d = row["doc_id"]
        url = f"https://example{d % 13}.com/doc/{d}"
        body = (row["text"] or "").encode("utf-8")
        wet[d % 2] += rec("conversion", url, f"wet-{d}", body)
        if d % 7 == 0:
            wet[d % 2] += rec(
                "conversion", url + "?utm_source=feed", f"wet-{d}-dup", body
            )
        # Outlinks (r11 link-graph leg): 1-3 absolute cross-site links,
        # one root-relative self-site link ('next'), plus conditional
        # traps — a protocol-relative CDN link (dangling sink), an
        # UPPER-CASE:443 spelling that normalization must fold, a
        # query-only href, and a mailto: the scheme filter must drop.
        # The oracle re-derives every edge from the documents table
        # with the same arithmetic (doc_id, lang are the only inputs).
        links = [
            {"url": f"https://site{(d * 7 + 13 * k) % 41}.org/p/{(d + k) % 10}",
             "text": f"about {row['lang']} topic {d % 5}"}
            for k in range(1 + d % 3)
        ]
        links.append({"url": f"/doc/{(d + 1) % 97}", "text": "next"})
        if d % 5 == 0:
            links.append({"url": f"//cdn{d % 3}.net/lib.js", "text": "cdn"})
        if d % 11 == 0:
            links.append({"url": "HTTPS://SITE3.ORG:443/x", "text": "caps"})
        if d % 13 == 0:
            links.append({"url": "?page=2", "text": "more"})
            links.append({"url": "mailto:a@b.example", "text": "mail"})
        meta = json.dumps(
            {"lang": row["lang"], "source": row["source"],
             "n_chars": row["n_chars"], "links": links},
            sort_keys=True,
        ).encode()
        wat[d % 8] += rec("metadata", url, f"wat-{d}", meta)
    for i, buf in enumerate(wet):
        with open(os.path.join(out_dir, f"part-{i}.warc.wet"), "wb") as f:
            f.write(bytes(buf))
    for i, buf in enumerate(wat):
        with open(os.path.join(out_dir, f"part-{i}.warc.wat"), "wb") as f:
            f.write(bytes(buf))
    _wet_cache[sf] = out_dir
    return out_dir


def q_wet_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """WET ingestion end-to-end: read_wet (envelope framing + UTF-8
    text roundtrip) -> URL dedup (collapses the planted utm twins;
    survivor = lexicographically-first url) -> 4-per-domain cap
    (ordered by url) -> per-domain rollup of count / char sum. The
    oracle computes the same thing from the documents table directly,
    so any framing, decode, dedup or cap defect breaks parity."""
    from data_ingestion_tool_bakasura__spark.sources.warc import read_wet

    pages = read_wet(spark, _wet_wat_fixture(sf))
    kept = C.domain_cap(
        C.url_dedup(pages, "url", order_col="url"),
        "url", max_per_domain=4, order_col="url",
    )
    return (
        kept.groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("sum_chars"),
        )
        .orderBy("domain")
    )


ORACLE["q_wet_pipeline"] = f"""
WITH w AS (
  SELECT doc_id, text, {_WET_URL} AS url,
         'example' || CAST(doc_id % 13 AS VARCHAR) || '.com' AS domain
  FROM documents
), capped AS (
  SELECT * FROM (
    SELECT domain, text,
           row_number() OVER (PARTITION BY domain ORDER BY url) AS rn
    FROM w
  ) WHERE rn <= 4
)
SELECT domain, count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS sum_chars
FROM capped GROUP BY domain ORDER BY domain
"""


def q_wat_metadata(spark: SparkSession, sf: str) -> DataFrame:
    """WAT ingestion: read_wat -> get_json_object field extraction ->
    per-language facet. Proves the JSON metadata envelope roundtrips
    and the string-JSON column composes with Spark's JSON path ops."""
    from data_ingestion_tool_bakasura__spark.sources.warc import read_wat

    meta = read_wat(spark, _wet_wat_fixture(sf))
    return (
        meta.select(
            F.get_json_object("json", "$.lang").alias("lang"),
            F.get_json_object("json", "$.n_chars").cast("bigint").alias("nc"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nc").cast("bigint").alias("sum_chars"),
        )
        .orderBy("lang")
    )


ORACLE["q_wat_metadata"] = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang ORDER BY lang
"""


# --- robots.txt filtering (r11) -------------------------------------------
# One rule set, two derivations: the Spark side renders actual
# robots.txt BODIES from _ROBOTS_RULES and parses them back through
# parse_robots/robots_rules_df (so the parser is inside the checked
# path); the DuckDB oracle takes the same rules as inline VALUES and
# replays RFC 9309 longest-match-ties-to-allow in SQL.

#: (host-ordinal or None for "every host", pattern, allow)
_ROBOTS_RULES = [
    (None, "/doc/1", False),   # blocks /doc/1*
    (None, "/doc/12", True),   # longer allow wins /doc/12* back
    (3, "/", False),           # example3.com fully disallowed
    (5, "/doc/4", False),      # equal-length tie on example5.com:
    (5, "/doc/4", True),       # allow wins (RFC 9309 least-restrictive)
    # r12 — the full RFC 9309 pattern surface (wildcards + $ anchor):
    (None, "/doc/*9$", False),  # blocks every id ENDING in 9 (len 8)
    (None, "/doc/*99", True),   # ...but ids containing 99 win the tie back
    (6, "/doc/6$", False),      # exactly /doc/6 on example6.com ($ anchor)
    (4, "/doc/*7", False),      # host 4: any id containing a 7
]


def _robots_bodies() -> list[tuple[str, str]]:
    out = []
    for d in range(13):
        lines = ["User-agent: *"]
        for who, prefix, allow in _ROBOTS_RULES:
            if who is None or who == d:
                lines.append(("Allow: " if allow else "Disallow: ") + prefix)
        out.append((f"example{d}.com", "\n".join(lines)))
    return out


def q_robots_filter(spark: SparkSession, sf: str) -> DataFrame:
    """robots.txt gate over the synthesized crawl: bodies -> parsed
    rule table (mapInPandas, once per host) -> broadcast longest-match
    join -> per-host survivor rollup."""
    docs = (
        load_table(spark, sf, "documents")
        .select("doc_id")
        .withColumn("url", F.expr(_WET_URL.replace("VARCHAR", "STRING")))
    )
    robots = spark.createDataFrame(_robots_bodies(), "host string, body string")
    kept = C.robots_filter(docs, C.robots_rules_df(robots), "url")
    return (
        kept.withColumn("host", U.url_host(F.col("url")))
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("sum_ids"),
        )
        .orderBy("host")
    )


def _robots_rules_values() -> str:
    """Inline VALUES mirroring robots_rules_df's output — the regex
    column comes from the SAME robots_pattern_regex translation the
    Spark side uses (shared-constant discipline), and the SAME
    robots_pattern_safe drop the parser applies (r16 — without it a
    future >2-interior-wildcard fixture rule would be enforced by the
    oracle while Spark's parser drops it); prefix_len counts the raw
    pattern's octets, wildcards included."""
    rows = []
    for d in range(13):
        for who, pattern, allow in _ROBOTS_RULES:
            if who is None or who == d:
                if not C.robots_pattern_safe(pattern):
                    continue  # the parser drops it; the twin must too
                rx = C.robots_pattern_regex(pattern)
                rows.append(
                    f"('example{d}.com', '{pattern}', "
                    f"{'true' if allow else 'false'}, {len(pattern)}, "
                    + (f"'{rx}'" if rx is not None else "NULL") + ")"
                )
    return ", ".join(rows)


ORACLE["q_robots_filter"] = f"""
WITH w AS (
  SELECT doc_id,
         'example' || CAST(doc_id % 13 AS VARCHAR) || '.com' AS host,
         '/doc/' || CAST(doc_id AS VARCHAR) AS path
  FROM documents
), r(host, prefix, allow, plen, regex) AS (
  VALUES {_robots_rules_values()}
), j AS (
  SELECT w.doc_id, w.host, r.allow, r.plen
  FROM w LEFT JOIN r ON r.host = w.host AND
    (CASE WHEN r.regex IS NULL THEN starts_with(w.path, r.prefix)
          ELSE length(w.path) <= {C.ROBOTS_REGEX_MATCH_MAX}
               AND regexp_matches(w.path, r.regex) END)
), v AS (
  SELECT doc_id, host,
         (array_agg(allow ORDER BY plen DESC, allow DESC))[1] AS top_allow,
         count(plen) AS n_match
  FROM j GROUP BY doc_id, host
)
SELECT host, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
FROM v WHERE n_match = 0 OR top_allow
GROUP BY host ORDER BY host
"""


# --- C4 line cleaning + Gopher quality rules (round 11) -------------------
# The fixture docs are single-line word streams, so each query
# synthesizes an adversarial multi-line "web page" per document with
# ONE SQL fragment (_PAGE) evaluated verbatim by both engines — nav
# chrome, javascript boilerplate, lorem-ipsum templates, code pages,
# bullet spam, stub pages. What's under test is functions/quality.py
# (Spark Column exprs vs their *_sql DuckDB twins, generated from the
# same rule constants). Zero exchanges: every signal is a map-only
# codegen expression — the shape that survives 100 TB.

_T1 = "substr(text, 1, 200)"
_T2 = "substr(text, 201, 180)"
_PAGE = f"""CASE CAST(doc_id % 6 AS INT)
  WHEN 0 THEN 'Home | About | Contact' || chr(10) || {_T1} || ' and that have with the story.' || chr(10) || 'Please enable javascript to view comments.' || chr(10) || {_T2} || ' to be of use. It was fine. It held up! Did it work? It did.' || chr(10) || 'Read more...'
  WHEN 1 THEN {_T1} || ' and that have with the rest of it.' || chr(10) || 'The method held to be of note. We ran it again. It worked! What next? More runs.'
  WHEN 2 THEN 'Lorem ipsum dolor sit amet. ' || {_T1} || ' and that have with the filler. It ran once. It ran twice! Did it? Yes.'
  WHEN 3 THEN 'function init() {{' || chr(10) || {_T1} || ' and that have with the code. It ran once. It ran twice! Did it? Yes.'
  WHEN 4 THEN '- the first item of note be here.' || chr(10) || '- the second item of note have here.' || chr(10) || '- the third item of note with here.' || chr(10) || '- the fourth item of note and here.' || chr(10) || '- the fifth item of note to here.' || chr(10) || '- the sixth item of note that here.'
  ELSE 'A short stub page here.' || chr(10) || 'Nothing else to see.'
END"""


def _with_page(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "documents").select(
        "doc_id", F.expr(_PAGE).alias("page")
    )


def q_c4_line_clean(spark: SparkSession, sf: str) -> DataFrame:
    """C4-style line cleaning (Raffel et al. 2020): per-page line
    counts before/after the keep-line predicate, sentence count of the
    cleaned page, and the document-level gate (lorem ipsum / code
    brace / min-sentences). Map-only codegen — no exchange until the
    final presentation sort."""
    page = F.col("page")
    return _with_page(spark, sf).select(
        "doc_id",
        Q.c4_line_count(page).cast("bigint").alias("n_lines"),
        Q.c4_kept_line_count(page).cast("bigint").alias("n_kept"),
        Q.sentence_count(Q.c4_clean(page)).cast("bigint").alias("n_sentences"),
        F.md5(Q.c4_clean(page)).alias("clean_md5"),
        Q.c4_doc_keep(page).alias("keep"),
    ).orderBy("doc_id")


_P = f"({_PAGE})"
_CLEAN = Q.c4_clean_sql(_P)
ORACLE["q_c4_line_clean"] = f"""
SELECT doc_id,
       {Q.c4_line_count_sql(_P)} AS n_lines,
       {Q.c4_kept_line_count_sql(_P)} AS n_kept,
       CAST({Q.sentence_count_sql(_CLEAN)} AS BIGINT) AS n_sentences,
       md5({_CLEAN}) AS clean_md5,
       {Q.c4_doc_keep_sql(_P)} AS keep
FROM documents
ORDER BY doc_id
"""


def q_gopher_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher/MassiveText document-quality rules (Rae et al. 2021
    App. A): every signal reported per page plus the combined gate.
    All higher-order-function codegen over one split — the per-page
    cost a 1000-executor crawl pass pays with zero shuffles."""
    page = F.col("page")
    return _with_page(spark, sf).select(
        "doc_id",
        Q.gopher_n_words(page).cast("bigint").alias("n_words"),
        F.round(Q.gopher_mean_word_len(page), 6).alias("mean_word_len"),
        F.round(Q.gopher_alpha_frac(page), 6).alias("alpha_frac"),
        F.round(Q.gopher_symbol_ratio(page), 6).alias("symbol_ratio"),
        F.round(Q.gopher_bullet_frac(page), 6).alias("bullet_frac"),
        F.round(Q.gopher_ellipsis_frac(page), 6).alias("ellipsis_frac"),
        Q.gopher_stopword_hits(page).cast("bigint").alias("stopword_hits"),
        Q.gopher_keep(page).alias("keep"),
    ).orderBy("doc_id")


ORACLE["q_gopher_quality"] = f"""
SELECT doc_id,
       {Q.gopher_n_words_sql(_P)} AS n_words,
       round({Q.gopher_mean_word_len_sql(_P)}, 6) AS mean_word_len,
       round({Q.gopher_alpha_frac_sql(_P)}, 6) AS alpha_frac,
       round({Q.gopher_symbol_ratio_sql(_P)}, 6) AS symbol_ratio,
       round({Q.gopher_bullet_frac_sql(_P)}, 6) AS bullet_frac,
       round({Q.gopher_ellipsis_frac_sql(_P)}, 6) AS ellipsis_frac,
       {Q.gopher_stopword_hits_sql(_P)} AS stopword_hits,
       {Q.gopher_keep_sql(_P)} AS keep
FROM documents
ORDER BY doc_id
"""


def q_web_quality_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """Composed web-quality pass, the C4->Gopher order real pipelines
    use (FineWeb): C4 line cleaning + document gates first, then the
    Gopher rules over the CLEANED text; survivors only. Still one
    map-only stage — both filters fuse into the same codegen span."""
    cleaned = (
        _with_page(spark, sf)
        .filter(Q.c4_doc_keep(F.col("page")))
        .select("doc_id", Q.c4_clean(F.col("page")).alias("clean"))
    )
    c = F.col("clean")
    return (
        cleaned.filter(Q.gopher_keep(c))
        .select(
            "doc_id",
            Q.gopher_n_words(c).cast("bigint").alias("n_words"),
            F.round(Q.gopher_mean_word_len(c), 6).alias("mean_word_len"),
            F.md5(c).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


ORACLE["q_web_quality_pipeline"] = f"""
WITH cleaned AS (
  SELECT doc_id, {_CLEAN} AS clean
  FROM documents
  WHERE {Q.c4_doc_keep_sql(_P)}
)
SELECT doc_id,
       {Q.gopher_n_words_sql('clean')} AS n_words,
       round({Q.gopher_mean_word_len_sql('clean')}, 6) AS mean_word_len,
       md5(clean) AS clean_md5
FROM cleaned
WHERE {Q.gopher_keep_sql('clean')}
ORDER BY doc_id
"""



# --- Gopher repetition rules (round 11, second quality leg) ---------------
# Same synthesized-page trick as the C4/Gopher queries above: one SQL
# fragment (_RPAGE) evaluated verbatim by both engines builds a
# repetition-heavy "web page" per document — duplicated lines,
# duplicated paragraphs, a looping top bigram, self-concatenated text
# (duplicate n-grams) and plain prose. Under test: the Table A1
# repetition signals of functions/quality.py (Spark run-length
# aggregate vs the DuckDB nested-lambda twins, same constants).

_RPAGE = """CASE CAST(doc_id % 5 AS INT)
  WHEN 0 THEN substr(text, 1, 300)
  WHEN 1 THEN substr(text, 1, 80) || chr(10) || 'a fresh middle line sits here' || chr(10) || substr(text, 1, 80) || chr(10) || substr(text, 1, 80)
  WHEN 2 THEN substr(text, 1, 90) || chr(10) || chr(10) || substr(text, 91, 90) || chr(10) || chr(10) || substr(text, 1, 90)
  WHEN 3 THEN repeat('buy now sale today ', 12) || substr(text, 1, 120)
  ELSE substr(text, 1, 70) || ' ' || substr(text, 1, 70) || ' ' || substr(text, 141, 80)
END"""


def q_gopher_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher/MassiveText repetition-removal signals (Rae et al. 2021
    Table A1): duplicated line/paragraph fractions (count + char
    coverage), top-{2,3,4}-gram char coverage, duplicate-{5,8,10}-gram
    char coverage, and the combined gate (which also folds in the
    n=6,7,9 legs). Uses with_gopher_rep_signals — word/gram arrays
    bound ONCE as columns (higher-order exprs are CodegenFallback, so
    unshared expression trees each re-derive the arrays; binding is
    ~17x less work), keep derived from the signal columns. The page
    frame goes through sampling._spread (the tiny-fixture scale-UP
    guard: repartition only when splits < cores — a no-op on a real
    corpus, whose splits already exceed the executor count); after
    that the pass is map-only until the presentation sort."""
    from data_ingestion_tool_bakasura__spark.operators.sampling import _spread

    docs = _spread(
        load_table(spark, sf, "documents").select(
            "doc_id", F.expr(_RPAGE).alias("page")
        )
    )
    sig = Q.with_gopher_rep_signals(docs, "page", keep_col="keep")
    out_cols = [
        "dup_line_frac", "dup_line_char_frac",
        "dup_para_frac", "dup_para_char_frac",
        "top_2gram_frac", "top_3gram_frac", "top_4gram_frac",
        "dup_5gram_frac", "dup_8gram_frac", "dup_10gram_frac",
    ]
    return sig.select(
        "doc_id", *[F.round(F.col(c), 6).alias(c) for c in out_cols], "keep"
    ).orderBy("doc_id")


ORACLE["q_gopher_repetition"] = f"""
WITH pages AS MATERIALIZED (
  SELECT doc_id, ({_RPAGE}) AS page FROM documents
), words AS MATERIALIZED (
  SELECT doc_id, page, {Q.page_words_sql('page')} AS ws FROM pages
), grams AS MATERIALIZED (
  SELECT doc_id, page,
         {", ".join(f"{Q.grams_over_sql('ws', n)} AS g{n}" for n in range(2, 11))}
  FROM words
)
SELECT doc_id,
       round({Q.dup_line_frac_sql('page')}, 6) AS dup_line_frac,
       round({Q.dup_line_char_frac_sql('page')}, 6) AS dup_line_char_frac,
       round({Q.dup_para_frac_sql('page')}, 6) AS dup_para_frac,
       round({Q.dup_para_char_frac_sql('page')}, 6) AS dup_para_char_frac,
       round({Q.top_ngram_over_sql('g2', 'page')}, 6) AS top_2gram_frac,
       round({Q.top_ngram_over_sql('g3', 'page')}, 6) AS top_3gram_frac,
       round({Q.top_ngram_over_sql('g4', 'page')}, 6) AS top_4gram_frac,
       round({Q.dup_ngram_over_sql('g5', 'page')}, 6) AS dup_5gram_frac,
       round({Q.dup_ngram_over_sql('g8', 'page')}, 6) AS dup_8gram_frac,
       round({Q.dup_ngram_over_sql('g10', 'page')}, 6) AS dup_10gram_frac,
       {Q.gopher_rep_keep_over_sql('page', {n: f'g{n}' for n in range(2, 11)})} AS keep
FROM grams ORDER BY doc_id
"""


# --- boilerplate removal / main-content extraction (round 11) ----------

#: per-doc paragraph slice length for the synthesized page (varies by
#: doc so both short- and long-paragraph classification legs fire)
_BP_L = "120 + (doc_id % 5) * 40"

#: static boilerplate blocks of the synthesized page, as the parser
#: must recover them: (order key, text, link_chars). The nav and the
#: related-links <li>s are link-dense (bad); the h1 is short; the
#: footer is short-with-links (bad via jusText's short+link rule,
#: ld 12/63 = 0.19 just under the 0.2 density cut — exercises the
#: rule order).
_BP_STATICS = (
    (0, "Home | About us | Contact", 19),
    (100, "spark merge join guide", 22),
    (101, "batch stream window notes", 25),
    (102, "Copyright 2026 Example Corp. All rights reserved. Terms Privacy", 12),
)

#: fixture-tuned thresholds (passed to BOTH engines through the same
#: kwargs — exercises the threshold plumbing). The module defaults
#: assume prose; the word-soup fixture's stopword-ratio median is
#: ~0.056 and paragraph slices run 120-280 chars, so with the defaults
#: 92% of pages kept NOTHING (every doc empty = a weak value check).
#: These cuts yield a realistic mix: most docs keep 1+ paragraphs,
#: boilerplate still all-bad, and both smoothing directions fire.
_BP_TH = {"stopwords_low": 0.02, "stopwords_high": 0.05, "length_high": 100}


def q_main_content(spark: SparkSession, sf: str) -> DataFrame:
    """Boilerplate removal end-to-end: each document becomes a full
    synthetic page — nav bar, h1, up to four <p> paragraphs sliced
    from the fixture text (length varies by doc), a related-links
    list, a copyright footer — and ``extract_main_content`` must
    recover exactly the content paragraphs (plus smoothing effects)
    while the oracle re-derives every block, density, class and the
    reassembled main text from the RAW fixture text. A parser bug
    (segmentation, link-char accounting, entity decode, whitespace
    collapse) or a classification/smoothing bug anywhere breaks value
    parity on ``main_text`` itself.

    The fixture text is escaped (&, <, >) at synthesis and the parser
    entity-decodes it back, so parity holds for arbitrary text."""
    from data_ingestion_tool_bakasura__spark.functions.boilerplate import (
        extract_main_content,
    )
    from data_ingestion_tool_bakasura__spark.operators.sampling import _spread

    esc = (
        "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'),"
        " '>', '&gt;')"
    )
    paras = " || ".join(
        f"'<p>' || substr({esc}, 1 + {i} * ({_BP_L}), ({_BP_L})) || '</p>'"
        for i in range(4)
    )
    html = (
        "'<html><head><title>t</title><style>p {}</style></head><body>'"
        " || '<div><a href=\"/\">Home</a> | <a href=\"/about\">About us</a>"
        " | <a href=\"/contact\">Contact</a></div>'"
        " || '<h1>Document ' || CAST(doc_id AS STRING) || '</h1>'"
        f" || {paras}"
        " || '<ul><li><a href=\"/r1\">spark merge join guide</a></li>"
        "<li><a href=\"/r2\">batch stream window notes</a></li></ul>'"
        " || '<div>Copyright 2026 Example Corp. All rights reserved."
        " <a href=\"/terms\">Terms</a> <a href=\"/privacy\">Privacy</a>"
        "</div>'"
        " || '</body></html>'"
    )
    docs = _spread(
        load_table(spark, sf, "documents").select(
            "doc_id", F.expr(html).alias("html")
        )
    )
    out = extract_main_content(docs, "html", "doc_id", **_BP_TH)
    return out.select(
        "doc_id",
        "n_blocks",
        "n_good",
        F.length("main_text").cast("bigint").alias("main_chars"),
        "main_text",
    ).orderBy("doc_id")


def _bp_oracle() -> str:
    from data_ingestion_tool_bakasura__spark.functions.boilerplate import (
        ctx_free_class_sql,
    )
    from data_ingestion_tool_bakasura__spark.functions.textstats import (
        STOPWORDS,
    )

    sw_list = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    statics = "\n  UNION ALL ".join(
        f"SELECT doc_id, {ordk} AS ord, '{txt}' AS text, {lc} AS link_chars"
        " FROM docs"
        for ordk, txt, lc in _BP_STATICS
    )
    decided = "CASE WHEN cls_raw IN ('good','bad') THEN cls_raw END"
    return f"""
WITH docs AS (
  SELECT doc_id, text, CAST({_BP_L} AS INT) AS L FROM documents
), paras AS (
  SELECT doc_id, 2 + i AS ord,
         trim(regexp_replace(substr(text, 1 + CAST(i AS INT) * L, L),
                             '\\s+', ' ', 'g')) AS text,
         0 AS link_chars
  FROM docs, unnest(range(0, 4)) AS t(i)
), blocks0 AS (
  {statics}
  UNION ALL SELECT doc_id, 1, 'Document ' || CAST(doc_id AS VARCHAR), 0
  FROM docs
  UNION ALL SELECT doc_id, ord, text, link_chars FROM paras
  WHERE text <> ''
), b AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1
           AS block_idx,
         text, length(text) AS n_chars, link_chars,
         len(list_filter(string_split(text, ' '),
             w -> lower(w) IN ({sw_list})))::DOUBLE
           / len(string_split(text, ' ')) AS sw
  FROM blocks0
), c AS (
  SELECT *,
    {ctx_free_class_sql('n_chars', 'link_chars', 'sw', **_BP_TH)} AS cls_raw
  FROM b
), s AS (
  SELECT *,
    coalesce(last_value({decided} IGNORE NULLS) OVER (
      PARTITION BY doc_id ORDER BY block_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 'bad') AS prv,
    coalesce(last_value({decided} IGNORE NULLS) OVER (
      PARTITION BY doc_id ORDER BY block_idx DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 'bad') AS nxt
  FROM c
), f AS (
  SELECT *, CASE
    WHEN cls_raw IN ('good','bad') THEN cls_raw
    WHEN cls_raw = 'neargood' THEN
      CASE WHEN prv = 'good' OR nxt = 'good' THEN 'good' ELSE 'bad' END
    ELSE CASE WHEN prv = 'good' AND nxt = 'good' THEN 'good' ELSE 'bad' END
  END AS cls FROM s
), g AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(count(*) FILTER (WHERE cls = 'good') AS BIGINT) AS n_good,
         coalesce(string_agg(text, chr(10) ORDER BY block_idx)
                  FILTER (WHERE cls = 'good'), '') AS main_text
  FROM f GROUP BY doc_id
)
SELECT doc_id, n_blocks, n_good,
       CAST(length(main_text) AS BIGINT) AS main_chars, main_text
FROM g ORDER BY doc_id
"""


ORACLE["q_main_content"] = _bp_oracle()


_cdx_cache: dict[str, str] = {}


def _cdx_fixture(sf: str) -> str:
    """Write a CDXJ index derived from the documents table into
    per-process scratch (cached per sf; driver-side pyarrow read +
    text write, zero Spark jobs — the WET-fixture pattern). Per doc:
    one 200 capture; every 4th doc an OLDER duplicate capture (the
    window must keep the newer); every 9th doc a NEWER 404 capture
    (the status filter must run BEFORE the window or it wins,
    corrupting the rollup); two junk lines per file (quarantine)."""
    import json as _json
    import os
    import tempfile

    import pyarrow.parquet as pq

    if sf in _cdx_cache:
        return _cdx_cache[sf]
    t = pq.read_table(
        os.path.join(sf, "documents.parquet"), columns=["doc_id", "n_chars"]
    ).to_pylist()
    out_dir = tempfile.mkdtemp(prefix="cdx_fixture_")

    def line(d, ts, status, length, off_extra=0):
        j = {
            "url": f"https://example{d % 13}.com/doc/{d}",
            "mime": "text/html",
            "status": str(status),
            "digest": f"D{d}-{ts}",
            "length": str(length),
            "offset": str(d * 1000 + off_extra),
            "filename": f"crawl-{d % 3}.warc.gz",
        }
        return f"com,example{d % 13})/doc/{d} {ts} {_json.dumps(j)}"

    buf: list[list[str]] = [[], []]
    for row in t:
        d, n = row["doc_id"], row["n_chars"]
        buf[d % 2].append(line(d, "20260101000000", 200, n + 100))
        if d % 4 == 0:
            buf[d % 2].append(line(d, "20250615000000", 200, n + 50, 7))
        if d % 9 == 0:
            buf[d % 2].append(line(d, "20260701000000", 404, 300, 13))
    for i, lines in enumerate(buf):
        lines.append("junk line that is not cdx")
        lines.append(f"key{i} 20260101000000 {{broken json")
        with open(os.path.join(out_dir, f"part-{i}.cdx"), "w") as f:
            f.write("\n".join(lines) + "\n")
    _cdx_cache[sf] = out_dir
    return out_dir


def q_cdx_fetch_plan(spark: SparkSession, sf: str) -> DataFrame:
    """CDX index front door end-to-end: read_cdx typed parse (codegen
    split + from_json, junk lines quarantined) -> latest_captures
    (status filter BEFORE the per-urlkey recency window — the planted
    newer 404s must lose) -> fetch_plan per-WARC byte-range rollup.
    The oracle recomputes the surviving capture set and the rollup
    straight from the documents table: every planted trap (older
    duplicate capture, newer 404, junk lines) shifts a value if
    mishandled."""
    from data_ingestion_tool_bakasura__spark.sources.cdx import (
        fetch_plan,
        latest_captures,
        read_cdx,
    )

    captures = read_cdx(spark, _cdx_fixture(sf)).filter(
        F.col("url").isNotNull()
    )
    plan = fetch_plan(latest_captures(captures))
    return plan.select(
        "warc_file",
        "n_records",
        "bytes_total",
        F.size("ranges").cast("bigint").alias("n_ranges"),
        F.col("ranges")[0]["offset"].alias("first_offset"),
        F.element_at("ranges", -1)["offset"].alias("last_offset"),
    ).orderBy("warc_file")


ORACLE["q_cdx_fetch_plan"] = """
WITH survivors AS (
  SELECT 'crawl-' || CAST(doc_id % 3 AS VARCHAR) || '.warc.gz' AS warc_file,
         doc_id * 1000 AS "offset",
         n_chars + 100 AS length
  FROM documents
)
SELECT warc_file,
       CAST(count(*) AS BIGINT) AS n_records,
       CAST(sum(length) AS BIGINT) AS bytes_total,
       CAST(count(*) AS BIGINT) AS n_ranges,
       min("offset") AS first_offset,
       max("offset") AS last_offset
FROM survivors GROUP BY warc_file ORDER BY warc_file
"""


_cdx_warc_cache: dict[str, str] = {}


def _cdx_warc_fixture(sf: str) -> str:
    """WARC archives + a CDX index with TRUE byte offsets, derived from
    the documents table (per-process cache, driver-side, zero Spark
    jobs). Every doc gets TWO records in its archive: an OLD revision
    (text + ' OLD', earlier timestamp) and the current one — both
    indexed, so a range fetch that resolves the wrong capture or
    mis-seeks reads ' OLD' text and shifts the value check."""
    import json as _json
    import os
    import tempfile

    import pyarrow.parquet as pq

    if sf in _cdx_warc_cache:
        return _cdx_warc_cache[sf]
    t = pq.read_table(
        os.path.join(sf, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pylist()
    out_dir = tempfile.mkdtemp(prefix="cdx_warc_fixture_")
    bufs = [bytearray(), bytearray(), bytearray()]
    cdx: list[str] = []

    def rec(uri, text, rid):
        body = text.encode("utf-8")
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        return head + http + b"\r\n\r\n"

    for row in t:
        d, text = row["doc_id"], row["text"] or ""
        fno = d % 3
        uri = f"https://example{d % 13}.com/doc/{d}"
        for ts, body_text, tag in (
            ("20250615000000", text + " OLD", "old"),
            ("20260101000000", text, "new"),
        ):
            raw = rec(uri, body_text, f"{tag}-{d}")
            off = len(bufs[fno])
            bufs[fno] += raw
            cdx.append(
                f"com,example{d % 13})/doc/{d} {ts} " + _json.dumps({
                    "url": uri, "mime": "text/plain", "status": "200",
                    "digest": f"{tag}{d}", "length": str(len(raw)),
                    "offset": str(off),
                    "filename": f"crawl-{fno}.warc",
                })
            )
    for i, b in enumerate(bufs):
        with open(os.path.join(out_dir, f"crawl-{i}.warc"), "wb") as f:
            f.write(bytes(b))
    with open(os.path.join(out_dir, "index.cdx"), "w") as f:
        f.write("\n".join(cdx) + "\n")
    _cdx_warc_cache[sf] = out_dir
    return out_dir


def q_cdx_range_fetch(spark: SparkSession, sf: str) -> DataFrame:
    """The full index-first crawl read: CDX parse -> latest-capture
    window -> per-WARC fetch plan -> ``read_warc_ranges`` byte-range
    fetch — only the planned slices of the archives are read and
    parsed. Each doc has an indexed OLD revision in the same archive,
    so the fetched payload length equals the fixture ``n_chars`` ONLY
    if the recency window picked the current capture AND the seek
    landed exactly on its record; the oracle is the documents table
    itself."""
    from data_ingestion_tool_bakasura__spark.sources.cdx import (
        fetch_plan,
        latest_captures,
        read_cdx,
        read_warc_ranges,
    )

    d = _cdx_warc_fixture(sf)
    captures = read_cdx(spark, d + "/index.cdx").filter(
        F.col("url").isNotNull()
    )
    recs = read_warc_ranges(fetch_plan(latest_captures(captures)), d)
    return recs.select(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long")
        .alias("doc_id"),
        F.length(F.decode("payload", "UTF-8")).cast("bigint")
        .alias("n_chars_fetched"),
        F.col("http_status").cast("int").alias("http_status"),
    ).orderBy("doc_id")


ORACLE["q_cdx_range_fetch"] = """
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars_fetched,
       200 AS http_status
FROM documents ORDER BY doc_id
"""


_bloom_cache: dict[str, str] = {}


def q_bloom_url_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom seen-set guard end-to-end (operators/bloom.py): the
    even-doc_id docs' normalized URLs are the landed corpus, persisted
    as a Bloom bitmap in per-run scratch (cached per process) with a
    DELIBERATELY small m so false positives fire at every scale —
    saturating at the larger fixtures, where every row routes through
    the exact check. The probe of ALL docs through ``guard_anti_join``
    (map-only bitmap probe -> broadcast-reversed exact check of the
    maybe-seen minority) must EXACTLY equal the plain anti-join the
    oracle computes: FPs may only cost work, never rows. Note the
    _SYNTH twin URLs: odd docs sharing a norm_url with an even doc are
    dropped too."""
    from data_ingestion_tool_bakasura__spark.operators.bloom import (
        BloomSeenSet,
    )

    docs = (
        load_table(spark, sf, "documents")
        .select("doc_id")
        .withColumn("norm_url", U.url_normalize(F.expr(_SYNTH)))
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0).select("norm_url")
    if sf not in _bloom_cache:
        import tempfile

        path = tempfile.mkdtemp(prefix="bloom_q_") + "/bl"
        b = BloomSeenSet.create(spark, path, m=8192, k=3)
        b.add_df(corpus, "norm_url")
        _bloom_cache[sf] = path
    bloom = BloomSeenSet.load(spark, _bloom_cache[sf])
    return bloom.guard_anti_join(
        docs, "norm_url", corpus
    ).orderBy("doc_id")


ORACLE["q_bloom_url_dedup"] = f"""
WITH w AS (
  SELECT doc_id, ({_NORM}) AS norm_url FROM documents
)
SELECT doc_id, norm_url FROM w
WHERE norm_url NOT IN (SELECT norm_url FROM w WHERE doc_id % 2 = 0)
ORDER BY doc_id
"""


def q_html_meta(spark: SparkSession, sf: str) -> DataFrame:
    """HTML page-metadata extraction (functions/htmlmeta.py): each
    document becomes a head section with a whitespace-padded title
    (collapse under test), description/og:description present only for
    some docs (NULL legs), a duplicate <title> and a duplicate
    og:title later in the head (first-occurrence-wins under test), a
    canonical link and an html lang attribute. The oracle recomputes
    every field straight from the fixture columns — a parser bug in
    attribute handling, entity decode, first-wins ordering or title
    collapse breaks value parity. Map-only plan: one Arrow UDF pass +
    Project, no exchange before the presentation sort."""
    from data_ingestion_tool_bakasura__spark.functions.htmlmeta import (
        META_FIELDS,
        with_html_meta,
    )

    esc40 = ("replace(replace(replace(substr(text, 1, 40), '&', '&amp;'),"
             " '<', '&lt;'), '>', '&gt;')")
    i = "CAST(doc_id AS STRING)"
    html = (
        f"'<html lang=\"' || lang || '\"><head>'"
        f" || '<title>  Doc ' || {i} || ':  ' || {esc40} || ' </title>'"
        f" || CASE WHEN doc_id % 5 = 0 THEN '' ELSE"
        f" '<meta name=\"description\" content=\"' || source ||"
        f" ' document ' || {i} || '\">' END"
        f" || '<meta property=\"og:title\" content=\"OG Doc ' || {i} || '\">'"
        f" || CASE WHEN doc_id % 3 = 0 THEN"
        f" '<meta property=\"og:description\" content=\"og desc ' || {i} ||"
        f" '\">' ELSE '' END"
        f" || '<meta property=\"og:image\" content=\"https://img.example/'"
        f" || {i} || '.png\">'"
        f" || '<link rel=\"canonical\" href=\"https://example' ||"
        f" CAST(doc_id % 13 AS STRING) || '.com/doc/' || {i} || '\">'"
        f" || '<title>ignored</title>'"
        f" || '<meta property=\"og:title\" content=\"dup ignored\">'"
        f" || '</head><body><p>body</p></body></html>'"
    )
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "text", "lang", "source"
    ).withColumn("html", F.expr(html))
    return (
        with_html_meta(docs.select("doc_id", "html"), "html", prefix="")
        .select("doc_id", *META_FIELDS)
        .orderBy("doc_id")
    )


ORACLE["q_html_meta"] = """
SELECT doc_id,
       trim(regexp_replace(
         'Doc ' || CAST(doc_id AS VARCHAR) || ': ' || substr(text, 1, 40),
         '\\s+', ' ', 'g')) AS title,
       CASE WHEN doc_id % 5 = 0 THEN NULL
            ELSE source || ' document ' || CAST(doc_id AS VARCHAR) END
         AS description,
       'OG Doc ' || CAST(doc_id AS VARCHAR) AS og_title,
       CASE WHEN doc_id % 3 = 0 THEN 'og desc ' || CAST(doc_id AS VARCHAR)
            ELSE NULL END AS og_description,
       'https://img.example/' || CAST(doc_id AS VARCHAR) || '.png'
         AS og_image,
       'https://example' || CAST(doc_id % 13 AS VARCHAR) || '.com/doc/' ||
         CAST(doc_id AS VARCHAR) AS canonical,
       lang
FROM documents ORDER BY doc_id
"""


# --- link graph / PageRank (r11, operators/linkgraph.py) ------------------
# The WAT fixture's links arrays are pure arithmetic over (doc_id,
# lang) — see _wet_wat_fixture — so the oracle re-derives every edge
# from the documents table. _links_sql is the single source for the
# link-row derivation shared by all three oracles.

_SRC_DOM = "'example' || CAST(doc_id % 13 AS VARCHAR) || '.com'"


def _links_sql(include_self: bool) -> str:
    """UNION ALL of the fixture's link rows as (src, dst, anchor_text).
    ``include_self`` adds the root-relative 'next' and query-only
    'more' links (self-loops at domain level — host_graph drops them,
    anchor aggregation keeps them). The mailto: row is never emitted
    (the scheme filter drops it on the Spark side)."""
    kl = (
        f"SELECT {_SRC_DOM} AS src, "
        f"'site' || CAST((doc_id * 7 + 13 * k.k) % 41 AS VARCHAR) || '.org' AS dst, "
        f"'about ' || lang || ' topic ' || CAST(doc_id % 5 AS VARCHAR) AS anchor_text "
        f"FROM documents CROSS JOIN (VALUES (0), (1), (2)) AS k(k) "
        f"WHERE k.k < 1 + doc_id % 3"
    )
    cdn = (
        f"SELECT {_SRC_DOM} AS src, "
        f"'cdn' || CAST(doc_id % 3 AS VARCHAR) || '.net' AS dst, "
        f"'cdn' AS anchor_text FROM documents WHERE doc_id % 5 = 0"
    )
    caps = (
        f"SELECT {_SRC_DOM} AS src, 'site3.org' AS dst, "
        f"'caps' AS anchor_text FROM documents WHERE doc_id % 11 = 0"
    )
    parts = [kl, cdn, caps]
    if include_self:
        parts.append(
            f"SELECT {_SRC_DOM} AS src, {_SRC_DOM} AS dst, "
            f"'next' AS anchor_text FROM documents"
        )
        parts.append(
            f"SELECT {_SRC_DOM} AS src, {_SRC_DOM} AS dst, "
            f"'more' AS anchor_text FROM documents WHERE doc_id % 13 = 0"
        )
    return " UNION ALL ".join(parts)


def q_link_graph(spark: SparkSession, sf: str) -> DataFrame:
    """WAT -> outlink extraction (JSON path + explode + RFC 3986
    resolution, all codegen) -> weighted host-level edge list.
    Resolution defects (protocol-relative, UPPER-CASE:443 folding),
    a missed mailto: filter or a surviving self-loop all break
    parity."""
    from data_ingestion_tool_bakasura__spark.operators import linkgraph as L
    from data_ingestion_tool_bakasura__spark.sources.warc import read_wat

    links = L.extract_links(read_wat(spark, _wet_wat_fixture(sf)))
    return L.host_graph(links).orderBy("src", "dst")


ORACLE["q_link_graph"] = f"""
SELECT src, dst, count(*) AS n_links
FROM ({_links_sql(include_self=False)})
GROUP BY src, dst ORDER BY src, dst
"""


def q_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-sweep weighted PageRank over the host graph (3 synchronous
    iterations, damping 0.85, dangling mass redistributed uniformly) —
    the Common-Crawl host-ranking artifact. The oracle unrolls the
    identical arithmetic in SQL (pagerank_sql, generated from the SAME
    constants), so a wrong transition weight, a lost dangling term or
    an extra/missing node shifts values past the 6-dp gate."""
    from data_ingestion_tool_bakasura__spark.operators import linkgraph as L
    from data_ingestion_tool_bakasura__spark.sources.warc import read_wat

    links = L.extract_links(read_wat(spark, _wet_wat_fixture(sf)))
    edges = L.host_graph(links)
    return L.pagerank(
        edges, weight_col="n_links", iterations=3, damping=0.85
    ).orderBy("node")


def _pagerank_oracle() -> str:
    from data_ingestion_tool_bakasura__spark.operators.linkgraph import (
        pagerank_sql,
    )

    edges = (
        f"SELECT src, dst, count(*) AS n_links "
        f"FROM ({_links_sql(include_self=False)}) "
        f"WHERE src <> dst GROUP BY src, dst"
    )
    return (
        pagerank_sql(edges, iterations=3, damping=0.85, weight_e="n_links")
        + " ORDER BY node"
    )


ORACLE["q_pagerank"] = _pagerank_oracle()


def q_anchor_text(spark: SparkSession, sf: str) -> DataFrame:
    """Anchor-text aggregation per target domain (the classic
    target-page enrichment signal). Self-site links are KEPT here —
    'next'/'more' rows land on the page's own domain, so a broken
    root-relative or query-only resolution changes the counts."""
    from data_ingestion_tool_bakasura__spark.operators import linkgraph as L
    from data_ingestion_tool_bakasura__spark.sources.warc import read_wat

    links = L.extract_links(read_wat(spark, _wet_wat_fixture(sf)))
    return (
        links.select(
            U.registrable_domain(U.url_host(F.col("link_url"))).alias("dst"),
            "anchor_text",
        )
        .groupBy("dst", "anchor_text")
        .agg(F.count("*").alias("n"))
        .orderBy("dst", "anchor_text")
    )


ORACLE["q_anchor_text"] = f"""
SELECT dst, anchor_text, count(*) AS n
FROM ({_links_sql(include_self=True)})
GROUP BY dst, anchor_text ORDER BY dst, anchor_text
"""


def _link_urls_sql() -> str:
    """URL-level twin of the fixture links (the inputs to
    frontier_expand): every resolved+normalized link target the Spark
    side derives from the WAT arrays, as pure doc_id/lang arithmetic.
    The caps row is pre-normalized ('HTTPS://SITE3.ORG:443/x' ->
    'https://site3.org/x'); mailto never appears (scheme filter)."""
    kl = (
        "SELECT 'https://site' || CAST((doc_id * 7 + 13 * k.k) % 41 AS VARCHAR)"
        " || '.org/p/' || CAST((doc_id + k.k) % 10 AS VARCHAR) AS url "
        "FROM documents CROSS JOIN (VALUES (0), (1), (2)) AS k(k) "
        "WHERE k.k < 1 + doc_id % 3"
    )
    nxt = (
        "SELECT 'https://example' || CAST(doc_id % 13 AS VARCHAR)"
        " || '.com/doc/' || CAST((doc_id + 1) % 97 AS VARCHAR) AS url "
        "FROM documents"
    )
    cdn = (
        "SELECT 'https://cdn' || CAST(doc_id % 3 AS VARCHAR)"
        " || '.net/lib.js' AS url FROM documents WHERE doc_id % 5 = 0"
    )
    caps = (
        "SELECT 'https://site3.org/x' AS url FROM documents "
        "WHERE doc_id % 11 = 0"
    )
    more = (
        "SELECT 'https://example' || CAST(doc_id % 13 AS VARCHAR)"
        " || '.com/doc/' || CAST(doc_id AS VARCHAR) || '?page=2' AS url "
        "FROM documents WHERE doc_id % 13 = 0"
    )
    return " UNION ALL ".join([kl, nxt, cdn, caps, more])


def q_frontier(spark: SparkSession, sf: str) -> DataFrame:
    """The crawl loop's discover step: WAT links -> normalize ->
    anti-join the landed corpus -> in-link-count priority -> 5-per-
    domain politeness cap. Traps: the 'next' links land back inside
    the corpus only when (doc_id+1)%97 has the right residue mod 13
    (a broken anti-join shifts counts); the '?page=2' variant of a
    corpus page must still be NEW (query-bearing URL != landed URL);
    the pre-normalized caps spelling must merge with other site3.org
    in-links."""
    from data_ingestion_tool_bakasura__spark.operators import linkgraph as L
    from data_ingestion_tool_bakasura__spark.sources.warc import read_wat

    links = L.extract_links(read_wat(spark, _wet_wat_fixture(sf)))
    corpus = load_table(spark, sf, "documents").select(
        U.url_normalize(
            F.expr(
                "'https://example' || CAST(doc_id % 13 AS STRING) || "
                "'.com/doc/' || CAST(doc_id AS STRING)"
            )
        ).alias("norm_url")
    )
    return (
        L.frontier_expand(links, corpus, max_per_domain=5)
        .select("norm_url", "domain", "n_inlinks", "rank_in_domain")
        .orderBy("domain", "rank_in_domain", "norm_url")
    )


_FRONT_DOM = U.domain_sql(U.host_sql("norm_url"))

ORACLE["q_frontier"] = f"""
WITH lu AS ({_link_urls_sql()}),
corpus AS (
  SELECT 'https://example' || CAST(doc_id % 13 AS VARCHAR) || '.com/doc/'
         || CAST(doc_id AS VARCHAR) AS norm_url
  FROM documents
),
cand AS (SELECT url AS norm_url, count(*) AS n_inlinks FROM lu GROUP BY url),
new AS (
  SELECT c.norm_url, c.n_inlinks, ({_FRONT_DOM}) AS domain
  FROM cand c WHERE NOT EXISTS (
    SELECT 1 FROM corpus k WHERE k.norm_url = c.norm_url)
),
ranked AS (
  SELECT norm_url, domain, n_inlinks,
         CAST(row_number() OVER (
           PARTITION BY domain ORDER BY n_inlinks DESC, norm_url) AS INT)
           AS rank_in_domain
  FROM new
)
SELECT norm_url, domain, n_inlinks, rank_in_domain
FROM ranked WHERE rank_in_domain <= 5
ORDER BY domain, rank_in_domain, norm_url
"""


def q_html_links(spark: SparkSession, sf: str) -> DataFrame:
    """Outlink extraction off RAW HTML (functions/htmlmeta.py
    html_links_py + linkgraph.extract_links_html — no WAT needed):
    each document becomes a page whose anchors carry an entity escape
    (&amp; must decode in anchor text), a root-relative href (resolves
    against the page URL), an hrefless <a> (skipped), a mailto
    (scheme-filtered), and — every 17th doc — a TRUNCATED page whose
    unclosed anchor must still be flushed at EOF. Output: per
    (target domain, anchor text) counts; the oracle re-derives every
    row from doc_id/lang arithmetic."""
    from data_ingestion_tool_bakasura__spark.operators import linkgraph as L

    i = "CAST(doc_id AS STRING)"
    html = (
        f"'<html><body>"
        f"<a href=\"/doc/' || CAST((doc_id + 1) % 97 AS STRING) || '\">next &amp; more</a>"
        f"<p>filler <a>no href</a></p>"
        f"<a href=\"https://site' || CAST(doc_id % 41 AS STRING) ||"
        f" '.org/p\">about  ' || lang || '</a>"
        f"<a href=\"mailto:x@' || {i} || '.example\">mail</a>'"
        f" || CASE WHEN doc_id % 17 = 0 THEN"
        f" '<a href=\"/tail\">tail cut' ELSE '</body></html>' END"
    )
    pages = load_table(spark, sf, "documents").select(
        "doc_id", "lang",
        F.expr(
            "'https://example' || CAST(doc_id % 13 AS STRING) ||"
            " '.com/doc/' || CAST(doc_id AS STRING)"
        ).alias("url"),
        F.expr(html).alias("html"),
    )
    links = L.extract_links_html(pages, "html", "url")
    return (
        links.select(
            U.registrable_domain(U.url_host(F.col("link_url"))).alias("dst"),
            "anchor_text",
        )
        .groupBy("dst", "anchor_text")
        .agg(F.count("*").alias("n"))
        .orderBy("dst", "anchor_text")
    )


ORACLE["q_html_links"] = """
WITH lnk AS (
  SELECT 'example' || CAST(doc_id % 13 AS VARCHAR) || '.com' AS dst,
         'next & more' AS anchor_text
  FROM documents
  UNION ALL
  SELECT 'site' || CAST(doc_id % 41 AS VARCHAR) || '.org' AS dst,
         'about ' || lang AS anchor_text
  FROM documents
  UNION ALL
  SELECT 'example' || CAST(doc_id % 13 AS VARCHAR) || '.com' AS dst,
         'tail cut' AS anchor_text
  FROM documents WHERE doc_id % 17 = 0
)
SELECT dst, anchor_text, count(*) AS n
FROM lnk GROUP BY dst, anchor_text ORDER BY dst, anchor_text
"""


def q_sitemap_seeds(spark: SparkSession, sf: str) -> DataFrame:
    """Sitemap ingestion (operators/crawl.py parse_sitemap /
    sitemap_entries): every 10th doc's sitemap is a <sitemapindex>
    (child sitemaps counted, not crawled as pages), the rest are
    <urlset> files whose plain entry is STALE for odd docs
    (lastmod 2025 — the recency filter must drop it) while a
    tracking-param twin (only for doc_id%3==0) is always fresh and
    must MERGE with the plain entry under URL normalization. Output:
    per-domain fresh-seed count, max lastmod, and child-sitemap
    count. A parser bug (namespace handling, loc whitespace,
    index/urlset telling), a broken lastmod cast or a missed
    normalization shifts the values."""
    from data_ingestion_tool_bakasura__spark.operators.crawl import (
        sitemap_entries,
    )

    d = "CAST(doc_id AS STRING)"
    g = "CAST(doc_id % 13 AS STRING)"
    lm_day = "lpad(CAST(doc_id % 28 + 1 AS STRING), 2, '0')"
    xml = (
        f"CASE WHEN doc_id % 10 = 0 THEN"
        f" '<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"
        f"<sitemap><loc>https://example' || {g} || '.com/sitemap-' || {d} ||"
        f" '.xml</loc></sitemap></sitemapindex>'"
        f" ELSE"
        f" '<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"
        f"<url><loc>  https://example' || {g} || '.com/doc/' || {d} ||"
        f" '  </loc><lastmod>' ||"
        f" CASE WHEN doc_id % 2 = 1 THEN '2025-06-01'"
        f" ELSE '2026-01-' || {lm_day} END || '</lastmod></url>' ||"
        f" CASE WHEN doc_id % 3 = 0 THEN"
        f" '<url><loc>https://example' || {g} || '.com/doc/' || {d} ||"
        f" '?utm_source=map</loc><lastmod>2026-02-01</lastmod></url>'"
        f" ELSE '' END || '</urlset>'"
        f" END"
    )
    maps = load_table(spark, sf, "documents").select(
        F.expr(f"'https://example' || {g} || '.com/sitemap.xml'").alias("url"),
        F.expr(xml).alias("xml"),
    )
    sm = sitemap_entries(maps, "xml", "url")
    dom = U.registrable_domain(U.url_host(F.col("loc")))
    idx = (
        sm.filter(F.col("is_index"))
        .select(dom.alias("domain"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_children"))
    )
    seeds = (
        sm.filter(~F.col("is_index")
                  & (F.col("lastmod") >= F.lit("2026-01-01")))
        .select(U.url_normalize(F.col("loc")).alias("norm_url"),
                dom.alias("domain"), "lastmod")
        .groupBy("domain", "norm_url")
        .agg(F.max("lastmod").alias("lm"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_seeds"), F.max("lm").alias("max_lm"))
    )
    return seeds.join(idx, "domain").orderBy("domain")


ORACLE["q_sitemap_seeds"] = """
SELECT 'example' || CAST(doc_id % 13 AS VARCHAR) || '.com' AS domain,
       count(*) FILTER (WHERE doc_id % 10 <> 0
                        AND (doc_id % 2 = 0 OR doc_id % 3 = 0)) AS n_seeds,
       max(CASE WHEN doc_id % 10 <> 0 AND (doc_id % 2 = 0 OR doc_id % 3 = 0)
            THEN (CASE WHEN doc_id % 3 = 0 THEN TIMESTAMP '2026-02-01'
                  ELSE CAST('2026-01-' ||
                       lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                       AS TIMESTAMP) END)
            END) AS max_lm,
       count(*) FILTER (WHERE doc_id % 10 = 0) AS n_children
FROM documents GROUP BY domain ORDER BY domain
"""


def q_surt_keys(spark: SparkSession, sf: str) -> DataFrame:
    """SURT urlkey generation (the cc-index key our CDX reader
    consumes) over every adversarial URL branch: reversed host labels,
    dropped ports/userinfo/fragments, lower-cased path, sorted
    tracking-stripped query. Spark expr and DuckDB twin are generated
    from the SAME constants (urls.surt_key / surt_sql)."""
    d = _with_url(spark, sf)
    return d.select(
        "doc_id", U.surt_key(F.col("url")).alias("urlkey")
    ).orderBy("doc_id")


ORACLE["q_surt_keys"] = f"""
SELECT doc_id, ({U.surt_sql(f"({_SYNTH})")}) AS urlkey
FROM documents ORDER BY doc_id
"""


def q_warc_render(spark: SparkSession, sf: str) -> DataFrame:
    """WARC write-side render (sources/warc.py warc_record_expr — the
    codegen twin of build_warc_record, which test_sources asserts
    byte-identical for text payloads): every adversarial URL branch
    becomes a spec-framed response record around the document's own
    text, and the oracle re-derives the full record string — both
    Content-Length fields (HTTP block + WARC envelope, octet
    arithmetic), the deterministic <urn:md5:...> record id, and the
    md5 of the rendered record — from the SAME framing constants
    (warc_sql). A framing drift of even one CRLF shifts every hash."""
    from data_ingestion_tool_bakasura__spark.sources.warc import (
        warc_record_expr,
    )

    d = load_table(spark, sf, "documents").select(
        "doc_id", "text",
        F.expr(_SYNTH).alias("url"),
        F.expr(
            "'2026-01-' || lpad(CAST(doc_id % 28 + 1 AS STRING), 2, '0')"
            " || 'T00:00:00Z'"
        ).alias("wdate"),
    )
    rec = warc_record_expr(F.col("url"), F.col("wdate"), F.col("text"))
    return d.select(
        "doc_id",
        F.octet_length(rec).alias("rec_len"),
        F.md5(rec.cast("binary")).alias("rec_md5"),
    ).orderBy("doc_id")


from data_ingestion_tool_bakasura__spark.sources.warc import (  # noqa: E402
    warc_sql as _warc_sql,
)

_WDATE = ("'2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')"
          " || 'T00:00:00Z'")
ORACLE["q_warc_render"] = f"""
SELECT doc_id,
       strlen({_warc_sql(f"({_SYNTH})", f"({_WDATE})", "text")}) AS rec_len,
       md5({_warc_sql(f"({_SYNTH})", f"({_WDATE})", "text")}) AS rec_md5
FROM documents ORDER BY doc_id
"""


_zst_fixture_cache: dict[str, str] = {}


def _warc_zst_fixture(spark: SparkSession, sf: str) -> str:
    """Seekable ``.warc.zst`` archives derived from the documents table
    via ``write_warc(compression='zstd')`` — one compressed member per
    record, the Common Crawl interchange layout. Built once per process
    (cached): the bench's single invocation measures write + read
    together (the full executed Zstandard leg), and the oracle
    harness's single invocation does the same."""
    if sf in _zst_fixture_cache:
        return _zst_fixture_cache[sf]
    import tempfile

    from data_ingestion_tool_bakasura__spark.sources.warc import write_warc

    docs = load_table(spark, sf, "documents").select(
        F.concat(F.lit("https://example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.lit("2026-01-01T00:00:00Z").alias("warc_date"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    out = tempfile.mkdtemp(prefix="warc_zst_fixture_")
    write_warc(docs, out, compression="zstd")
    _zst_fixture_cache[sf] = out
    return out


def q_warc_zst_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """The executed ``.warc.zst`` leg end-to-end (r15 bench pin, r14
    verdict #2): documents -> ``write_warc(compression='zstd')`` ->
    ``read_warc`` over the per-record zstd members (system-libzstd
    shim, RFC 8878 public C API) -> payload char counts, value-checked
    against the documents table itself. Until this round the zstd
    read path had correctness evidence (roundtrip/determinism tests)
    but no pinned perf number, so a decode-path regression was
    invisible to the bench gate."""
    from data_ingestion_tool_bakasura__spark.sources.warc import read_warc

    d = _warc_zst_fixture(spark, sf)
    recs = read_warc(spark, d)
    return recs.select(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long")
        .alias("doc_id"),
        F.length(F.decode("payload", "UTF-8")).cast("bigint")
        .alias("n_chars_rt"),
    ).orderBy("doc_id")


ORACLE["q_warc_zst_roundtrip"] = """
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars_rt
FROM documents ORDER BY doc_id
"""


def q_fetch_schedule(spark: SparkSession, sf: str) -> DataFrame:
    """Politeness scheduling composed over the frontier: the q_frontier
    discover step capped at 5/domain, then ``fetch_schedule`` assigns
    slots at 2 fetches per domain per tick — per-slot-per-domain counts
    prove no domain ever exceeds the rate in any tick.

    r12: synthesized robots.txt bodies declare ``Crawl-delay: 2+k%5``
    for EVEN-numbered site*.org hosts only; they flow through the real
    ``robots_delays_df`` parser into ``fetch_schedule(delays=...,
    tick_seconds=1.5)``, so a delayed host's batches land every
    ceil(delay/1.5) slots while undeclared hosts keep stride 1 — the
    oracle re-derives the stride arithmetic and the per-host delay
    column, proving the schedule honors each host's declared rate."""
    from data_ingestion_tool_bakasura__spark.operators import crawl as CR
    from data_ingestion_tool_bakasura__spark.operators import linkgraph as L
    from data_ingestion_tool_bakasura__spark.sources.warc import read_wat

    links = L.extract_links(read_wat(spark, _wet_wat_fixture(sf)))
    corpus = load_table(spark, sf, "documents").select(
        U.url_normalize(
            F.expr(
                "'https://example' || CAST(doc_id % 13 AS STRING) || "
                "'.com/doc/' || CAST(doc_id AS STRING)"
            )
        ).alias("norm_url")
    )
    robots = spark.range(0, 41).select(
        F.concat(F.lit("site"), F.col("id").cast("string"), F.lit(".org"))
        .alias("host"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(
                F.lit("User-agent: *\nDisallow: /private\nCrawl-delay: "),
                (F.lit(2) + F.col("id") % 5).cast("string"),
            ),
        )
        .otherwise(F.lit("User-agent: *\nDisallow: /private"))
        .alias("body"),
    )
    sched = L.fetch_schedule(
        L.frontier_expand(links, corpus, max_per_domain=5),
        per_slot=2,
        delays=CR.robots_delays_df(robots),
        tick_seconds=1.5,
    )
    return (
        sched.groupBy("slot", "domain")
        .agg(F.count("*").alias("n"),
             F.min("norm_url").alias("first_url"),
             F.max("crawl_delay").alias("delay"))
        .orderBy("slot", "domain")
    )


ORACLE["q_fetch_schedule"] = f"""
WITH lu AS ({_link_urls_sql()}),
corpus AS (
  SELECT 'https://example' || CAST(doc_id % 13 AS VARCHAR) || '.com/doc/'
         || CAST(doc_id AS VARCHAR) AS norm_url
  FROM documents
),
cand AS (SELECT url AS norm_url, count(*) AS n_inlinks FROM lu GROUP BY url),
new AS (
  SELECT c.norm_url, c.n_inlinks, ({_FRONT_DOM}) AS domain
  FROM cand c WHERE NOT EXISTS (
    SELECT 1 FROM corpus k WHERE k.norm_url = c.norm_url)
),
ranked AS (
  SELECT norm_url, domain, n_inlinks,
         CAST(row_number() OVER (
           PARTITION BY domain ORDER BY n_inlinks DESC, norm_url) AS INT)
           AS rank_in_domain
  FROM new
),
delayed AS (
  SELECT norm_url, domain, rank_in_domain,
         CASE WHEN regexp_matches(domain, '^site[0-9]+\\.org$')
                   AND CAST(regexp_extract(domain, 'site([0-9]+)', 1) AS INT) % 2 = 0
                   -- bound to the Spark side's robots universe
                   -- (spark.range(0, 41)): a site42+.org even domain in
                   -- the WAT fixture must get NULL delay on BOTH sides
                   AND CAST(regexp_extract(domain, 'site([0-9]+)', 1) AS INT) <= 40
              THEN CAST(2 + CAST(regexp_extract(domain, 'site([0-9]+)', 1) AS INT) % 5
                        AS DOUBLE)
              ELSE NULL END AS crawl_delay
  FROM ranked WHERE rank_in_domain <= 5
)
SELECT CAST(((rank_in_domain - 1) // 2)
            * coalesce(greatest(1, CAST(ceil(crawl_delay / 1.5) AS BIGINT)), 1)
            AS INT) AS slot,
       domain, count(*) AS n, min(norm_url) AS first_url,
       max(crawl_delay) AS delay
FROM delayed
GROUP BY slot, domain ORDER BY slot, domain
"""


def q_canonical_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """<link rel=canonical> folded into URL dedup: every fetch URL
    carries a distinct ?ref= variant (plain url_dedup could never
    merge them), and even docs declare a canonical pointing at doc
    doc_id%50 — so whole groups collapse onto one survivor while odd
    docs (no canonical) stay distinct under their own normalized URL.
    Output: per-domain survivor count + min/max surviving doc_id."""
    from data_ingestion_tool_bakasura__spark.operators.crawl import (
        canonical_dedup,
    )

    g = "CAST(doc_id % 13 AS STRING)"
    d = "CAST(doc_id AS STRING)"
    pages = load_table(spark, sf, "documents").select(
        "doc_id",
        F.expr(
            f"'https://example' || {g} || '.com/doc/' || {d} ||"
            f" '?ref=' || CAST(doc_id % 5 AS STRING)"
        ).alias("url"),
        F.expr(
            f"CASE WHEN doc_id % 2 = 0 THEN"
            f" 'https://example' || CAST(doc_id % 50 % 13 AS STRING) ||"
            f" '.com/doc/' || CAST(doc_id % 50 AS STRING)"
            f" ELSE NULL END"
        ).alias("canonical"),
    )
    kept = canonical_dedup(pages, "url", "canonical", order_col="doc_id")
    dom = U.registrable_domain(U.url_host(F.col("canon_key")))
    return (
        kept.select(dom.alias("domain"), "doc_id")
        .groupBy("domain")
        .agg(F.count("*").alias("n_pages"),
             F.min("doc_id").alias("min_doc"),
             F.max("doc_id").alias("max_doc"))
        .orderBy("domain")
    )


ORACLE["q_canonical_dedup"] = """
WITH keyed AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN
           'https://example' || CAST(doc_id % 50 % 13 AS VARCHAR)
             || '.com/doc/' || CAST(doc_id % 50 AS VARCHAR)
         ELSE
           'https://example' || CAST(doc_id % 13 AS VARCHAR)
             || '.com/doc/' || CAST(doc_id AS VARCHAR)
             || '?ref=' || CAST(doc_id % 5 AS VARCHAR)
         END AS canon_key
  FROM documents
),
surv AS (
  SELECT canon_key, doc_id,
         row_number() OVER (PARTITION BY canon_key ORDER BY doc_id) AS rn
  FROM keyed
)
SELECT 'example' ||
       regexp_extract(canon_key, 'example([0-9]+)\\.com', 1) || '.com'
         AS domain,
       count(*) AS n_pages, min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM surv WHERE rn = 1 GROUP BY domain ORDER BY domain
"""


def q_recrawl(spark: SparkSession, sf: str) -> DataFrame:
    """Sitemap-driven refresh: the q_sitemap_seeds fixture's page
    entries joined against a corpus whose fetch times are
    mid-January — only pages whose (max, dedup-merged) lastmod beats
    their stored fetch time surface. The utm twin's 2026-02-01
    lastmod must win the per-URL max for doc_id%3==0 pages, and
    stale 2025 entries must never resurface."""
    from data_ingestion_tool_bakasura__spark.operators.crawl import (
        recrawl_candidates,
        sitemap_entries,
    )

    d = "CAST(doc_id AS STRING)"
    g = "CAST(doc_id % 13 AS STRING)"
    lm_day = "lpad(CAST(doc_id % 28 + 1 AS STRING), 2, '0')"
    xml = (
        f"'<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"
        f"<url><loc>https://example' || {g} || '.com/doc/' || {d} ||"
        f" '</loc><lastmod>' ||"
        f" CASE WHEN doc_id % 2 = 1 THEN '2025-06-01'"
        f" ELSE '2026-01-' || {lm_day} END || '</lastmod></url>' ||"
        f" CASE WHEN doc_id % 3 = 0 THEN"
        f" '<url><loc>https://example' || {g} || '.com/doc/' || {d} ||"
        f" '?utm_source=map</loc><lastmod>2026-02-01</lastmod></url>'"
        f" ELSE '' END || '</urlset>'"
    )
    docs = load_table(spark, sf, "documents")
    maps = docs.select(
        F.expr(f"'https://example' || {g} || '.com/sitemap.xml'").alias("url"),
        F.expr(xml).alias("xml"),
    )
    corpus = docs.select(
        F.expr(
            f"'https://example' || {g} || '.com/doc/' || {d}"
        ).alias("norm_url"),
        F.expr(
            "CAST('2026-01-15' AS TIMESTAMP)"
        ).alias("fetched_at"),
    )
    out = recrawl_candidates(sitemap_entries(maps, "xml", "url"), corpus)
    return out.orderBy("norm_url")


ORACLE["q_recrawl"] = """
WITH lm AS (
  SELECT 'https://example' || CAST(doc_id % 13 AS VARCHAR) || '.com/doc/'
           || CAST(doc_id AS VARCHAR) AS norm_url,
         greatest(
           CASE WHEN doc_id % 2 = 1 THEN TIMESTAMP '2025-06-01'
                ELSE CAST('2026-01-' ||
                     lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                     AS TIMESTAMP) END,
           CASE WHEN doc_id % 3 = 0 THEN TIMESTAMP '2026-02-01'
                ELSE TIMESTAMP '1970-01-01' END
         ) AS lastmod
  FROM documents
)
SELECT norm_url, lastmod, TIMESTAMP '2026-01-15' AS fetched_at
FROM lm WHERE lastmod > TIMESTAMP '2026-01-15'
ORDER BY norm_url
"""


QUERIES = {
    "q_url_normalize": q_url_normalize,
    "q_url_dedup": q_url_dedup,
    "q_domain_cap": q_domain_cap,
    "q_domain_blocklist": q_domain_blocklist,
    "q_crawl_pipeline": q_crawl_pipeline,
    "q_wet_pipeline": q_wet_pipeline,
    "q_wat_metadata": q_wat_metadata,
    "q_robots_filter": q_robots_filter,
    "q_c4_line_clean": q_c4_line_clean,
    "q_gopher_quality": q_gopher_quality,
    "q_web_quality_pipeline": q_web_quality_pipeline,
    "q_gopher_repetition": q_gopher_repetition,
    "q_main_content": q_main_content,
    "q_html_meta": q_html_meta,
    "q_bloom_url_dedup": q_bloom_url_dedup,
    "q_cdx_fetch_plan": q_cdx_fetch_plan,
    "q_cdx_range_fetch": q_cdx_range_fetch,
    "q_link_graph": q_link_graph,
    "q_pagerank": q_pagerank,
    "q_anchor_text": q_anchor_text,
    "q_frontier": q_frontier,
    "q_html_links": q_html_links,
    "q_sitemap_seeds": q_sitemap_seeds,
    "q_surt_keys": q_surt_keys,
    "q_fetch_schedule": q_fetch_schedule,
    "q_canonical_dedup": q_canonical_dedup,
    "q_recrawl": q_recrawl,
    "q_warc_render": q_warc_render,
    "q_warc_zst_roundtrip": q_warc_zst_roundtrip,
}
