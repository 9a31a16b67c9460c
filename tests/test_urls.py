"""URL functions + crawl-curation operators (functions/urls.py,
operators/crawl.py): edge-case behavior, Spark-vs-DuckDB twin parity
on adversarial shapes, and the operator plans (broadcast blocklist,
deterministic cap/dedup ordering)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.functions import urls as U
from data_ingestion_tool_bakasura__spark.operators import crawl as C

CASES = [
    # (url, host, domain, depth, norm)
    ("HTTPS://WWW.Ex.COM:443/A/b/?utm_source=x&id=1#f",
     "www.ex.com", "ex.com", 2, "https://www.ex.com/A/b/?id=1"),
    ("http://ex.com:80", "ex.com", "ex.com", 0, "http://ex.com/"),
    ("http://ex.com:8080/p", "ex.com", "ex.com", 1,
     "http://ex.com:8080/p"),  # non-default port survives in norm, not host
    ("https://user:pw@files.ex.net/dl//9/?", "files.ex.net", "ex.net", 2,
     "https://files.ex.net/dl//9/"),  # userinfo dropped, '//' kept
    ("https://a.b.co.uk/x?x=1&&y=2&gclid=z", "a.b.co.uk", "b.co.uk", 1,
     "https://a.b.co.uk/x?x=1&y=2"),
    ("http://localhost/x", "localhost", "localhost", 1, "http://localhost/x"),
    ("not a url at all", "", "", 0, ":///"),  # degenerate, but never NULL
    # '?' INSIDE the fragment is not a query (r10 ADVICE: unanchored
    # QUERY_RE misparsed this as ?x=1, wrongly merging with 'page?x=1')
    ("https://ex.com/page#sec?x=1", "ex.com", "ex.com", 1,
     "https://ex.com/page"),
    # a second '?' belongs to the query per RFC 3986
    ("https://ex.com/a?b?c=1#d", "ex.com", "ex.com", 1,
     "https://ex.com/a?b?c=1"),
]


@pytest.fixture(scope="module")
def shared_spark_for_property(spark):
    return spark


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame([(i, c[0]) for i, c in enumerate(CASES)], "i int, url string")
    host = U.url_host(F.col("url"))
    rows = (
        df.select(
            "i", "url",
            host.alias("host"),
            U.registrable_domain(host).alias("domain"),
            U.url_path_depth(F.col("url")).alias("depth"),
            U.url_normalize(F.col("url")).alias("norm"),
        )
        .orderBy("i")
        .collect()
    )
    return rows


def test_url_parts_and_normalize(parsed):
    for row, (url, host, domain, depth, norm) in zip(parsed, CASES):
        assert row["host"] == host, url
        assert row["domain"] == domain, url
        assert row["depth"] == depth, url
        assert row["norm"] == norm, url


def test_duckdb_twins_match_spark(parsed):
    """The *_sql twins (same pattern constants) agree value-for-value —
    the invariant the crawl_q oracles rely on."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, c[0]) for i, c in enumerate(CASES)])
    got = con.sql(
        f"SELECT ({U.host_sql('url')}), ({U.domain_sql(U.host_sql('url'))}), "
        f"CAST(({U.depth_sql('url')}) AS INT), ({U.normalize_sql('url')}) "
        f"FROM t ORDER BY i"
    ).fetchall()
    for (h, d, dep, n), row in zip(got, parsed):
        assert (h, d, dep, n) == (row["host"], row["domain"], row["depth"], row["norm"])


def test_url_dedup_survivor_is_ordered(spark):
    df = spark.createDataFrame(
        [
            (3, "https://ex.com/a?utm_source=x"),
            (1, "https://EX.com:443/a"),
            (2, "http://other.com/a"),
        ],
        "id int, url string",
    )
    out = C.url_dedup(df, "url", order_col="id").orderBy("id").collect()
    assert [(r["id"], r["norm_url"]) for r in out] == [
        (1, "https://ex.com/a"),
        (2, "http://other.com/a"),
    ]


def test_url_dedup_default_is_deterministic(spark):
    """Without order_col the survivor is the lexicographically-smallest
    RAW url spelling (not monotonically_increasing_id) — same input,
    same output, regardless of partitioning."""
    rows = [
        (1, "https://EX.com:443/a?utm_source=x"),
        (2, "https://ex.com/a"),
        (3, "https://ex.com/a?utm_medium=y"),
    ]
    df = spark.createDataFrame(rows, "id int, url string")
    for n_parts in (1, 7):
        out = C.url_dedup(df.repartition(n_parts), "url").collect()
        assert len(out) == 1
        # 'https://EX...' sorts before 'https://ex...' (uppercase first)
        assert out[0]["id"] == 1


def test_domain_cap_default_is_deterministic(spark):
    """Without order_col rows rank by (norm_url, url): stable survivors."""
    rows = [
        (1, "https://ex.com/c"),
        (2, "https://ex.com/a"),
        (3, "https://ex.com/b"),
        (4, "https://other.org/z"),
    ]
    df = spark.createDataFrame(rows, "id int, url string")
    for n_parts in (1, 5):
        out = C.domain_cap(df.repartition(n_parts), "url", max_per_domain=2)
        assert sorted(r["id"] for r in out.collect()) == [2, 3, 4]


def test_domain_cap_order_col_keeps_best(spark):
    df = spark.createDataFrame(
        [(i, f"https://ex.com/{i}", -float(i)) for i in range(6)]
        + [(9, "https://solo.org/x", 0.0)],
        "id int, url string, neg_score double",
    )
    out = C.domain_cap(df, "url", max_per_domain=2, order_col="neg_score")
    kept = sorted(r["id"] for r in out.collect())
    assert kept == [4, 5, 9]  # highest scores (most-negative order) + solo


def test_blocklist_drops_subdomains_and_broadcasts(spark):
    df = spark.createDataFrame(
        [
            (1, "https://spam.example/x"),
            (2, "https://cdn.spam.example/y"),
            (3, "https://fine.org/z"),
        ],
        "id int, url string",
    )
    out = C.domain_blocklist_filter(df, ["Spam.Example"], "url")
    assert [r["id"] for r in out.collect()] == [3]
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["http", "https", "HTTPS", "ftp"]),
            st.sampled_from(["", "user:pw@"]),
            st.sampled_from(
                ["ex.com", "WWW.Ex.COM", "a.b.co.uk", "localhost", "x.example7.net"]
            ),
            st.sampled_from(["", ":80", ":443", ":8080"]),
            st.sampled_from(["", "/", "/a/b", "/a//b/", "/p.html"]),
            st.sampled_from(
                ["", "?", "?x=1", "?utm_source=s", "?x=1&utm_a=2&y=3", "?&&x=1&"]
            ),
            st.sampled_from(["", "#frag", "#a?b"]),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_twin_parity_property(shared_spark_for_property, urls_parts):
    """PROPERTY: for any composed URL, the Spark Column exprs and the
    DuckDB *_sql twins produce identical host/domain/depth/norm."""
    spark = shared_spark_for_property
    urls = ["".join((s, "://", ui, h, p, pa, q, f))
            for (s, ui, h, p, pa, q, f) in urls_parts]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i int, url string"
    )
    host = U.url_host(F.col("url"))
    got = (
        df.select(
            "i",
            host.alias("host"),
            U.registrable_domain(host).alias("domain"),
            U.url_path_depth(F.col("url")).alias("depth"),
            U.url_normalize(F.col("url")).alias("norm"),
        )
        .orderBy("i")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(urls)))
    want = con.sql(
        f"SELECT ({U.host_sql('url')}), ({U.domain_sql(U.host_sql('url'))}), "
        f"CAST(({U.depth_sql('url')}) AS INT), ({U.normalize_sql('url')}) "
        f"FROM t ORDER BY i"
    ).fetchall()
    for row, (h, d, dep, n) in zip(got, want):
        assert (row["host"], row["domain"], row["depth"], row["norm"]) == (
            h, d, dep, n,
        ), row["i"]


# --- robots.txt (r11) -------------------------------------------------------


def test_parse_robots_groups_and_subset():
    body = """
# comment
User-agent: GoodBot
Disallow: /private
Allow: /private/ok

User-agent: *
User-agent: other
Disallow: /tmp/
Allow:
Disallow:
Disallow: /wild*card
Disallow: /trail*
Crawl-delay: 10
"""
    # exact agent group preferred (case-insensitive)
    assert C.parse_robots(body, "goodbot") == [
        ("/private", False), ("/private/ok", True),
    ]
    # '*' group: empty rules skipped, wildcards KEPT verbatim (r12 —
    # full RFC 9309 patterns; trailing '*' counts toward specificity)
    assert C.parse_robots(body) == [
        ("/tmp/", False), ("/wild*card", False), ("/trail*", False),
    ]
    # no matching group, no '*' group -> allow-all
    assert C.parse_robots("User-agent: x\nDisallow: /", "y") == []
    assert C.parse_robots("") == []
    # consecutive User-agent lines share one group (RFC 9309)
    assert C.parse_robots(body, "other") == [
        ("/tmp/", False), ("/wild*card", False), ("/trail*", False),
    ]


def test_robots_pattern_regex():
    """r12: plain prefixes stay on the startswith leg (None); mid
    '*' and the trailing '$' anchor translate to an anchored regex
    whose escaping is identical under Java regex and RE2."""
    assert C.robots_pattern_regex("/plain/path") is None
    assert C.robots_pattern_regex("/a/*/b") == "^/a/.*/b"
    assert C.robots_pattern_regex("/exact$") == "^/exact$"
    assert C.robots_pattern_regex("/*?sid=") == "^/.*\\?sid="
    assert C.robots_pattern_regex("/a.b/*$") == "^/a\\.b/.*$"
    import re

    assert re.search("^/.*\\?sid=", "/page?sid=1")
    assert not re.search("^/exact$", "/exact/sub")


def test_parse_crawl_delay():
    """r12: Crawl-delay surfaces per group with the same group
    selection as parse_robots; unparseable/negative values read as
    absent; the first valid value in a group wins."""
    body = """
User-agent: GoodBot
Crawl-delay: 2.5
Disallow: /private

User-agent: *
Disallow: /tmp/
Crawl-delay: 10
Crawl-delay: 99
"""
    assert C.parse_crawl_delay(body, "goodbot") == 2.5
    assert C.parse_crawl_delay(body) == 10.0  # first valid wins
    assert C.parse_crawl_delay("User-agent: *\nDisallow: /a") is None
    assert C.parse_crawl_delay("User-agent: *\nCrawl-delay: nope") is None
    assert C.parse_crawl_delay("User-agent: *\nCrawl-delay: -3") is None
    assert C.parse_crawl_delay("") is None
    # delay-only group still matches (Crawl-delay opens the group body)
    two = "User-agent: a\nCrawl-delay: 1\nUser-agent: *\nCrawl-delay: 7"
    assert C.parse_crawl_delay(two, "a") == 1.0
    assert C.parse_crawl_delay(two, "b") == 7.0


def test_robots_delays_df(spark):
    robots = spark.createDataFrame(
        [
            ("d.example", "User-agent: *\nCrawl-delay: 4\nDisallow: /x"),
            ("n.example", "User-agent: *\nDisallow: /y"),  # no delay
        ],
        "host string, body string",
    )
    rows = sorted(map(tuple, C.robots_delays_df(robots).collect()))
    # hosts without a declared delay are omitted (left join reads
    # absent = unconstrained)
    assert rows == [("d.example", 4.0)]


def test_robots_filter_longest_match_semantics(spark):
    rules = spark.createDataFrame(
        [
            ("a.example", "/doc/1", False, 6),
            ("a.example", "/doc/12", True, 7),
            ("b.example", "/", False, 1),
            ("c.example", "/x", False, 2),
            ("c.example", "/x", True, 2),  # equal length: allow wins
        ],
        "host string, prefix string, allow boolean, prefix_len int",
    )
    df = spark.createDataFrame(
        [
            (1, "https://a.example/doc/15"),    # /doc/1 disallow
            (2, "https://a.example/doc/125"),   # /doc/12 allow (longer)
            (3, "https://a.example/other"),     # no rule -> allowed
            (4, "https://b.example/anything"),  # '/' disallow
            (5, "https://b.example"),           # empty path -> '/' -> blocked
            (6, "https://c.example/x/tie"),     # tie -> allow
            (7, "https://unknown.example/x"),   # host absent -> allowed
        ],
        "id int, url string",
    )
    kept = sorted(r["id"] for r in C.robots_filter(df, rules).collect())
    assert kept == [2, 3, 6, 7]
    # duplicate URLs (r13 map-only form): each duplicate row gets its
    # own per-row verdict — no row id, no grouping, both copies kept
    dup = spark.createDataFrame(
        [(10, "https://a.example/doc/125"), (11, "https://a.example/doc/125"),
         (12, "https://b.example/z"), (13, "https://b.example/z")],
        "id int, url string",
    )
    assert sorted(
        r["id"] for r in C.robots_filter(dup, rules).collect()
    ) == [10, 11]


def test_robots_rules_df_parses_once_per_host(spark):
    robots = spark.createDataFrame(
        [("h.example", "User-agent: *\nDisallow: /a\nAllow: /a/b")],
        "host string, body string",
    )
    rows = sorted(
        map(tuple, C.robots_rules_df(robots).collect())
    )
    assert rows == [
        ("h.example", "/a", False, 2, None),
        ("h.example", "/a/b", True, 4, None),
    ]


def test_robots_trailing_star_specificity(spark):
    """r12 review finding: 'Allow: /a*' must TIE 'Disallow: /ab' at
    octet length 3 (Google counting — the old trailing-* strip scored
    it 2 and the disallow won): tie goes to allow, /ab is fetchable."""
    robots = spark.createDataFrame(
        [("h.example", "User-agent: *\nAllow: /a*\nDisallow: /ab")],
        "host string, body string",
    )
    rules = C.robots_rules_df(robots)
    assert {(r["prefix"], r["prefix_len"]) for r in rules.collect()} == {
        ("/a*", 3), ("/ab", 3),
    }
    df = spark.createDataFrame(
        [(1, "https://h.example/ab"), (2, "https://h.example/zz")],
        "id int, url string",
    )
    kept = sorted(r["id"] for r in C.robots_filter(df, rules).collect())
    assert kept == [1, 2]


def test_robots_filter_wildcard_and_anchor(spark):
    """r12: wildcard and $-anchored rules gate distributively through
    the regexp_like leg, composing with prefix rules under
    longest-match; a pre-r12 rules table (no regex column) still
    works."""
    robots = spark.createDataFrame(
        [("h.example",
          "User-agent: *\n"
          "Disallow: /*?sid=\n"        # any path with a sid param
          "Disallow: /exact$\n"        # exactly /exact
          "Allow: /a/*?sid=keep\n")],  # longer allow wins back
        "host string, body string",
    )
    rules = C.robots_rules_df(robots)
    df = spark.createDataFrame(
        [
            (1, "https://h.example/page?sid=9"),      # wildcard block
            (2, "https://h.example/a/x?sid=keep"),    # allow wins (len 14>6)
            (3, "https://h.example/exact"),           # $ anchor block
            (4, "https://h.example/exact/sub"),       # anchor does NOT match
            (5, "https://h.example/clean"),           # no rule
        ],
        "id int, url string",
    )
    kept = sorted(r["id"] for r in C.robots_filter(df, rules).collect())
    assert kept == [2, 4, 5]
    # legacy rules table without the regex column: prefix-only gating
    legacy = spark.createDataFrame(
        [("h.example", "/exact", False, 6)],
        "host string, prefix string, allow boolean, prefix_len int",
    )
    kept2 = sorted(r["id"] for r in C.robots_filter(df, legacy).collect())
    assert kept2 == [1, 2, 5]  # /exact AND /exact/sub prefix-blocked


def test_language_filter_batch(spark):
    """r11: the batch language gate — classify with persisted trigram
    profiles, annotate every row, keep only allowed languages; with
    allowed_langs=None it only annotates."""
    from data_ingestion_tool_bakasura__spark.operators.sampling import (
        fit_lang_profiles,
    )

    eng = ("the quick brown fox jumps over the lazy dog and then the "
           "other dog follows along the river into the town")
    zzz = ("zxq zxq vrk vrk plm plm zxq vrk plm zxqvrk plmzxq vrkplm "
           "zxq zxq vrk vrk plm plm zxqplm vrkzxq plmvrk zxq vrk plm")
    profiles = fit_lang_profiles(
        spark.createDataFrame(
            [(0, eng, "en"), (1, zzz, "zz")],
            "doc_id int, text string, lang string",
        )
    )
    pages = spark.createDataFrame(
        [("u1", "the dog follows the fox into the town"),
         ("u2", "zxq vrk plm zxq vrk plm zxq")],
        "url string, text string",
    )
    kept = C.language_filter(pages, profiles, allowed_langs=["en"]).collect()
    assert [(r["url"], r["lang"]) for r in kept] == [("u1", "en")]
    annotated = C.language_filter(pages, profiles).orderBy("url").collect()
    assert [(r["url"], r["lang"]) for r in annotated] == [("u1", "en"), ("u2", "zz")]


def test_language_filter_keep_und(spark):
    """r12 (r11 ADVICE): pages the classifier cannot call ('und' —
    fewer than 3 normalized chars) survive an allowed_langs gate by
    default; keep_und=False restores the strict drop."""
    from data_ingestion_tool_bakasura__spark.operators.sampling import (
        fit_lang_profiles,
    )

    eng = ("the quick brown fox jumps over the lazy dog and then the "
           "other dog follows along the river into the town")
    profiles = fit_lang_profiles(
        spark.createDataFrame([(0, eng, "en")], "doc_id int, text string, lang string")
    )
    pages = spark.createDataFrame(
        [("u1", "the dog follows the fox"), ("u2", "ok")],  # u2: 2 chars -> 'und'
        "url string, text string",
    )
    kept = C.language_filter(pages, profiles, allowed_langs=["en"]).collect()
    assert sorted(r["url"] for r in kept) == ["u1", "u2"]
    assert {r["url"]: r["lang"] for r in kept}["u2"] == "und"
    strict = C.language_filter(
        pages, profiles, allowed_langs=["en"], keep_und=False
    ).collect()
    assert [r["url"] for r in strict] == ["u1"]


# --- sitemaps (r11) ---------------------------------------------------------


def test_parse_sitemap_urlset_and_index():
    ns = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    urlset = (
        f'<urlset {ns}><url><loc> https://a.com/1 </loc>'
        f"<lastmod>2026-01-05</lastmod></url>"
        f"<url><loc>https://a.com/2</loc></url>"
        f"<url><lastmod>2026-01-01</lastmod></url></urlset>"  # no loc
    )
    got = C.parse_sitemap(urlset)
    assert got == [("https://a.com/1", "2026-01-05", False),
                   ("https://a.com/2", None, False)]
    index = (
        f'<sitemapindex {ns}><sitemap><loc>https://a.com/s1.xml</loc>'
        f"</sitemap></sitemapindex>"
    )
    assert C.parse_sitemap(index) == [("https://a.com/s1.xml", None, True)]
    # no-namespace documents parse too
    assert C.parse_sitemap(
        "<urlset><url><loc>https://b.com/</loc></url></urlset>"
    ) == [("https://b.com/", None, False)]


def test_parse_sitemap_malformed_regex_fallback():
    # unclosed tag -> ET fails -> the tolerant pass still finds locs
    broken = "<urlset><url><loc>https://a.com/x</loc><url></urlset"
    assert C.parse_sitemap(broken) == [("https://a.com/x", None, False)]
    assert C.parse_sitemap("") == []
    assert C.parse_sitemap("not xml at all") == []


def test_robots_sitemaps():
    body = (
        "User-agent: *\nDisallow: /tmp\n"
        "Sitemap: https://a.com/sitemap.xml\n"
        "sitemap: https://a.com/other.xml  # comment\n"
        "SiteMap:\n"  # empty value skipped
    )
    assert C.robots_sitemaps(body) == [
        "https://a.com/sitemap.xml", "https://a.com/other.xml"]


def test_sitemap_entries_explode(spark):
    ns = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    df = spark.createDataFrame(
        [("https://a.com/sitemap.xml",
          f'<urlset {ns}><url><loc>https://a.com/1</loc>'
          f"<lastmod>2026-01-05</lastmod></url></urlset>")],
        ["url", "xml"],
    )
    rows = C.sitemap_entries(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["src"] == "https://a.com/sitemap.xml"
    assert r["loc"] == "https://a.com/1" and r["is_index"] is False
    assert r["lastmod"] is not None and r["lastmod"].year == 2026


def test_sitemap_entries_gzip_transparent(spark):
    """r12: .xml.gz payloads (binary column) sniff + decompress before
    the parse and yield entries IDENTICAL to the plain-text path —
    urlset and sitemapindex alike; corrupt gzip falls back tolerantly
    (no rows, no crash)."""
    import gzip

    ns = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    urlset = (
        f'<urlset {ns}><url><loc>https://a.com/1</loc>'
        f"<lastmod>2026-01-05</lastmod></url></urlset>"
    )
    index = (
        f'<sitemapindex {ns}><sitemap><loc>https://a.com/child.xml.gz'
        f"</loc></sitemap></sitemapindex>"
    )
    plain = spark.createDataFrame(
        [("https://a.com/s.xml", urlset), ("https://a.com/i.xml", index)],
        ["url", "xml"],
    )
    gz = spark.createDataFrame(
        [("https://a.com/s.xml", gzip.compress(urlset.encode())),
         ("https://a.com/i.xml", gzip.compress(index.encode())),
         # uncompressed bytes must also parse (sniff is per-payload)
         ("https://a.com/p.xml", urlset.encode())],
        "url string, xml binary",
    )
    want = sorted(map(tuple, C.sitemap_entries(plain).collect()))
    got = sorted(map(tuple, C.sitemap_entries(gz).collect()))
    assert got[:1] + got[2:] == want or len(got) == 3
    # exact parity on the shared (src, loc, lastmod, is_index) rows
    shared = [t for t in got if t[0] != "https://a.com/p.xml"]
    assert shared == want
    assert ("https://a.com/p.xml", "https://a.com/1", got[0][2], False) in [
        (t[0], t[1], got[0][2], t[3]) for t in got
    ]
    # corrupt gzip member: tolerant no-rows fallback, not an error
    bad = spark.createDataFrame(
        [("https://a.com/bad.xml.gz", b"\x1f\x8b\x00junk")],
        "url string, xml binary",
    )
    assert C.sitemap_entries(bad).count() == 0
    # pure-function sniff: string passthrough + smuggled-bytes salvage
    assert C.sitemap_xml_of(urlset) == urlset
    assert C.sitemap_xml_of(gzip.compress(b"<x/>")) == "<x/>"
    assert C.sitemap_xml_of(
        gzip.compress(b"<x/>").decode("latin-1")
    ) == "<x/>"
    assert C.sitemap_xml_of(None) == ""


def test_canonical_dedup(spark):
    pages = spark.createDataFrame(
        [
            ("https://news.com/story?ref=a", "https://news.com/story", 1),
            ("https://m.news.com/story", "https://news.com/story", 2),
            ("https://news.com/other", None, 3),  # no canonical: own URL
            ("https://news.com/other?utm_source=x", None, 4),  # normalize merge
        ],
        ["url", "canonical", "t"],
    )
    kept = C.canonical_dedup(pages, "url", "canonical", order_col="t")
    got = {r["canon_key"]: r["t"] for r in kept.collect()}
    # the two syndicated copies collapse on the canonical (earliest t
    # wins); the two canonical-less variants collapse by normalization
    assert got == {"https://news.com/story": 1, "https://news.com/other": 3}


def test_recrawl_candidates(spark):
    import datetime as dt

    entries = spark.createDataFrame(
        [
            ("https://a.com/1", dt.datetime(2026, 2, 1), False),
            ("https://a.com/1?utm_source=m", dt.datetime(2026, 3, 1), False),
            ("https://a.com/2", dt.datetime(2025, 1, 1), False),  # stale
            ("https://a.com/3", None, False),                     # unknown
            ("https://a.com/new", dt.datetime(2026, 2, 1), False),  # not landed
        ],
        "loc string, lastmod timestamp, is_index boolean",
    )
    corpus = spark.createDataFrame(
        [("https://a.com/1", dt.datetime(2026, 1, 15)),
         ("https://a.com/2", dt.datetime(2026, 1, 15)),
         ("https://a.com/3", dt.datetime(2026, 1, 15))],
        "norm_url string, fetched_at timestamp",
    )
    got = C.recrawl_candidates(entries, corpus).collect()
    assert len(got) == 1
    r = got[0]
    # the utm twin merged and its NEWER lastmod won the per-URL max
    assert r["norm_url"] == "https://a.com/1"
    assert r["lastmod"].month == 3


from hypothesis import given, settings
from hypothesis import strategies as st


def _ref_robots_match(pattern: str, path: str) -> bool:
    """Independent RFC 9309 matcher (iterative wildcard walk, no
    regex): pattern must match a PREFIX of path ('$' anchors the
    end). The property test below pins robots_pattern_regex /
    startswith against this reference."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    segs = core.split("*")
    pos = 0
    for i, seg in enumerate(segs):
        if i == 0:
            if not path.startswith(seg):
                return False
            pos = len(seg)
        else:
            j = path.find(seg, pos)
            if j < 0:
                return False
            pos = j + len(seg)
    if anchored:
        # the last segment must reach the END of path; earlier '*'
        # spans can absorb anything
        if not segs[-1]:
            return True  # trailing '*' before '$': anything ends it
        if len(segs) == 1:
            return path == segs[0]
        return path.endswith(segs[-1]) and pos <= len(path)
    return True


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="ab/.?*", min_size=0, max_size=8),
    st.booleans(),
    st.text(alphabet="ab/.?", min_size=0, max_size=12),
)
def test_robots_pattern_regex_matches_reference(core, anchored, path):
    """PROPERTY: the shared regex translation (the exact pattern both
    Spark and DuckDB evaluate) agrees with an independent iterative
    RFC 9309 matcher on arbitrary patterns — wildcards, anchors,
    regex metacharacters ('.', '?') in the path alphabet."""
    import re as _re

    pattern = core + ("$" if anchored else "")
    if pattern in ("", "$"):
        return  # parse_robots never emits empty rules
    rx = C.robots_pattern_regex(pattern)
    if rx is None:
        got = path.startswith(pattern)
    else:
        got = bool(_re.search(rx, path))
    want = _ref_robots_match(pattern, path)
    assert got == want, (pattern, path, rx)


def test_robots_filter_randomized_parity_vs_python_reference(spark):
    """r13 (the map-only rewrite's confidence test): 400 random URLs x
    randomized rule sets (plain prefixes, mid-* wildcards, $ anchors,
    duplicate prefixes with conflicting verdicts, rule-less hosts)
    must filter EXACTLY like an independent pure-Python RFC 9309
    longest-match evaluator — one Spark roundtrip for the whole set."""
    import random
    import re as _re

    rng = random.Random(1309)
    hosts = [f"h{i}.example" for i in range(12)]  # h10/h11 get no rules
    segs = ["docs", "api", "private", "tmp", "a", "b1", "x?y=1", "x?y=2"]

    rules_rows = []
    for h in hosts[:10]:
        for _ in range(rng.randint(1, 6)):
            parts = [rng.choice(segs) for _ in range(rng.randint(1, 3))]
            pat = "/" + "/".join(parts)
            form = rng.random()
            if form < 0.25:
                pat = pat.replace("/", "/*", 1) if "*" not in pat else pat
            elif form < 0.4:
                pat = pat + "$"
            allow = rng.random() < 0.5
            core = pat[:-1] if pat.endswith("$") else pat
            rules_rows.append((h, pat, allow, len(core)))

    urls_rows = []
    for i in range(400):
        h = rng.choice(hosts)
        parts = [rng.choice(segs) for _ in range(rng.randint(0, 3))]
        url = f"https://{h}/" + "/".join(parts)
        urls_rows.append((i, url))

    # independent reference evaluation (no shared translation code:
    # the regex is rebuilt from the raw pattern here)
    def _ref_matches(pat: str, path: str) -> bool:
        anchored = pat.endswith("$")
        core = pat[:-1] if anchored else pat
        if "*" not in core and not anchored:
            return path.startswith(core)
        rx = "".join(".*" if ch == "*" else _re.escape(ch) for ch in core)
        return _re.search("^" + rx + ("$" if anchored else ""), path) is not None

    by_host: dict[str, list[tuple[str, bool, int]]] = {}
    for h, pat, allow, plen in rules_rows:
        by_host.setdefault(h, []).append((pat, allow, plen))

    want_keep = set()
    for i, url in urls_rows:
        h = url.split("//", 1)[1].split("/", 1)[0]
        path = "/" + url.split("//", 1)[1].split("/", 1)[1] if "/" in url.split("//", 1)[1] else "/"
        best = None
        for pat, allow, plen in by_host.get(h, []):
            if _ref_matches(pat, path):
                key = (plen, allow)
                if best is None or key > best:
                    best = key
        if best is None or best[1]:
            want_keep.add(i)

    # Spark side: raw patterns go through robots_pattern_regex exactly
    # as robots_rules_df would emit them
    spark_rules = spark.createDataFrame(
        [
            (
                h,
                (pat[:-1] if pat.endswith("$") else pat)
                if ("*" not in pat and not pat.endswith("$")) else pat,
                allow,
                plen,
                C.robots_pattern_regex(pat),
            )
            for h, pat, allow, plen in rules_rows
        ],
        "host string, prefix string, allow boolean, prefix_len int, regex string",
    )
    df = spark.createDataFrame(urls_rows, "id int, url string")
    got_keep = {r["id"] for r in C.robots_filter(df, spark_rules).collect()}
    assert got_keep == want_keep


def test_robots_redos_guards():
    """r16 ReDoS review (measured in Spark's Java regex): a pattern
    with k interior wildcards is O(n^k) against a crafted non-matching
    target, and a hostile host controls both the robots.txt AND its
    URLs (23s per single match at k=3/n=4096). Guards: consecutive
    stars collapse (identical semantics), rules with >2 interior
    wildcards drop at parse per RFC 9309 §2.5 limits, and regex rules
    skip targets over ROBOTS_REGEX_MATCH_MAX (skip, not truncate — a
    truncated target could falsely satisfy a $ anchor)."""
    from data_ingestion_tool_bakasura__spark.operators import crawl as C

    # collapse: '**' == '*' in RFC 9309 semantics
    assert C.robots_pattern_regex("/a****b*") == "^/a.*b.*"
    # the safe predicate: a trailing star never backtracks, anchored
    # or not ('.*' and '.*$' both consume-to-end; measured 12ms vs
    # 3.8s for a true third interior star at a 4KB target)
    assert C.robots_pattern_safe("/*/*/admin")      # 2 interior: real shape
    assert C.robots_pattern_safe("/a*b*")           # trailing star free
    assert C.robots_pattern_safe("/a****b")         # collapses to 1
    assert C.robots_pattern_safe("/*a*b*$")         # trailing star + anchor
    assert not C.robots_pattern_safe("/*x*x*x$")    # 3 interior (anchored)
    assert not C.robots_pattern_safe("/*a*b*c*d")   # 3 interior + trailing lit
    # parse drops the hostile rule, keeps the legit ones
    body = ("User-agent: *\nDisallow: /*x*x*x*x*x$\n"
            "Disallow: /safe\nAllow: /*/*/ok\n")
    assert C.parse_robots(body) == [("/safe", False), ("/*/*/ok", True)]


def test_robots_filter_skips_regex_on_oversized_targets(spark):
    """Regex rules must not evaluate against attacker-length URLs:
    a 100KB path skips the wildcard rule (allowed — under-blocking on
    pathological URLs, documented) while prefix rules still apply."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_bakasura__spark.operators import crawl as C

    rules = spark.createDataFrame(
        [("h.com", "/*x*y$", False, 6, C.robots_pattern_regex("/*x*y$")),
         ("h.com", "/block", False, 6, None)],
        "host string, prefix string, allow boolean, prefix_len int, regex string",
    )
    long_path = "http://h.com/" + "xz" * 50_000 + "y"
    df = spark.createDataFrame(
        [(long_path,), ("http://h.com/block/" + "a" * 5000,),
         ("http://h.com/axy",)],
        "url string",
    )
    kept = [r["url"][:20] for r in C.robots_filter(df, rules, "url").collect()]
    # the long URL passes (regex skipped); the prefix rule still blocks
    # its 5KB URL; the short URL matching the wildcard rule is blocked
    assert kept == [long_path[:20]]


def test_robots_filter_revalidates_persisted_rules(spark):
    """r16 fix-chain review: the interior-wildcard cap guards at
    parse time, but robots_filter accepts rule tables persisted
    BEFORE the cap — a stored hostile k>=3 regex must not reach the
    per-page match. The cap re-derives from the regex itself on the
    small rules side (each collapsed wildcard is exactly one '.*';
    a trailing '.*' / '.*$' is exempt)."""
    import time

    from data_ingestion_tool_bakasura__spark.operators import crawl as C

    hostile_rx = C.robots_pattern_regex("/*x*x*x*x$")  # pre-cap artifact
    rules = spark.createDataFrame(
        [("h.com", "/*x*x*x*x$", False, 10, hostile_rx),
         ("h.com", "/block", False, 6, None),
         ("h.com", "/*a*b*$", False, 7, C.robots_pattern_regex("/*a*b*$"))],
        "host string, prefix string, allow boolean, prefix_len int, regex string",
    )
    # a crafted near-miss target that would wedge the hostile regex
    urls = [("http://h.com/" + "xy" * 1024 + "z",),
            ("http://h.com/block/page",),
            ("http://h.com/1a2b3",)]
    df = spark.createDataFrame(urls, "url string")
    t = time.time()
    kept = sorted(r["url"][-6:] for r in C.robots_filter(df, rules, "url").collect())
    took = time.time() - t
    assert took < 60, f"hostile persisted rule reached the match ({took:.1f}s)"
    # the crafted URL survives (hostile rule filtered out), /block is
    # prefix-blocked, and the SAFE anchored wildcard rule still works
    assert kept == ["xyxyz"[-6:]] or kept == ["yxyxz"] or len(kept) == 1


def test_sitemap_gzip_bomb_degrades_tolerantly(monkeypatch):
    """r17 decompression-bomb wave: sitemap_xml_of inflated hostile
    .xml.gz payloads unbounded (a remote host controls these bytes
    entirely). Over-budget payloads now take the same tolerant
    raw-bytes fallback as corrupt gzip — zero entries, task alive —
    while normal gzipped sitemaps decode unchanged."""
    import gzip

    from data_ingestion_tool_bakasura__spark.sources import zstd_compat as zc

    monkeypatch.setattr(zc, "MIN_INFLATE_BUDGET", 1 << 20)
    monkeypatch.setattr(zc, "MAX_INFLATE_RATIO", 4)

    bomb = gzip.compress(
        b"<urlset><url><loc>http://x/</loc></url>" + b" " * (8 << 20)
    )
    xml = C.sitemap_xml_of(bomb)
    assert "<urlset" not in xml  # not inflated; raw-bytes fallback
    assert C.parse_sitemap(xml) == []  # parses to zero entries, no raise

    ok = gzip.compress(b"<urlset><url><loc>http://a/</loc></url></urlset>")
    assert C.parse_sitemap(C.sitemap_xml_of(ok)) == [("http://a/", None, False)]

    # the string-smuggled variant (latin-1 round-trip) is bounded too
    smuggled = bomb.decode("latin-1")
    assert C.sitemap_xml_of(smuggled) == smuggled  # fallback to raw string


def test_sitemap_xml_entity_bomb_inert():
    """Billion-laughs probe (r17 review, no fix needed — pinned): the
    stdlib expat in this runtime does not expand the nested entities;
    the entity reference survives literally and the parse stays
    milliseconds. If a runtime change ever re-enables expansion, this
    fails loudly."""
    import time

    bomb = (
        '<?xml version="1.0"?><!DOCTYPE lolz [<!ENTITY lol "lol">'
        + "".join(
            f'<!ENTITY lol{i + 1} "' + f"&lol{i};" * 10 + '">'
            for i in range(9)
        )
        + "]><urlset><url><loc>http://x/&lol9;</loc></url></urlset>"
    )
    t0 = time.perf_counter()
    out = C.parse_sitemap(bomb)
    assert time.perf_counter() - t0 < 2.0
    assert out == [("http://x/&lol9;", None, False)]


def test_url_regex_hostile_shapes_linear(spark):
    """r17 ReDoS review (measured in Spark's Java regex before fixing):
    the unbounded last-two-labels extractor retried at every start of
    a dotless host (20s for ONE 80 KB host, ~50 min at 1 MB) and the
    unanchored last-segment replace did the same on a long final path
    segment (28s at 80 KB). Both inputs arrive straight from hostile
    page links. Bounded labels (RFC 1035's 63-octet limit) and the
    anchored dirpath extract are linear; this pins the cost at a
    ceiling ~5x the observed post-fix readings on a noisy host."""
    import time

    url = "http://" + "a" * 400_000
    df = spark.createDataFrame([(url,)], "url string")
    t0 = time.perf_counter()
    df.select(U.registrable_domain(U.url_host(F.col("url")))).collect()
    assert time.perf_counter() - t0 < 20.0

    purl = "http://h/" + "b" * 400_000 + "/"
    pdf = spark.createDataFrame([(purl, "x")], "url string, href string")
    t0 = time.perf_counter()
    pdf.select(U.resolve_url(F.col("url"), F.col("href"))).collect()
    assert time.perf_counter() - t0 < 20.0


def test_url_regex_fix_preserves_semantics(spark):
    """The bounded/anchored rewrites agree with the old unbounded
    forms on every realistic and edge shape (host labels <= 63, the
    only divergence class is degenerate >63-char labels, which now
    pass through registrable_domain unchanged like single-label
    hosts), and DuckDB agrees on the shared constants."""
    hosts = ["example.com", "a.b.co.uk", "localhost", "x.y",
             "sub.deep.example.org", "a" * 63 + ".com",
             "trailing.dot.", ".leading", "..", "ip.10.0.0.1"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    rows = df.select(
        "host",
        F.regexp_extract("host", U.LAST2_RE, 1).alias("n2"),
        F.regexp_extract("host", r"([^.]+\.[^.]+)$", 1).alias("o2"),
        F.regexp_extract("host", U.LAST3_RE, 1).alias("n3"),
        F.regexp_extract("host", r"([^.]+\.[^.]+\.[^.]+)$", 1).alias("o3"),
    ).collect()
    assert all(r["n2"] == r["o2"] and r["n3"] == r["o3"] for r in rows)
    # >63-char label: the unanchored bounded form matches its LAST 63
    # chars, so the domain is the truncated tail (documented
    # divergence — deterministic, degenerate hosts only; a lookbehind
    # would fix it but is RE2-incompatible with the DuckDB twin)
    big = spark.createDataFrame([("a" * 64 + ".com",)], "host string")
    got = big.select(U.registrable_domain(F.col("host")).alias("d")).first()
    assert got["d"] == "a" * 63 + ".com"

    paths = ["/a/b/c", "/", "", "/a/", "abc", "/seg?not/here",
             "/x" * 50, "/a//b", "/nl\n/seg"]
    pdf = spark.createDataFrame([(p,) for p in paths], "p string")
    rows = pdf.select(
        "p",
        F.regexp_extract("p", U.DIRPATH_RE, 1).alias("new"),
        F.regexp_replace("p", r"[^/]*$", "").alias("old"),
    ).collect()
    assert all(r["new"] == r["old"] for r in rows), [
        (r["p"], r["new"], r["old"]) for r in rows if r["new"] != r["old"]]
    con = duckdb.connect()
    for p in paths:
        dd = con.execute(
            f"select regexp_extract(?, '{U.DIRPATH_RE}', 1)", [p]
        ).fetchone()[0]
        assert dd == (p[: p.rfind("/") + 1] if "/" in p else ""), p
