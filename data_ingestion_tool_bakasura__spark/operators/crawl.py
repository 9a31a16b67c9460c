"""Crawl-curation operators (round 10): URL-level dedup, per-domain
caps, domain blocklists — the record-selection pass a C4/RefinedWeb-
style pipeline runs between WARC explode and text dedup.

Scale shape: every op here is ONE hash exchange on the domain (or
normalized URL) key — a window for the ordered cap/dedup, a broadcast
anti-join for the blocklist. No all-pairs work, no driver collection;
domains are the natural partition key and skew (a whale domain like
wikipedia) is bounded because the window computes only row_number,
which streams within a partition. At 100 TB the only knob that
matters is ``spark.sql.shuffle.partitions`` sizing.

The reference has no crawl surface (its inputs are uploaded files);
this family is from the mandated training-data-pipeline extension
list, applied to the WARC source (``sources/warc.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.functions import urls as U


def url_dedup(df: DataFrame, url_col: str = "url", order_col: str | None = None) -> DataFrame:
    """Keep one row per *normalized* URL (tracking params, default
    ports, fragments and case cannot split a page into duplicates).

    ``order_col`` picks the survivor deterministically (ascending;
    e.g. a fetch timestamp for keep-oldest). Without it the survivor
    is still deterministic: ties break on the RAW url string (the
    lexicographically-smallest spelling of the page wins), so
    same-input-same-output holds with no caller cooperation. Adds
    ``norm_url``; drops the helper row number. One exchange on
    ``norm_url``."""
    out = df.withColumn("norm_url", U.url_normalize(F.col(url_col)))
    order = F.col(order_col) if order_col else F.col(url_col)
    w = Window.partitionBy("norm_url").orderBy(order)
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def domain_cap(
    df: DataFrame,
    url_col: str = "url",
    max_per_domain: int = 1000,
    order_col: str | None = None,
) -> DataFrame:
    """Keep at most ``max_per_domain`` rows per registrable domain —
    the standard anti-boilerplate / anti-SEO-farm corpus balancer.

    ``order_col`` ranks which rows survive (ascending: lowest first —
    pass e.g. a negated quality score to keep the best). Without it the
    default is deterministic: rows rank by (normalized URL, raw URL),
    so same-input-same-output holds with no caller cooperation. Adds
    ``domain``. One exchange on ``domain``; row_number streams, so a
    whale domain costs one partition's scan, not memory."""
    out = df.withColumn("domain", U.registrable_domain(U.url_host(F.col(url_col))))
    if order_col:
        order = [F.col(order_col)]
    else:
        order = [U.url_normalize(F.col(url_col)), F.col(url_col)]
    w = Window.partitionBy("domain").orderBy(*order)
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_domain)
        .drop("_rn")
    )


#: ReDoS guards for the robots wildcard-rule regex leg (r16, both
#: measured in Spark's backtracking Java regex): a pattern with k
#: INTERIOR wildcards (a ``*`` with more pattern after it — trailing
#: stars and the leading anchor never backtrack) costs O(n^k) against
#: a non-matching n-char target, and BOTH inputs are attacker-
#: controlled (the hostile host serves the robots.txt AND mints its
#: own URLs): measured 3.25s at k=3/n=2048 and 23s at k=3/n=4096 per
#: single match. k=2 at n=2048 is ~20ms worst. RFC 9309 §2.5 invites
#: implementation limits; real rules essentially never exceed two
#: interior wildcards (``/*/*/admin``).
ROBOTS_MAX_INTERIOR_WILDCARDS = 2
#: regex rules are only evaluated against match targets at most this
#: long; longer targets SKIP regex rules (no match) rather than
#: truncate — a truncated target could falsely satisfy a ``$`` anchor.
#: Plain-prefix rules (the vast majority) still match at any length.
ROBOTS_REGEX_MATCH_MAX = 2048


def _collapsed_core(pattern: str) -> tuple[str, bool]:
    """Shared anchor-strip + consecutive-star collapse for the safe
    predicate and the regex translation — ONE definition (r16
    fix-chain review): the predicate only models the translation
    correctly while the two derivations stay byte-identical."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    while "**" in core:
        core = core.replace("**", "*")
    return core, anchored


def robots_pattern_safe(pattern: str) -> bool:
    """False when the pattern's regex translation could backtrack
    catastrophically: more than :data:`ROBOTS_MAX_INTERIOR_WILDCARDS`
    interior ``*`` after collapsing runs (``**`` == ``*``). A TRAILING
    star is exempt whether anchored or not (r16 fix-chain review,
    measured): unanchored it translates to a final ``.*`` that never
    backtracks, and anchored the final ``.*$`` consumes to the end
    and matches in O(1) — 12ms vs 3.8s for a true third interior star
    at a 4KB target. Callers drop unsafe rules at parse time (RFC
    9309 §2.5 robustness / implementation limits — hostile-only
    territory; see the constant's note). Pure function."""
    core, _anchored = _collapsed_core(pattern)
    interior = core.count("*")
    if core.endswith("*"):
        interior -= 1
    return interior <= ROBOTS_MAX_INTERIOR_WILDCARDS


def robots_pattern_regex(pattern: str) -> str | None:
    """RFC 9309 path pattern -> anchored regex, or None when the
    pattern is a PLAIN PREFIX (no mid-pattern ``*``, no ``$`` anchor)
    — the fast ``startswith`` leg needs no regex. ``*`` matches any
    span; a trailing ``$`` anchors the end (mid-pattern ``$`` is
    literal, the Google reading). The escaper covers exactly the
    regex metacharacters, producing a pattern Java regex (Spark) and
    RE2 (DuckDB) read identically — the shared-constant discipline, so
    both engines must misparse together or not at all. Consecutive
    ``*`` runs collapse first (identical semantics, and ``.*.*`` is a
    classic backtracking amplifier); patterns failing
    :func:`robots_pattern_safe` should be dropped BEFORE this
    translation. Pure function."""
    core, anchored = _collapsed_core(pattern)
    if "*" not in core and not anchored:
        return None
    esc = "".join(
        "\\" + ch if ch in ".^$+?()[]{}|\\" else ch
        for ch in core
    )
    return "^" + esc.replace("*", ".*") + ("$" if anchored else "")


def _robots_groups(
    body: str,
) -> list[tuple[list[str], list[tuple[str, bool]], float | None]]:
    """Shared robots.txt group parser: ``[(agents, rules, crawl_delay),
    ...]`` where ``rules`` is ``[(path_pattern, allow), ...]`` and
    ``crawl_delay`` is the group's ``Crawl-delay:`` seconds (None when
    absent/unparseable; the first valid value in a group wins)."""
    groups: list[tuple[list[str], list[tuple[str, bool]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    cur_delay: float | None = None
    in_group_body = False
    for line in (body or "").splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:  # a new group starts
                groups.append((cur_agents, cur_rules, cur_delay))
                cur_agents, cur_rules, cur_delay = [], [], None
                in_group_body = False
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_group_body = True
            if not value:
                continue  # empty Disallow/Allow: no rule
            if not robots_pattern_safe(value):
                # ReDoS guard (r16): >2 interior wildcards is a
                # weaponized-robots.txt shape, never a real rule —
                # dropped per RFC 9309 §2.5 implementation limits
                continue
            # patterns are kept VERBATIM — including a trailing '*',
            # which is a match no-op but COUNTS toward longest-match
            # specificity (Google's octet counting: 'Allow: /a*' must
            # tie 'Disallow: /ab' at length 3, not lose at 2 — the
            # r12 review finding against the old strip)
            cur_rules.append((value, field == "allow"))
        elif field == "crawl-delay":
            in_group_body = True
            if cur_delay is None:
                try:
                    d = float(value)
                    cur_delay = d if d >= 0 else None
                except ValueError:
                    pass  # unparseable delay: treated as absent
        else:
            in_group_body = in_group_body or field == "sitemap"
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules, cur_delay))
    return groups


def _robots_group_for(
    groups: list[tuple[list[str], list[tuple[str, bool]], float | None]],
    agent: str,
) -> tuple[list[tuple[str, bool]], float | None]:
    """Pick the group matching ``agent`` (exact product-token match
    preferred, ``*`` group fallback — RFC 9309 §2.2.1)."""
    agent = agent.lower()
    for agents, rules, delay in groups:  # exact agent match wins
        if agent != "*" and agent in agents:
            return rules, delay
    for agents, rules, delay in groups:  # then the wildcard group
        if "*" in agents:
            return rules, delay
    return [], None


def parse_robots(body: str, agent: str = "*") -> list[tuple[str, bool]]:
    """robots.txt body -> ``[(path_pattern, allow), ...]`` for the
    group matching ``agent`` (exact product-token match preferred,
    ``*`` group fallback — RFC 9309 §2.2.1).

    Full RFC 9309 pattern surface (r12 — the pre-r12 subset SKIPPED
    wildcard rules, silently fetching what they disallowed): plain
    prefixes, ``*`` wildcards (trailing ones included — match no-ops
    that still count toward longest-match specificity, the Google
    octet counting), and the trailing ``$`` end anchor all come
    through verbatim; :func:`robots_pattern_regex` tells the fast
    prefix leg from the regex leg. An empty ``Disallow:`` is the
    spec's allow-all idiom (no rule emitted). Pure function;
    unit-tested without Spark; :func:`robots_filter` applies the
    result distributively."""
    return _robots_group_for(_robots_groups(body), agent)[0]


def parse_crawl_delay(body: str, agent: str = "*") -> float | None:
    """``Crawl-delay:`` seconds for the group matching ``agent``
    (same group-selection rules as :func:`parse_robots`); None when
    the matched group declares none. Non-standard but near-universal
    in the wild; :func:`..operators.linkgraph.fetch_schedule` turns it
    into a per-host slot stride. Pure function."""
    return _robots_group_for(_robots_groups(body), agent)[1]


def robots_rules_df(
    robots: DataFrame, agent: str = "*", host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, robots.txt body) table -> exploded rule table
    ``(host, prefix, allow, prefix_len, regex)`` via
    :func:`parse_robots`. ``regex`` is NULL for plain prefixes (the
    fast ``startswith`` leg) and the :func:`robots_pattern_regex`
    translation for wildcard/anchored patterns; ``prefix_len`` is the
    pattern's octet length — the RFC 9309 longest-match specificity,
    wildcards counted (the Google reading). Bodies parse once per
    host (not per page); the result is the small broadcastable side
    of :func:`robots_filter` — a crawl of millions of hosts yields a
    rules table of tens of millions of short rows, still joinable
    (pass ``broadcast_rules=False`` there)."""
    import pandas as pd

    def _explode(batches):
        for pdf in batches:
            out = []
            for host, body in zip(pdf["_h"], pdf["_b"]):
                for pattern, allow in parse_robots(body or "", agent):
                    out.append((
                        host, pattern, allow, len(pattern),
                        robots_pattern_regex(pattern),
                    ))
            yield pd.DataFrame(
                out,
                columns=["host", "prefix", "allow", "prefix_len", "regex"],
            )

    return robots.select(
        F.col(host_col).alias("_h"), F.col(body_col).alias("_b")
    ).mapInPandas(
        _explode,
        schema="host string, prefix string, allow boolean,"
               " prefix_len int, regex string",
    )


def robots_delays_df(
    robots: DataFrame, agent: str = "*", host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, robots.txt body) table -> ``(host, crawl_delay)`` via
    :func:`parse_crawl_delay`; hosts whose matched group declares no
    delay are OMITTED (a left join downstream reads absent = no
    constraint). Same scale shape as :func:`robots_rules_df`: bodies
    parse once per host, the result is O(hosts) short rows — the small
    side of :func:`..operators.linkgraph.fetch_schedule`'s delay
    join."""
    import pandas as pd

    def _delays(batches):
        for pdf in batches:
            out = []
            for host, body in zip(pdf["_h"], pdf["_b"]):
                d = parse_crawl_delay(body or "", agent)
                if d is not None:
                    out.append((host, d))
            yield pd.DataFrame(out, columns=["host", "crawl_delay"])

    return robots.select(
        F.col(host_col).alias("_h"), F.col(body_col).alias("_b")
    ).mapInPandas(_delays, schema="host string, crawl_delay double")


def robots_filter(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Drop rows a robots.txt rule disallows — RFC 9309 longest-match
    evaluation: among the matching rules for a URL's (host, path) the
    LONGEST prefix wins, ties go to allow, and no matching rule (or no
    robots entry for the host) means allowed.

    ``rules``: the table from :func:`robots_rules_df` (host, prefix,
    allow, prefix_len[, regex]) — a pre-r12 persisted table without
    the ``regex`` column still works (all rules match as prefixes).

    Plan (r13 — ZERO page-side exchange): the rules first collapse to
    ONE row per host carrying its rule array (an exchange of the
    small rules table only), broadcast by default; pages then
    broadcast-left-join on host with no fan-out (exactly one rule-array
    row per host), and the RFC 9309 longest-match verdict evaluates
    per page row as pure higher-order codegen —
    ``filter`` keeps the matching rules (``startswith`` for plain
    prefixes, ``regexp_like`` for the wildcard/anchored minority; the
    per-rule pattern is array data, which Spark's RLIKE accepts as a
    non-foldable pattern), ``array_max`` over ``struct(prefix_len,
    allow)`` picks the winner, and an empty/absent match list is a
    NULL verdict (= allowed). The r12 form paid one full exchange of
    the page side (``groupBy`` on a row id after the rule fan-out,
    itself the fix for the r11 nondeterministic id join-back); in the
    streaming crawl's hot path that was the batch's only shuffle —
    now the whole filter is map-only on the pages, duplicates need no
    special casing, and there is no row id at all. Matching is on the
    path PLUS the query when present (r12 — the RFC 9309 match
    target; real wildcard rules overwhelmingly aim at query strings,
    e.g. ``Disallow: /*?sessionid=``); the fragment never reaches a
    server so it is excluded."""
    host = U.url_host(F.col(url_col))
    path_raw = U.url_path(F.col(url_col))
    query = U.url_query(F.col(url_col))
    target = F.concat(
        F.when(path_raw == "", "/").otherwise(path_raw),
        F.when(query == "", "").otherwise(F.concat(F.lit("?"), query)),
    )
    if "regex" not in rules.columns:  # pre-r12 persisted rule tables
        rules = rules.withColumn("regex", F.lit(None).cast("string"))
    # re-validate PERSISTED rules (r16 fix-chain review): the
    # interior-wildcard cap guards at parse time, but this function's
    # back-compat contract accepts rule tables persisted BEFORE the
    # cap existed — a stored hostile k>=3 regex would still wedge the
    # match. Each collapsed wildcard is exactly one '.*' in the
    # translation (literal dots escape to '\.'), and a trailing
    # '.*' / '.*$' never backtracks, so the cap re-derives from the
    # regex itself — once per RULE on the small side, never per page.
    rx = F.col("regex")
    n_wild = (F.length(rx) - F.length(F.replace(rx, F.lit(".*"), F.lit("")))) / 2
    trailing = (rx.endswith(".*") | rx.endswith(".*$")).cast("int")
    rules = rules.filter(
        rx.isNull()
        | ((n_wild - trailing) <= ROBOTS_MAX_INTERIOR_WILDCARDS)
    )
    by_host = rules.groupBy(F.col("host").alias("_rhost")).agg(
        F.collect_list(
            F.struct("prefix", "allow", "prefix_len", "regex")
        ).alias("_rules")
    )
    if broadcast_rules:
        by_host = F.broadcast(by_host)
    keyed = (
        df.withColumn("_host", host)
        .withColumn("_path", target)
        .withColumn("_plen", F.length("_path"))
    )
    joined = keyed.join(
        by_host, on=keyed["_host"] == by_host["_rhost"], how="left"
    )
    path_c = F.col("_path")
    # regex rules only evaluate against bounded targets (r16 ReDoS
    # guard): even the capped two-interior-wildcard patterns are
    # O(n^2) against a crafted target, so a hostile host minting
    # megabyte URLs could still wedge the match — targets over
    # ROBOTS_REGEX_MATCH_MAX skip regex rules. Skipping beats
    # truncating (a truncated target could falsely satisfy a $
    # anchor), and the verdict on such a URL is "whatever the PREFIX
    # rules say" — that can land on either side: a Disallow regex
    # skipped under-blocks, and an Allow regex that would have
    # rescued a matching Disallow prefix over-blocks. Both are
    # deterministic and confined to >2KB URLs, themselves a refusal
    # shape. ``_plen`` is computed once per row, not per rule
    # (higher-order lambdas get no subexpression elimination).
    plen_c = F.col("_plen")
    matched = F.filter(
        F.col("_rules"),
        lambda r: F.when(
            r["regex"].isNull(), path_c.startswith(r["prefix"])
        ).otherwise(
            (plen_c <= ROBOTS_REGEX_MATCH_MAX)
            & F.regexp_like(path_c, r["regex"])
        ),
    )
    # array_max orders structs field-by-field: longest prefix wins,
    # ties go to allow (true > false) — the RFC 9309 evaluation
    top = F.array_max(
        F.transform(matched, lambda r: F.struct(r["prefix_len"], r["allow"]))
    )
    page_cols = [c for c in df.columns]
    return (
        joined.withColumn("_top", top)
        .filter(F.col("_top").isNull() | F.col("_top.allow"))
        .select(*page_cols)
    )


def domain_blocklist_filter(
    df: DataFrame,
    blocked: DataFrame | Sequence[str],
    url_col: str = "url",
) -> DataFrame:
    """Drop rows whose registrable domain is blocklisted.

    ``blocked``: a one-column DataFrame (column ``domain``) or a plain
    sequence of domains. Blocklists are small (thousands-to-millions of
    domains, not billions of rows) — broadcast anti-join, zero shuffle
    of the corpus side. Matching is on the registrable domain, so a
    blocked ``spam.example`` also drops ``cdn.spam.example``."""
    spark = df.sparkSession
    if not isinstance(blocked, DataFrame):
        blocked = spark.createDataFrame(
            [(d.lower(),) for d in blocked], "domain string"
        )
    dom = U.registrable_domain(U.url_host(F.col(url_col)))
    return (
        df.withColumn("_dom", dom)
        .join(
            F.broadcast(blocked.select(F.lower("domain").alias("_dom")).distinct()),
            on="_dom",
            how="left_anti",
        )
        .drop("_dom")
    )


#: web_quality_filter gate vocabulary, in application order: C4 line
#: cleaning rewrites the text first, the Gopher quality rules judge the
#: (possibly cleaned) text, the Gopher repetition rules run last.
GATE_TOKENS = ("c4", "gopher", "rep")


def parse_quality_gate(gate: str) -> tuple[str, ...]:
    """Validate a ``'+'``-joined gate spec against :data:`GATE_TOKENS`
    and return the tokens in canonical application order. Shared by
    :func:`web_quality_filter` and the streaming crawl's
    ``quality_gate`` option."""
    toks = gate.split("+") if isinstance(gate, str) else []
    if (
        not toks
        or len(set(toks)) != len(toks)
        or any(t not in GATE_TOKENS for t in toks)
    ):
        raise ValueError(
            "gate must be a '+'-combination of "
            f"{'/'.join(GATE_TOKENS)}, got {gate!r}"
        )
    return tuple(t for t in GATE_TOKENS if t in toks)


def web_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    gate: str = "c4+gopher",
) -> DataFrame:
    """C4 / Gopher page-quality gate over a batch frame — the shared
    leg behind ``curate_cli web-quality`` and the streaming crawl's
    ``quality_gate`` option (streaming/pipeline.py), composing the
    oracle-certified exprs of :mod:`..functions.quality`.

    ``gate`` is a ``'+'``-combination of: ``'c4'`` (line cleaning +
    document gates; REWRITES ``text_col`` to the cleaned text),
    ``'gopher'`` (document-quality rules, text untouched), ``'rep'``
    (the Table A1 repetition rules — dup line/paragraph fractions,
    top/duplicate n-gram char coverage). ``'c4+gopher'`` is the
    FineWeb order — C4 first, later gates judge the CLEANED text.
    Pure map-only codegen: zero exchanges, zero Python, filters
    evaluated scan-side — at 100 TB the gate adds nothing to shuffle
    volume."""
    from data_ingestion_tool_bakasura__spark.functions import quality as Q

    toks = parse_quality_gate(gate)
    out = df
    if "c4" in toks:
        out = out.filter(Q.c4_doc_keep(F.col(text_col))).withColumn(
            text_col, Q.c4_clean(F.col(text_col))
        )
    if "gopher" in toks:
        out = out.filter(Q.gopher_keep(F.col(text_col)))
    if "rep" in toks:
        # bound-column path: one array derivation per signal family
        # instead of one per threshold (see with_gopher_rep_signals)
        sig_cols = [*Q.GOPHER_REP_THRESHOLDS, "__rep_keep__"]
        out = (
            Q.with_gopher_rep_signals(out, text_col, keep_col="__rep_keep__")
            .filter(F.col("__rep_keep__"))
            .drop(*sig_cols)
        )
    return out


def host_rank_filter(
    df: DataFrame,
    ranks: DataFrame,
    url_col: str = "url",
    min_rank: float = 0.0,
    keep_unranked: bool = True,
    rank_col: str = "rank",
    node_col: str = "node",
) -> DataFrame:
    """Frontier-prioritization gate: keep pages whose registrable
    domain's link-graph rank (``linkgraph.pagerank`` output, persisted
    like the DSIR ratios) clears ``min_rank`` — the Common-Crawl-style
    host-quality prior, applied BEFORE fetch/extract cost is spent.

    ``keep_unranked=True`` (default) lets hosts absent from the rank
    table through annotated with a NULL ``host_rank`` — a crawler must
    not starve newly-discovered hosts; False drops them (closed-world
    curation of an already-ranked snapshot). Appends ``host_rank``
    either way.

    Scale shape: ONE join on the domain key. The rank table is
    O(hosts) — millions of rows at crawl scale — so it is deliberately
    NOT broadcast (the persisted-domain-count precedent); Spark/AQE
    may still choose broadcast when a small snapshot fits."""
    dom = U.registrable_domain(U.url_host(F.col(url_col)))
    r = ranks.select(
        F.col(node_col).alias("_hr_dom"),
        F.col(rank_col).cast("double").alias("host_rank"),
    )
    out = df.withColumn("_hr_dom", dom).join(r, "_hr_dom", "left").drop("_hr_dom")
    cond = F.col("host_rank") >= F.lit(float(min_rank))
    if keep_unranked:
        cond = cond | F.col("host_rank").isNull()
    return out.filter(cond)


def language_filter(
    df: DataFrame,
    profiles: DataFrame,
    allowed_langs=None,
    text_col: str = "text",
    id_col: str = "url",
    broadcast_profiles: bool = True,
    keep_und: bool = True,
) -> DataFrame:
    """Language gate over a batch frame (the FineWeb position: after
    extraction, BEFORE the quality rules — their thresholds are
    language-specific): classify each page with the persisted
    char-trigram profiles (``sampling.fit_lang_profiles`` /
    ``trigram_lang_id``, the oracle-checked C16 path) and keep only
    pages whose guess is in ``allowed_langs`` (None keeps everything
    and just annotates). Appends a ``lang`` column either way.

    ``keep_und`` (default True, mirroring ``host_rank_filter``'s
    ``keep_unranked``): pages the classifier cannot call — guess
    ``'und'`` (fewer than 3 normalized chars) or a missing prediction
    row — survive an ``allowed_langs`` gate rather than silently
    vanishing; pass False for a strict gate that drops them.

    Scale shape is trigram_lang_id's: one (page, trigram) partial-agg
    exchange x a broadcast profile join -> argmax window on the page
    key. The gate itself adds one broadcast semi-join of (id, guess)
    back onto the pages — text never shuffles."""
    from data_ingestion_tool_bakasura__spark.operators.sampling import (
        trigram_lang_id,
    )

    pred = trigram_lang_id(
        df, profiles, text_col=text_col, id_col=id_col,
        broadcast_profiles=broadcast_profiles,
    ).select(F.col(id_col), F.col("guess").alias("lang"))
    out = df.join(pred, id_col, "left")
    if allowed_langs is not None:
        gate = F.col("lang").isin(list(allowed_langs))
        if keep_und:
            gate = gate | F.col("lang").isNull() | (F.col("lang") == "und")
        out = out.filter(gate)
    return out


# --- sitemaps (r11: crawl bootstrap / recrawl scheduling) -------------------


def robots_sitemaps(body: str) -> list[str]:
    """``Sitemap:`` directives from a robots.txt body (RFC 9309 §2.3 /
    sitemaps.org autodiscovery). Group-independent per the protocol —
    collected from anywhere in the file, order preserved, duplicates
    kept (callers normalize+dedup). Pure function."""
    out: list[str] = []
    for line in (body or "").splitlines():
        line = line.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, value = line.split(":", 1)
        if field.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def sitemap_xml_of(payload) -> str:
    """Gzip-transparent sitemap payload -> XML text (r12). Real-world
    sitemaps are predominantly ``.xml.gz`` and ``sitemapindex``
    children routinely point at gzipped files, so the sniff runs
    BEFORE parsing: bytes starting with the gzip magic ``1f 8b``
    decompress first (multi-member streams concatenate — the
    ``sources/warc.py parse_warc_records`` precedent), then decode
    UTF-8 with replacement. A string payload passes through verbatim,
    except the salvage case of gzip bytes smuggled through a lossless
    latin-1 decode (re-encoded and decompressed; anything that fails
    falls back to the raw string, which :func:`parse_sitemap`'s
    tolerant path then treats as malformed XML). Pure function."""
    import zlib

    from data_ingestion_tool_bakasura__spark.sources.warc import _bounded_gunzip

    # gzip surfaces corruption as BadGzipFile (OSError), truncation as
    # EOFError, and checksum/stream damage as zlib.error — all read as
    # "not actually decompressable", tolerant fallback to the raw text.
    # ValueError is the inflate-budget refusal (r17 decompression-bomb
    # wave: a hostile host's 1 MiB sitemap.xml.gz inflated unbounded
    # here — _bounded_gunzip is the warc.py member decompressor, same
    # budget, semantics identical to gzip.decompress on non-bombs);
    # an over-budget sitemap degrades to the raw-bytes fallback, which
    # parses to zero entries — one hostile host must not kill the task.
    gz_errors = (OSError, EOFError, zlib.error, ValueError)
    if isinstance(payload, (bytes, bytearray, memoryview)):
        b = bytes(payload)
        if b[:2] == b"\x1f\x8b":
            try:
                b = _bounded_gunzip(b)
            except gz_errors:
                pass  # truncated/corrupt/bomb member: parse what we got
        return b.decode("utf-8", errors="replace")
    s = payload or ""
    if s[:2] == "\x1f\x8b":
        try:
            return _bounded_gunzip(s.encode("latin-1")).decode(
                "utf-8", errors="replace"
            )
        except gz_errors + (UnicodeEncodeError,):
            return s
    return s


def parse_sitemap(xml: str) -> list[tuple[str, str | None, bool]]:
    """sitemaps.org XML -> ``[(loc, lastmod, is_index), ...]``.

    Handles both document kinds: ``<urlset>`` page entries
    (is_index=False) and ``<sitemapindex>`` child-sitemap entries
    (is_index=True); namespace-agnostic (``{*}`` wildcard match);
    entries without ``<loc>`` are skipped; ``lastmod`` is passed
    through verbatim (W3C datetime — callers cast). Malformed XML
    returns what a tolerant regex pass can salvage rather than
    raising (real-web sitemaps are frequently invalid)."""
    import re
    import xml.etree.ElementTree as ET

    out: list[tuple[str, str | None, bool]] = []
    try:
        root = ET.fromstring(xml or "")
        is_index = root.tag.endswith("sitemapindex")
        for entry in root.iter():
            if not (entry.tag.endswith("}url") or entry.tag.endswith("}sitemap")
                    or entry.tag in ("url", "sitemap")):
                continue
            loc = entry.find("{*}loc")
            if loc is None:
                loc = entry.find("loc")
            if loc is None or not (loc.text or "").strip():
                continue
            lastmod = entry.find("{*}lastmod")
            if lastmod is None:
                lastmod = entry.find("lastmod")
            out.append((
                (loc.text or "").strip(),
                (lastmod.text or "").strip() if lastmod is not None
                and (lastmod.text or "").strip() else None,
                is_index,
            ))
        return out
    except ET.ParseError:
        is_index = "<sitemapindex" in (xml or "")
        for m in re.finditer(r"<loc>\s*([^<\s][^<]*?)\s*</loc>", xml or ""):
            out.append((m.group(1), None, is_index))
        return out


def sitemap_entries(
    df: DataFrame,
    xml_col: str = "xml",
    src_col: str = "url",
) -> DataFrame:
    """Explode fetched sitemap documents into typed entry rows
    (src, loc, lastmod timestamp-or-NULL, is_index) via ONE
    Arrow-batched parse pass — map-only; feed the is_index rows back
    to the fetcher and the page rows to ``frontier_expand`` /
    ``url_dedup`` as crawl seeds.

    Gzip-transparent (r12): ``xml_col`` may be a BINARY column of raw
    fetched bytes — ``.xml.gz`` payloads (the dominant real-world
    shape, for urlsets and sitemapindex children alike) sniff on the
    ``1f 8b`` magic and decompress before the parse
    (:func:`sitemap_xml_of`); plain-text payloads and string columns
    flow through unchanged, so the decode is invisible to the
    entry-level semantics (and to the oracle)."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.ArrayType(T.StructType([
        T.StructField("loc", T.StringType()),
        T.StructField("lastmod", T.StringType()),
        T.StructField("is_index", T.BooleanType()),
    ]))

    @F.pandas_udf(schema)
    def _parse(s):
        return pd.Series([parse_sitemap(sitemap_xml_of(x)) for x in s])

    out = df.select(
        F.col(src_col).alias("src"),
        F.explode(_parse(F.col(xml_col))).alias("_e"),
    )
    return out.select(
        "src",
        F.col("_e.loc").alias("loc"),
        F.to_timestamp(F.col("_e.lastmod")).alias("lastmod"),
        F.col("_e.is_index").alias("is_index"),
    )


def canonical_dedup(
    df: DataFrame,
    url_col: str = "url",
    canonical_col: str = "canonical",
    order_col: str | None = None,
) -> DataFrame:
    """URL dedup that honors ``<link rel=canonical>`` (the htmlmeta
    extraction): a page's identity key is its NORMALIZED canonical
    URL when the page declares one, else its own normalized URL — so
    syndicated copies and parameterized variants that all point at one
    canonical collapse to a single survivor even when their fetch URLs
    normalize differently.

    Survivor choice and plan shape are ``url_dedup``'s: deterministic
    (``order_col`` ascending, else the raw url string), ONE exchange on
    the identity key. Adds ``canon_key``."""
    key = U.url_normalize(
        F.coalesce(F.col(canonical_col), F.col(url_col))
    )
    out = df.withColumn("canon_key", key)
    order = F.col(order_col) if order_col else F.col(url_col)
    w = Window.partitionBy("canon_key").orderBy(order)
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def recrawl_candidates(
    entries: DataFrame,
    corpus: DataFrame,
    loc_col: str = "loc",
    lastmod_col: str = "lastmod",
    corpus_url_col: str = "norm_url",
    fetched_col: str = "fetched_at",
) -> DataFrame:
    """Recrawl scheduling from sitemap freshness: pages the corpus has
    ALREADY landed whose sitemap ``lastmod`` is newer than the stored
    fetch time — the refresh list a maintenance crawl fetches first
    (new-URL discovery is ``frontier_expand``'s job; this is the other
    half of sitemap-driven maintenance).

    Entries without a lastmod are skipped (unknown freshness — recrawl
    policy for those is TTL-based, not sitemap-based). One exchange:
    normalize the locs, inner-join the corpus on the URL key, keep
    rows with ``lastmod > fetched_at``. Output: (norm_url, lastmod,
    fetched_at) — feed to ``fetch_schedule`` after a domain window."""
    locs = entries.filter(F.col(lastmod_col).isNotNull()).select(
        U.url_normalize(F.col(loc_col)).alias("norm_url"),
        F.col(lastmod_col).alias("lastmod"),
    ).groupBy("norm_url").agg(F.max("lastmod").alias("lastmod"))
    seen = corpus.select(
        F.col(corpus_url_col).alias("norm_url"),
        F.col(fetched_col).alias("fetched_at"),
    )
    return locs.join(seen, "norm_url").filter(
        F.col("lastmod") > F.col("fetched_at")
    )
