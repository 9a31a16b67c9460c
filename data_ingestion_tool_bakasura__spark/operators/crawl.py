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
