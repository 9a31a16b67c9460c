"""Reusable relevance ranking (B8/B10): one-scan Okapi BM25 and
Reciprocal Rank Fusion.

Extracted from the certified catalog queries (q_bm25_topdocs /
q_hybrid_rrf keep their oracles and now delegate here) so the SAME
scoring serves any table — in particular :class:`~..index_client
.IndexClient`'s text/hybrid search over the ingest index, the leg the
reference delegates to Azure Search's ``search_text=`` scoring
(``db_utils.py:135-146``).

Scale shape (PLANS.md "q_bm25_topdocs"): tf, df and per-doc length all
come from ONE text scan (doc length is projected before the explode
and re-aggregated with first); corpus size and average length are a
1-row broadcast; df is a window count over the tiny (doc, term) table;
the final ranking is orderBy+limit -> TakeOrderedAndProject
(distributed partial top-k, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    df: DataFrame,
    terms: list[str] | tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    lowercase: bool = True,
) -> DataFrame:
    """Okapi BM25 of each document against the query terms; returns
    ``(id_col, bm25)`` for documents matching at least one term,
    ``bm25`` rounded to 6 decimals. ``lowercase`` (default) matches
    case-insensitively — the search-client behavior; the certified
    catalog query passes False to keep its case-sensitive oracle."""
    if not terms:
        raise ValueError("bm25_scores: empty term set")
    toks_arr = F.split(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " ")
    stats = F.broadcast(
        df.agg(
            F.count("*").cast("double").alias("n_docs"),
            F.avg(F.size(toks_arr)).alias("avgdl"),
        )
    )
    tk = F.lower("tk") if lowercase else F.col("tk")
    terms = [t.lower() for t in terms] if lowercase else list(terms)
    toks = df.select(
        F.col(id_col), F.size(toks_arr).alias("dl"), F.explode(toks_arr).alias("tk")
    ).filter(tk.isin(*terms))
    tf = toks.groupBy(id_col, "tk").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    return (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("tk")))
        .join(stats)
        .withColumn("w", idf * F.col("tf") * (k1 + 1) / denom)
        .groupBy(id_col)
        .agg(F.round(F.sum("w"), 6).alias("bm25"))
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str] | tuple[str, ...],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Top-k by BM25, deterministic (score desc, id asc) —
    TakeOrderedAndProject, no global sort."""
    return (
        bm25_scores(df, terms, id_col=id_col, text_col=text_col, lowercase=lowercase)
        .orderBy(F.desc("bm25"), F.col(id_col))
        .limit(k)
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str,
    rank_a: str = "r_a",
    rank_b: str = "r_b",
    k: int = 60,
    topn: int = 20,
) -> DataFrame:
    """Reciprocal Rank Fusion of two rank lists (Cormack et al. 2009):
    ``score = sum 1/(k + rank)`` over the legs an id appears in; a
    missing leg contributes 0 (full outer join). Inputs are BOUNDED
    rank lists (each leg cut to its own top-N first), so the fuse is a
    tiny join — never corpus-sized."""
    a = ranked_a.select(id_col, rank_a)
    b = ranked_b.select(id_col, rank_b)
    both = a.join(b, id_col, "outer")
    score = F.round(
        F.coalesce(1.0 / (F.lit(k) + F.col(rank_a)), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(k) + F.col(rank_b)), F.lit(0.0)),
        6,
    )
    return (
        both.withColumn("rrf", score)
        .orderBy(F.desc("rrf"), F.col(id_col))
        .limit(topn)
    )
