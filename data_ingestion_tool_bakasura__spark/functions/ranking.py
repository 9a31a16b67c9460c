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

import pandas as pd

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


def default_rerank_scorer(query: str, texts) -> "object":
    """Deterministic cross-encoder stand-in (the pluggable-provider
    pattern of `functions/embed.py`): query-term coverage blended with
    in-order bigram continuity — crude, but rank-meaningful and
    bit-reproducible, so the rerank seam is testable without a model.
    Signature is the seam contract: ``(query: str, texts: pd.Series)
    -> pd.Series[float]`` — a real cross-encoder (e.g. any
    sentence-pair scorer) drops in unchanged."""
    q = query.lower().split()
    qset = set(q)
    bigrams = [f"{a} {b}" for a, b in zip(q, q[1:])]

    def _score(t) -> float:
        toks = (t or "").lower().split()
        if not toks or not qset:
            return 0.0
        coverage = len(qset & set(toks)) / len(qset)
        joined = " ".join(toks)
        cont = (
            sum(1 for bg in bigrams if bg in joined) / len(bigrams)
            if bigrams else 0.0
        )
        return round(0.7 * coverage + 0.3 * cont, 6)

    return texts.map(_score)


def cross_rerank(
    candidates: DataFrame,
    query: str,
    scorer=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    score_col: str = "rerank",
) -> DataFrame:
    """Second-stage semantic rerank over a BOUNDED candidate list —
    the reference's ``SemanticConfiguration`` shape (``db_utils.py:
    112-118``: Azure reranks the fused top-50 with a cross-encoder,
    never the corpus). ``candidates`` must already be a cut top-N
    (RRF fusion, BM25, or ANN output); the scorer runs as ONE
    Arrow-batched pandas UDF over those N rows only, so the expensive
    pairwise model is O(candidates), not O(corpus) — the stage-2 cost
    model every production reranker assumes.

    ``scorer=None`` uses :func:`default_rerank_scorer`; pass any
    ``(query, texts: pd.Series) -> pd.Series[float]`` callable to
    serve a real model. Returns the input columns plus ``score_col``,
    cut to top-k by (score desc, id asc)."""
    from pyspark.sql.functions import pandas_udf

    fn = scorer or default_rerank_scorer

    @pandas_udf("double")
    def _rr(texts: pd.Series) -> pd.Series:
        return pd.Series(fn(query, texts), dtype="float64")

    return (
        candidates.withColumn(score_col, _rr(F.col(text_col)))
        .orderBy(F.desc(score_col), F.col(id_col))
        .limit(k)
    )
