"""Reproducible corpus sampling / splitting / curation (C16 extensions).

The reference has no sampling surface; these are the training-data
pipeline operators the brief mandates alongside dedup and similarity:
deterministic train/val/test splits, per-stratum subsampling, token
budget selection and benchmark-contamination checks. All of them are
built on HASH bucketing, not ``rand()``: at 100 TB a sample must be
reproducible across retries, speculative tasks and engine versions, so
membership is a pure function of the row key (md5, as in the engine's
MinHash — one digest, 52 bits, DuckDB-reproducible via
``('0x' || substr(md5(..),1,13))::BIGINT``).

Design for 100 TB:
- bucketing is a per-row expression — no shuffle, no driver state, and
  Catalyst pushes the resulting filter straight onto the scan.
- stratified rates compile to one CASE expression — no per-stratum
  anti-join plans.
- token-budget selection is a single window cumulative sum; the sort is
  the only shuffle, and at scale becomes a range-partitioned global
  sort (documented tiebreak keeps it deterministic).
- n-gram contamination joins on the gram hash, so the shuffle carries
  (gram, id) pairs sized by corpus token count, and the (small)
  benchmark side is broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from data_ingestion_tool_bakasura__spark.functions.text import normalize_text

#: bucket granularity — rates are exact multiples of 1/10000
N_BUCKETS = 10_000


def hash_bucket(id_col: Column | str, salt: str = "split",
                n_buckets: int = N_BUCKETS) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5(salt ':' id).

    13 hex chars = 52 bits, exact in a BIGINT both here and in the
    DuckDB oracle (``('0x' || substr(md5(s),1,13))::BIGINT % n``)."""
    key = F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string") if isinstance(id_col, str) else id_col.cast("string"))
    h = F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(n_buckets))


def hash_split(df: DataFrame, id_col: str, weights: dict[str, float],
               salt: str = "split", split_col: str = "split") -> DataFrame:
    """Assign every row to a named split (e.g. train/val/test) by hash
    bucket: reproducible, stable under row order, retries and data
    growth of other partitions. Weights must sum to 1."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(id_col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(round(acc * N_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def hash_sample(df: DataFrame, id_col: str, rate: float,
                salt: str = "sample") -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows (by id hash)."""
    return df.filter(hash_bucket(id_col, salt) < int(round(rate * N_BUCKETS)))


def stratified_hash_sample(df: DataFrame, id_col: str, strata_col: str,
                           rates: dict[str, float], default_rate: float = 0.0,
                           salt: str = "sample") -> DataFrame:
    """Per-stratum deterministic subsampling (corpus mixing): e.g. keep
    100% of books, 10% of web. Compiles to one CASE threshold per
    stratum — a single scan + filter, no per-stratum plans."""
    bucket = hash_bucket(id_col, salt)
    thresh = None
    for k, r in rates.items():
        t = int(round(r * N_BUCKETS))
        thresh = (F.when(F.col(strata_col) == k, t) if thresh is None
                  else thresh.when(F.col(strata_col) == k, t))
    thresh = thresh.otherwise(int(round(default_rate * N_BUCKETS))) if thresh is not None else F.lit(int(round(default_rate * N_BUCKETS)))
    return df.filter(bucket < thresh)


def token_budget_select(df: DataFrame, score_col: str, token_col: str,
                        budget: int, tiebreak_col: str,
                        n_buckets: int | None = None,
                        checkpoint: bool = True) -> DataFrame:
    """Highest-scored rows whose cumulative token count fits ``budget``
    (corpus curation under a training-token budget), deterministic in
    (score desc, tiebreak) order.

    Scale design — a naive ``sum() OVER (ORDER BY score)`` is a
    single-partition window (the whole corpus in one task). Instead, a
    two-phase distributed prefix sum:

    1. approx score quantiles define value-based buckets (bucket is a
       pure monotone function of score, so equal scores always share a
       bucket and (bucket asc, score desc, tiebreak) IS the global
       order);
    2. a column-pruned pass computes per-bucket token totals -> driver
       (``n_buckets`` scalars) -> cumulative offsets, and buckets whose
       offset already exceeds the budget are dropped BEFORE the heavy
       pass (at scale only the winning prefix of the corpus is ever
       sorted);
    3. the cumulative sum is a per-bucket window (hash-partitioned
       exchange, one task per bucket) plus the broadcast offset.

    Caveat: heavily-quantized scores collapse quantile boundaries, so a
    single over-popular score value degrades that one bucket to one
    task (never worse than the naive plan).

    ``checkpoint`` (default on) localCheckpoints ``df`` first so the
    quantile, totals and window passes read materialized scalars
    instead of recomputing the scoring lineage three times (measured
    21s -> ~3s at sf0.1 when the score is regexp-derived). PROJECT
    BEFORE CALLING: everything in ``df`` is materialized, so pass only
    (id, score, tokens)-shaped columns — at corpus scale that is tens
    of bytes per row, which is exactly what you'd persist anyway.
    """
    spark = df.sparkSession
    if checkpoint:
        df = df.localCheckpoint(eager=True)
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    score = F.col(score_col)
    bounds: list[float] = []
    if n_buckets > 1:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = sorted(set(df.stat.approxQuantile(score_col, probs, 0.001)),
                        reverse=True)
    if bounds:
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        # number of boundaries strictly above this score: 0 = top bucket
        bucket = F.aggregate(
            barr, F.lit(0),
            lambda acc, b: acc + F.when(b > score, 1).otherwise(0),
        )
    else:
        bucket = F.lit(0)
    d = df.withColumn("_tb_bucket", bucket)

    # Phase 2: per-bucket totals. Catalyst prunes this branch to
    # (score, token) columns; recomputing the pruned lineage is the
    # documented price of a prefix sum without caching 100 TB.
    totals = {
        r["_tb_bucket"]: r["t"]
        for r in d.groupBy("_tb_bucket").agg(F.sum(token_col).alias("t")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b] or 0
    keep = [b for b, off in offsets.items() if off < budget]
    if not keep:
        return df.filter(F.lit(False))
    max_keep = max(keep)
    off_df = spark.createDataFrame(
        [(int(b), int(offsets[b])) for b in keep],
        "_tb_bucket int, _tb_off bigint",
    )

    # Phase 3: local running sum per bucket + broadcast offset.
    w = (
        Window.partitionBy("_tb_bucket")
        .orderBy(score.desc(), F.col(tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.filter(F.col("_tb_bucket") <= max_keep)
        .withColumn("_tb_cum", F.sum(token_col).over(w))
        .join(F.broadcast(off_df), "_tb_bucket")
        .filter(F.col("_tb_off") + F.col("_tb_cum") <= budget)
        .drop("_tb_bucket", "_tb_cum", "_tb_off")
    )


def word_ngrams(text_col: Column | str, n: int) -> Column:
    """Distinct word n-grams of the normalized text; texts shorter than
    ``n`` tokens contribute their whole token run (MinHash shingle
    convention, documents_q.py oracle parity)."""
    toks = F.split(normalize_text(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.array_distinct(
        F.when(F.size(toks) < n, F.array(F.array_join(toks, " "))).otherwise(grams)
    )


def ngram_overlap(corpus: DataFrame, probe: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 8) -> DataFrame:
    """Benchmark-contamination check: corpus rows sharing at least one
    word ``n``-gram with any probe (benchmark) row, with the overlap
    size -> (id_col, n_shared_grams, n_probe_docs).

    The join key is the n-gram string; the probe side (a benchmark) is
    small by definition and broadcast, so the corpus side never
    shuffles — the gram explode is map-side and the only aggregation is
    the per-doc count."""
    c_grams = corpus.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("gram")
    )
    p_grams = (
        probe.select(F.explode(word_ngrams(text_col, n)).alias("gram"),
                     F.col(id_col).alias("probe_id"))
        .distinct()
    )
    return (
        c_grams.join(F.broadcast(p_grams), "gram")
        .groupBy(id_col)
        .agg(
            F.countDistinct("gram").alias("n_shared_grams"),
            F.countDistinct("probe_id").alias("n_probe_docs"),
        )
    )
