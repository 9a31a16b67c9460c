"""ANN tuning harness: recall@k vs candidate scan fraction per LSH config.

The reference declares HNSW recall knobs (m=4, efConstruction=400,
efSearch=500 — ``db_utils.py:93-110``) but never issues a vector query.
The Spark-native substitute exposes the analogous trade: ``num_tables``
(recall, like efSearch) and ``bits`` (bucket selectivity, like m). This
harness measures both sides of the trade against exact brute-force
ground truth so the defaults in ``ANN.md`` are pinned by data, not
vibes. Usage:

    python tools/ann_tuning.py [sf_dir] [k]

Prints a markdown table: config -> recall@k, mean/max candidates per
query, scan fraction.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    sys.path.insert(0, "/root/repo")
    from data_ingestion_tool_bakasura__spark.operators import similarity as S
    from data_ingestion_tool_bakasura__spark.session import get_spark
    from data_ingestion_tool_bakasura__spark.sources.readers import load_table

    spark = get_spark("ann-tuning")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    n_corpus = emb.count()
    queries = emb.orderBy("vec_id").limit(15).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )

    exact = {
        (r["q_id"], r["vec_id"])
        for r in S.cosine_topk_batch(emb, queries, k=k).collect()
    }

    print(f"corpus={n_corpus} dim={dim} queries=15 k={k} sf={sf}")
    print("| tables | bits | probes | recall@k | mean cand/query | max cand/query | scan frac |")
    print("|---|---|---|---|---|---|---|")
    for tables in (2, 4, 8):
        for bits in (6, 8, 10):
            for probes in (0, 2, 4):
                ann = {
                    (r["q_id"], r["vec_id"])
                    for r in S.lsh_ann_topk(
                        emb, queries, dim=dim, k=k,
                        num_tables=tables, bits=bits, probes=probes,
                    ).collect()
                }
                recall = len(ann & exact) / len(exact)
                # candidate set size per query (pre-rescore): bucket-join matches
                keys_udf = S.lsh_bucket_keys_udf(dim, tables, bits)
                probe_udf = S.lsh_bucket_keys_udf(dim, tables, bits, probes=probes)
                ck = emb.select("vec_id", F.explode(keys_udf("embedding")).alias("bkey"))
                qk = queries.select(
                    F.col("q_id"), F.explode(probe_udf("embedding")).alias("bkey")
                )
                cand = (
                    ck.join(F.broadcast(qk), "bkey")
                    .groupBy("q_id")
                    .agg(F.countDistinct("vec_id").alias("n"))
                    .agg(F.avg("n").alias("mean"), F.max("n").alias("mx"))
                    .first()
                )
                mean_c, max_c = cand["mean"] or 0.0, cand["mx"] or 0
                print(
                    f"| {tables} | {bits} | {probes} | {recall:.3f} | {mean_c:.0f} "
                    f"| {max_c} | {mean_c / n_corpus:.3f} |"
                )

    # quantized two-stage rerank: recall@k vs shortlist width (the only
    # dial; at shortlist >> k the equality contract makes recall 1.0,
    # narrower shortlists show how fast int8 candidate ranking decays)
    print()
    print("| rerank shortlist | recall@k |")
    print("|---|---|")
    for shortlist in sorted({k, 2 * k, 5 * k, 50}):
        got = {
            (r["q_id"], r["vec_id"])
            for r in S.quantized_rerank_topk(
                emb, queries, k=k, shortlist=shortlist
            ).collect()
        }
        print(f"| {shortlist} | {len(got & exact) / len(exact):.3f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
