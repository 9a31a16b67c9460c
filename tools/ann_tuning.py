"""ANN tuning harness: recall@k vs candidate scan fraction per LSH config.

The reference declares HNSW recall knobs (m=4, efConstruction=400,
efSearch=500 — ``db_utils.py:93-110``) but never issues a vector query.
The Spark-native substitute exposes the analogous trade: ``num_tables``
(recall, like efSearch) and ``bits`` (bucket selectivity, like m). This
harness measures both sides of the trade against exact brute-force
ground truth so the defaults in ``ANN.md`` are pinned by data, not
vibes. Usage:

    python tools/ann_tuning.py [sf_dir] [k] [clustered] [ivf] [lsh] [ivfadc] [rerank] [hnsw]

With ``clustered`` the corpus/queries are a deterministic
mixture-of-Gaussians embedding fixture (10 unit-sphere centers,
calibrated sigma — the shape real embedding corpora have) instead of
the near-isotropic sf fixture; ANN.md publishes both tables. ``ivf``
/ ``lsh`` / ``ivfadc`` / ``rerank`` restrict to exactly those sections
(default: ivf + lsh + rerank; ``ivfadc`` reproduces ANN.md's
raw-vs-residual PQ table).

Prints markdown tables: LSH config -> recall@k, mean/max candidates per
query, scan fraction; IVF seed-vs-kmeans centroids -> list balance and
recall@k per nprobe; quantized-rerank / PQ shortlist -> recall@k;
IVFADC raw-vs-residual codes -> recall@k per (nprobe, shortlist).
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def clustered_fixture(spark, n_corpus: int = 500, n_queries: int = 15,
                      dim: int = 64, n_clusters: int = 10, sigma: float = 0.12):
    """Deterministic mixture-of-Gaussians embeddings: cluster centers
    uniform on the unit sphere, members = center + N(0, sigma^2). Seeded
    rng -> bit-reproducible across runs. sigma=0.12 at dim=64 puts the
    mean top-10 cosine at ~0.62 (measured) — the moderately-clustered
    regime of real embedding corpora, vs 0.31 on the near-isotropic sf
    fixture; sigma=0.25 would drown the unit centers (noise norm
    sigma*sqrt(dim)=2) and reproduce the isotropic case."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    total = n_corpus + n_queries
    labels = rng.integers(0, n_clusters, size=total)
    vecs = centers[labels] + sigma * rng.standard_normal((total, dim))
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(total)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.filter(F.col("vec_id") >= n_queries), (
        df.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("q_id"), "embedding")
    )


def ivf_table(S, emb, queries, exact, k: int, n_lists: int = 8) -> None:
    """Seed vs Lloyd-refined centroids: list balance + recall@k/nprobe."""
    import statistics

    print(f"\nIVF (n_lists={n_lists}):")
    print("| centroids | list sizes min/max | balance cv | "
          + " | ".join(f"recall@{k} np={p}" for p in (1, 2, 4, n_lists)) + " |")
    print("|---|---|---|" + "---|" * 4)
    for name, cents in (
        ("md5 seeds", S.pick_seed_centroids(emb, n_lists)),
        ("kmeans x3", S.kmeans_centroids(emb, n_lists, iters=3)),
    ):
        assigned = S.ivf_assign(emb, cents).localCheckpoint(eager=True)
        sizes = [r["n"] for r in assigned.groupBy("c_id").agg(F.count("*").alias("n")).collect()]
        sizes += [0] * (n_lists - len(sizes))  # empty lists count
        cv = statistics.pstdev(sizes) / statistics.mean(sizes)
        recs = []
        for nprobe in (1, 2, 4, n_lists):
            got = {
                (r["q_id"], r["vec_id"])
                for r in S.ivf_topk(assigned, cents, queries, k=k, nprobe=nprobe).collect()
            }
            recs.append(f"{len(got & exact) / len(exact):.3f}")
        print(
            f"| {name} | {min(sizes)}/{max(sizes)} | {cv:.3f} | " + " | ".join(recs) + " |"
        )


def semdedup_table(S, DD, emb, eps_list=(0.8, 0.9)) -> None:
    """SemDeDup boundary-miss measurement: pair recall (true near-dup
    pairs co-clustered) and drop recall (vectors the cluster-local
    operator drops vs the all-pairs ground-truth drops) per n_lists.
    Quantifies ANN.md's 'n_lists is a memory/recall dial' claim."""
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
    Sim = np.round(Vn @ Vn.T, 6)
    order = np.argsort(ids)
    for eps in eps_list:
        iu = np.triu_indices(len(ids), k=1)
        hit = Sim[iu] >= eps
        truth_pairs = {
            (min(ids[a], ids[b]), max(ids[a], ids[b]))
            for a, b in zip(iu[0][hit], iu[1][hit])
        }
        # ground-truth drops: b with ANY lower-id witness, cluster-free
        gt_drop = set()
        for a, b in truth_pairs:
            gt_drop.add(b)
        if not truth_pairs:
            print(f"\neps={eps}: no true near-dup pairs at this threshold")
            continue
        print(f"\n| n_lists | true pairs (eps={eps}) | pair recall | drop recall |")
        print("|---|---|---|---|")
        for n_lists in (4, 8, 16, 32):
            cents = S.kmeans_centroids(emb, n_lists, iters=2)
            assign = {
                r["vec_id"]: r["c_id"]
                for r in S.ivf_assign(emb, cents, round_dp=6)
                .select("vec_id", "c_id").collect()
            }
            co = sum(1 for a, b in truth_pairs if assign[a] == assign[b])
            drops = {
                r["vec_id"]
                for r in DD.semantic_dedup(emb, cents, eps=eps)
                .filter("is_dup").collect()
            }
            pr = co / len(truth_pairs)
            dr = len(drops & gt_drop) / len(gt_drop) if gt_drop else 1.0
            print(f"| {n_lists} | {len(truth_pairs)} | {pr:.3f} | {dr:.3f} |")


def main() -> int:
    args = sys.argv[1:]
    sf = next((a for a in args if "/" in a), "/root/testdata/sf0.01")
    k = int(next((a for a in args if a.isdigit()), "10"))
    clustered = "clustered" in args
    # explicit tokens select exactly those sections; no token -> default set
    sections = {a for a in args if a in ("ivf", "lsh", "ivfadc", "rerank", "hnsw", "semdedup", "amortize")} or {
        "ivf", "lsh", "rerank"
    }

    sys.path.insert(0, "/root/repo")
    from data_ingestion_tool_bakasura__spark.operators import similarity as S
    from data_ingestion_tool_bakasura__spark.session import get_spark
    from data_ingestion_tool_bakasura__spark.sources.readers import load_table

    spark = get_spark("ann-tuning")
    spark.sparkContext.setLogLevel("ERROR")
    if clustered:
        emb, queries = clustered_fixture(spark)
        emb = emb.localCheckpoint(eager=True)
        queries = queries.localCheckpoint(eager=True)
    else:
        emb = load_table(spark, sf, "embeddings")
        queries = emb.orderBy("vec_id").limit(15).select(
            F.col("vec_id").alias("q_id"), "embedding"
        )
    dim = len(emb.select("embedding").first()["embedding"])
    n_corpus = emb.count()

    exact = {
        (r["q_id"], r["vec_id"])
        for r in S.cosine_topk_batch(emb, queries, k=k).collect()
    }

    src = "clustered MoG fixture" if clustered else sf
    print(f"corpus={n_corpus} dim={dim} queries=15 k={k} source={src}")
    if "ivf" in sections:
        ivf_table(S, emb, queries, exact, k)
    if "ivfadc" in sections:
        cents = S.kmeans_centroids(emb, 8, iters=2)
        print("\nIVFADC raw vs residual PQ codes (n_lists=8):")
        print("| codes | np=1 sl=50 | np=2 sl=15 | np=2 sl=25 | np=2 sl=50 |")
        print("|---|---|---|---|---|")
        for residual in (False, True):
            recs = []
            for nprobe, sl in ((1, 50), (2, 15), (2, 25), (2, 50)):
                got = {
                    (r["q_id"], r["vec_id"])
                    for r in S.ivfadc_topk(
                        emb, queries, k=k, nprobe=nprobe, shortlist=sl,
                        centroids=cents, residual=residual,
                    ).collect()
                }
                recs.append(f"{len(got & exact) / len(exact):.3f}")
            name = "residual" if residual else "raw"
            print(f"| {name} | " + " | ".join(recs) + " |")
    if "hnsw" in sections:
        from data_ingestion_tool_bakasura__spark.operators.hnsw import hnsw_topk

        print("\nHNSW (sharded executor-local; reference config m=4 efC=400):")
        print("| m | ef_search | n_shards | recall@k |")
        print("|---|---|---|---|")
        for hm, efc in ((4, 400), (8, 100)):
            for ef in (k, 4 * k, 16 * k, 500):
                for shards in (4, 16):
                    got = {
                        (r["q_id"], r["vec_id"])
                        for r in hnsw_topk(
                            emb, queries, k=k, m=hm, ef_construction=efc,
                            ef_search=ef, n_shards=shards,
                        ).collect()
                    }
                    print(f"| {hm} (efC={efc}) | {ef} | {shards} "
                          f"| {len(got & exact) / len(exact):.3f} |")

    if "amortize" in sections:
        import tempfile
        import time

        from data_ingestion_tool_bakasura__spark.operators.hnsw import (
            hnsw_index,
            hnsw_topk,
            hnsw_topk_indexed,
        )

        cfg = dict(m=8, ef_construction=100)
        print("\nHNSW build amortization (m=8 efC=100, 8 shards, ef=4k):")
        with tempfile.TemporaryDirectory() as td:
            path = td + "/hnsw_idx"
            t0 = time.time()
            hnsw_index(emb, n_shards=8, **cfg).write.parquet(path)
            build_s = time.time() - t0
            fused_t, serve_t = [], []
            fused = served = None
            for _ in range(3):
                t = time.time()
                fused = {
                    (r["q_id"], r["vec_id"])
                    for r in hnsw_topk(
                        emb, queries, k=k, ef_search=4 * k, n_shards=8, **cfg
                    ).collect()
                }
                fused_t.append(time.time() - t)
            for _ in range(3):
                t = time.time()
                served = {
                    (r["q_id"], r["vec_id"])
                    for r in hnsw_topk_indexed(
                        spark.read.parquet(path), queries, k=k, ef_search=4 * k
                    ).collect()
                }
                serve_t.append(time.time() - t)
            assert served == fused, "persisted path diverged from fused"
            fm, sm = sorted(fused_t)[1], sorted(serve_t)[1]
            print(f"| build+persist | {build_s:.2f}s (once) |")
            print(f"| fused batch (rebuilds graphs) | {fm:.2f}s |")
            print(f"| served batch (parquet graphs) | {sm:.2f}s |")
            if fm > sm:
                print(f"| breakeven | {build_s / (fm - sm):.1f} query batches |")
            print("| parity | exact (served == fused) |")

    if "semdedup" in sections:
        from data_ingestion_tool_bakasura__spark.operators import dedup as DD

        # thresholds matched to each fixture's similarity regime
        # (clustered MoG: mean top-10 cos ~0.62; sf fixture: ~0.31)
        semdedup_table(S, DD, emb, eps_list=(0.6, 0.7) if clustered else (0.3, 0.4))
    if "lsh" in sections:
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

    if "rerank" in sections:
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

        # PQ ADC + rerank: recall@k vs shortlist per codebook size (8
        # subspaces; 16/32 codes = 8 bytes either way — n_codes is free
        # fidelity until the tinyint cap)
        print()
        print("| pq n_codes | shortlist | recall@k |")
        print("|---|---|---|")
        for n_codes in (16, 32):
            books = S.pq_train(emb, m=8, n_codes=n_codes)
            for shortlist in sorted({k, 2 * k, 5 * k, 50, 100}):
                got = {
                    (r["q_id"], r["vec_id"])
                    for r in S.pq_adc_rerank_topk(
                        emb, queries, k=k, shortlist=shortlist, codebooks=books
                    ).collect()
                }
                print(f"| {n_codes} | {shortlist} | {len(got & exact) / len(exact):.3f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
