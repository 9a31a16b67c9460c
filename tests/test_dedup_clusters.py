"""Connected-components dedup clustering tests: chains, rings, and the
full MinHash -> clusters -> canonical-keep pipeline on planted dups."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.operators import dedup as DD


def test_chain_and_ring_components(spark):
    # chain 1-2-3-4, ring 10-11-12-10, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in DD.dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_chain_converges(spark):
    n = 40  # diameter >> typical; still must converge within few contraction levels
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n)], "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in DD.dedup_clusters(pairs, max_levels=5).collect()}
    assert set(got.values()) == {0} and len(got) == n + 1


def test_minhash_to_canonical_pipeline(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base + " tonight"),          # near-dup of 1
        (3, base),                        # exact dup of 1
        (4, "completely different text about spark shuffles and joins"),
        (5, "another unrelated document mentioning embeddings and vectors"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = DD.minhash_lsh_candidates(docs, num_hashes=16, bands=8)
    clusters = DD.dedup_clusters(pairs)
    kept = DD.keep_canonical(docs, clusters)
    kept_ids = sorted(r["doc_id"] for r in kept.collect())
    assert kept_ids == [1, 4, 5]  # one canonical survivor of {1,2,3}, singletons intact
