"""Sharded executor-local HNSW tests (B9 / r6 verdict #8).

The recall contract mirrors the LSH/IVF pattern: measured floors vs
exact brute force on the pinned fixture, determinism across runs, and
the ef_search dial's monotone effect — plus unit tests of the local
graph itself (exact-at-full-beam on a small set, deterministic levels).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.operators import similarity as SIM
from data_ingestion_tool_bakasura__spark.operators.hnsw import LocalHNSW, hnsw_topk
from data_ingestion_tool_bakasura__spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def _fixture(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return emb.filter(F.col("vec_id") >= 5), queries


def test_local_hnsw_exact_at_full_beam():
    """With ef covering the whole point set, beam search must return
    the exact top-k (graph connectivity at m0=2m makes the beam
    exhaustive on a small set)."""
    rng = np.random.default_rng(11)
    V = rng.standard_normal((60, 16))
    idx = LocalHNSW(m=6, ef_construction=60).fit(list(range(60)), V)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    for qi in range(5):
        q = V[qi]
        sims = Vn @ (q / np.linalg.norm(q))
        want = sorted(range(60), key=lambda i: (-round(sims[i], 12), i))[:5]
        got = [i for _, i in idx.search(q, k=5, ef_search=60)]
        assert got == want, f"query {qi}: {got} != {want}"


def test_local_hnsw_deterministic_build():
    """Same input -> identical graph (md5 levels, (dist, id) tie-break):
    the distributed answer must be bit-reproducible."""
    rng = np.random.default_rng(5)
    V = rng.standard_normal((40, 8))
    a = LocalHNSW(m=4, ef_construction=32).fit(list(range(40)), V)
    b = LocalHNSW(m=4, ef_construction=32).fit(list(range(40)), V)
    assert a.levels == b.levels
    assert a.adj == b.adj
    assert a.entry == b.entry


def test_local_hnsw_entry_promotion_and_layer_invariant():
    """r8 ADVICE (high): a node whose level exceeds the previous max
    must become the new entry point (the paper's Algorithm 1 step 17),
    and no node may accrete adjacency above its nominal level — that is
    the invariant that makes `_graph_rows`' per-level serialization and
    `_graph_from_pdf`'s min-ord-at-max-level entry derivation faithful."""
    rng = np.random.default_rng(7)
    V = rng.standard_normal((200, 8))
    idx = LocalHNSW(m=4, ef_construction=40).fit(list(range(200)), V)
    max_lvl = len(idx.adj) - 1
    assert max_lvl >= 1, "fixture must produce a multi-level graph"
    # entry is the FIRST-INSERTED node at the final max level
    first_at_max = next(
        n for n in idx.insert_order if idx.level_of[n] == max_lvl
    )
    assert idx.entry == first_at_max
    assert idx.level_of[idx.entry] == max_lvl
    # with 200 md5-levelled nodes the first-inserted node is (almost
    # surely) NOT at the max level — the promotion actually fired
    assert idx.level_of[idx.insert_order[0]] < max_lvl
    # layer invariant: adjacency never exceeds a node's nominal level
    for layer, layer_adj in enumerate(idx.adj):
        for node in layer_adj:
            assert idx.level_of[node] >= layer, (node, layer)


def test_hnsw_topk_recall_and_determinism(spark):
    """Sharded HNSW at the reference's config (m=4, efC=400, ef=500)
    must reproduce exact top-3 on the smoke fixture (per-shard beams
    cover the tiny shards, merge is exact), and two runs must agree
    row-for-row."""
    corpus, queries = _fixture(spark)
    exact = {
        (r["q_id"], r["vec_id"])
        for r in SIM.cosine_topk_batch(corpus, queries, k=3).collect()
    }
    run1 = sorted(
        map(
            tuple,
            hnsw_topk(
                corpus, queries, k=3, m=4, ef_construction=400, ef_search=500
            ).collect(),
        )
    )
    got = {(q, v) for q, v, _ in run1}
    recall = len(got & exact) / len(exact)
    assert recall == 1.0, f"recall {recall} at full-beam reference config"
    run2 = sorted(
        map(
            tuple,
            hnsw_topk(
                corpus, queries, k=3, m=4, ef_construction=400, ef_search=500
            ).collect(),
        )
    )
    assert run1 == run2


def test_hnsw_ef_search_recall_dial(spark):
    """ef_search is the recall dial (cf. efSearch in the reference):
    a full beam must recall at least as much as a minimal one."""
    corpus, queries = _fixture(spark)
    exact = {
        (r["q_id"], r["vec_id"])
        for r in SIM.cosine_topk_batch(corpus, queries, k=3).collect()
    }

    def recall(ef: int) -> float:
        got = {
            (r["q_id"], r["vec_id"])
            for r in hnsw_topk(
                corpus, queries, k=3, m=4, ef_construction=40,
                ef_search=ef, n_shards=4,
            ).collect()
        }
        return len(got & exact) / len(exact)

    lo, hi = recall(3), recall(500)
    assert hi >= lo
    assert hi >= 0.9  # measured floor on the pinned fixture


def test_hnsw_string_ids_roundtrip(spark):
    """Non-numeric id columns must survive the shard schema."""
    rng = np.random.default_rng(3)
    rows = [
        (f"v-{i:03d}", [float(x) for x in rng.standard_normal(8)])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    queries = spark.createDataFrame(rows[:2], "q_id string, embedding array<double>")
    out = hnsw_topk(df, queries, k=2, m=4, ef_construction=30, ef_search=30)
    assert out.schema["vec_id"].dataType.typeName() == "string"
    got = {r["q_id"]: r for r in out.filter(F.col("cos_sim") > 0.999999).collect()}
    # each query vector is in the corpus: it must find itself
    assert set(got) == {"v-000", "v-001"}


def test_hnsw_empty_queries_raise(spark):
    corpus, queries = _fixture(spark)
    with pytest.raises(ValueError, match="query set is empty"):
        hnsw_topk(corpus, queries.filter(F.lit(False)))


def test_hnsw_index_roundtrip_parity_and_query_many(spark, tmp_path):
    """r7 verdict #4: the persisted shard index must answer EXACTLY like
    the fused build (same xxhash64 shard assignment, same graphs), and
    must serve multiple query batches from ONE build — the
    build-once/query-many closure mirroring lsh_ann_topk_indexed."""
    from data_ingestion_tool_bakasura__spark.operators.hnsw import (
        hnsw_index,
        hnsw_topk_indexed,
    )

    corpus, queries = _fixture(spark)
    cfg = dict(m=4, ef_construction=400)

    path = str(tmp_path / "hnsw_index")
    hnsw_index(corpus, n_shards=4, **cfg).write.parquet(path)
    persisted = spark.read.parquet(path)

    fused = sorted(
        map(tuple, hnsw_topk(corpus, queries, k=3, ef_search=500, n_shards=4, **cfg).collect())
    )
    served = sorted(map(tuple, hnsw_topk_indexed(persisted, queries, k=3, ef_search=500).collect()))
    assert served == fused
    # determinism of the persisted path across reads
    again = sorted(
        map(tuple, hnsw_topk_indexed(spark.read.parquet(path), queries, k=3, ef_search=500).collect())
    )
    assert again == served

    # second query batch against the SAME persisted graph — no rebuild
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q2 = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 9)).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    served2 = sorted(map(tuple, hnsw_topk_indexed(persisted, q2, k=3, ef_search=500).collect()))
    fused2 = sorted(
        map(tuple, hnsw_topk(corpus, q2, k=3, ef_search=500, n_shards=4, **cfg).collect())
    )
    assert served2 == fused2
    # self-hit: every in-corpus query's top hit is itself at sim 1
    top = {t[0]: t for t in served2 if t[2] == 1.0 and t[0] == t[1]}
    assert set(top) == {5, 6, 7, 8}


def test_hnsw_index_roundtrip_parity_low_ef_clustered(spark, tmp_path):
    """r8 ADVICE (high) regression pin: parity between the fused and
    persisted paths at a LOW beam (ef_search=8) on clustered vectors —
    the regime where any graph difference (wrong entry point, dropped
    back-links) changes answers instead of being masked by an
    effectively-exhaustive beam. Before the entry-promotion fix this
    diverged for ~28% of queries on exactly this shape."""
    from data_ingestion_tool_bakasura__spark.operators.hnsw import (
        hnsw_index,
        hnsw_topk_indexed,
    )

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((6, 16)) * 5.0
    pts = np.vstack(
        [centers[c] + rng.standard_normal((100, 16)) for c in range(6)]
    )
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(600)],
        "vec_id long, embedding array<double>",
    )
    qv = centers + rng.standard_normal((6, 16)) * 0.5
    queries = spark.createDataFrame(
        [(i, [float(x) for x in qv[i]]) for i in range(6)],
        "q_id long, embedding array<double>",
    )
    cfg = dict(m=4, ef_construction=40)

    path = str(tmp_path / "clustered_idx")
    hnsw_index(corpus, n_shards=4, **cfg).write.parquet(path)
    persisted = spark.read.parquet(path)

    for ef in (8, 16):
        fused = sorted(map(tuple, hnsw_topk(
            corpus, queries, k=5, ef_search=ef, n_shards=4, **cfg
        ).collect()))
        served = sorted(map(tuple, hnsw_topk_indexed(
            persisted, queries, k=5, ef_search=ef
        ).collect()))
        assert served == fused, f"roundtrip parity broke at ef_search={ef}"


def test_hnsw_index_string_ids_and_ef_dial(spark, tmp_path):
    """The persisted path preserves id typing (string ids) and keeps
    ef_search as a pure query-time dial on the SAME stored graph."""
    from data_ingestion_tool_bakasura__spark.operators.hnsw import (
        hnsw_index,
        hnsw_topk_indexed,
    )

    corpus, queries = _fixture(spark)
    scorpus = corpus.select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    idx = hnsw_index(scorpus, m=4, ef_construction=64, n_shards=3)
    path = str(tmp_path / "s_idx")
    idx.write.parquet(path)
    persisted = spark.read.parquet(path)
    out = hnsw_topk_indexed(persisted, queries, k=2, ef_search=64).collect()
    assert out and all(r["vec_id"].startswith("doc-") for r in out)

    # wider beam on the same stored graph recalls at least as much of
    # the exact answer (recall is monotone in ef_search)
    exact = {
        (r["q_id"], r["vec_id"])
        for r in SIM.cosine_topk_batch(corpus, queries, k=2).collect()
    }
    def hits(ef):
        got = {
            (r["q_id"], int(r["vec_id"][4:]))
            for r in hnsw_topk_indexed(persisted, queries, k=2, ef_search=ef).collect()
        }
        return len(got & exact)
    assert hits(500) >= hits(8)


def test_hnsw_index_increment_touched_shards_only(spark, tmp_path):
    """Incremental insert (r8): only shards receiving vectors are
    returned; untouched shard rows stay byte-identical on disk; new
    ids are servable alongside old ones; and the increment is
    deterministic for a given wave."""
    from data_ingestion_tool_bakasura__spark.operators.hnsw import (
        _shard_expr,
        hnsw_index,
        hnsw_index_increment,
        hnsw_topk_indexed,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    old = emb.filter(F.col("vec_id") < 490)
    new = emb.filter(F.col("vec_id") >= 490).limit(3)
    cfg = dict(m=8, ef_construction=100)

    path = str(tmp_path / "idx")
    hnsw_index(old, n_shards=8, **cfg).write.parquet(path)
    persisted = spark.read.parquet(path)

    inc = hnsw_index_increment(persisted, new, n_shards=8, **cfg)
    touched = {
        r["shard"]
        for r in new.select(_shard_expr("vec_id", 8).alias("shard")).distinct().collect()
    }
    inc_rows = inc.collect()
    assert {r["shard"] for r in inc_rows} == touched
    assert len(touched) < 8  # some shards genuinely untouched
    # replacement rows = every old row of the touched shards + the wave
    n_old_touched = persisted.filter(F.col("shard").isin(*touched)).count()
    assert len(inc_rows) == n_old_touched + 3
    new_ids = {r["vec_id"] for r in new.collect()}
    assert new_ids <= {r["vec_id"] for r in inc_rows}

    # determinism of the wave
    again = hnsw_index_increment(persisted, new, n_shards=8, **cfg).collect()
    key = lambda r: (r["shard"], r["ord"])
    assert sorted(map(tuple, again), key=lambda t: t[:2]) == sorted(
        map(tuple, inc_rows), key=lambda t: t[:2]
    )

    # swapped-in index serves old AND new: every new vector self-hits
    merged = persisted.filter(~F.col("shard").isin(*touched)).unionByName(inc)
    q = new.select(F.col("vec_id").alias("q_id"), "embedding")
    got = hnsw_topk_indexed(merged, q, k=1, ef_search=200).collect()
    assert {(r["q_id"], r["vec_id"], r["cos_sim"]) for r in got} == {
        (i, i, 1.0) for i in new_ids
    }
    q_old = emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("q_id"), "embedding")
    got_old = hnsw_topk_indexed(merged, q_old, k=1, ef_search=200).collect()
    assert {(r["q_id"], r["vec_id"]) for r in got_old} == {(i, i) for i in range(3)}


def test_hnsw_index_increment_replay_idempotent(spark, tmp_path):
    """r8 ADVICE (low): replaying a wave whose ids are already in the
    index must be a no-op — the duplicate guard anti-joins the wave
    against the touched shards' (shard, id) pairs, so no id is ever
    inserted twice and the returned shard rows are byte-identical to
    the persisted ones. A mixed wave inserts only the genuinely new."""
    from data_ingestion_tool_bakasura__spark.operators.hnsw import (
        hnsw_index,
        hnsw_index_increment,
        hnsw_topk_indexed,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    old = emb.filter(F.col("vec_id") < 490)
    wave = emb.filter(F.col("vec_id") >= 485).limit(8)  # 5 dup + 3 new
    cfg = dict(m=8, ef_construction=100)

    path = str(tmp_path / "idx")
    hnsw_index(old, n_shards=8, **cfg).write.parquet(path)
    persisted = spark.read.parquet(path)

    # full-replay wave (every id already indexed): output rows must be
    # byte-identical to the persisted rows of the touched shards
    replay = emb.filter((F.col("vec_id") >= 485) & (F.col("vec_id") < 490))
    out = hnsw_index_increment(persisted, replay, n_shards=8, **cfg)
    out_rows = sorted(map(tuple, out.collect()))
    touched = {t[0] for t in out_rows}
    before = sorted(map(tuple, persisted.filter(
        F.col("shard").isin(*touched)).collect()))
    assert out_rows == before

    # mixed wave: only the 3 new ids are inserted, each exactly once
    mixed = hnsw_index_increment(persisted, wave, n_shards=8, **cfg)
    mixed_rows = mixed.collect()
    ids = [r["vec_id"] for r in mixed_rows]
    assert len(ids) == len(set(ids)), "an id was inserted twice"
    new_ids = {r["vec_id"] for r in wave.collect() if r["vec_id"] >= 490}
    assert new_ids <= set(ids)
    t2 = {r["shard"] for r in mixed_rows}
    n_old_t2 = persisted.filter(F.col("shard").isin(*t2)).count()
    assert len(mixed_rows) == n_old_t2 + len(new_ids)

    # serving the swapped-in index never returns one vec_id twice per query
    merged = persisted.filter(~F.col("shard").isin(*t2)).unionByName(mixed)
    q = wave.select(F.col("vec_id").alias("q_id"), "embedding")
    hits = hnsw_topk_indexed(merged, q, k=5, ef_search=200).collect()
    from collections import Counter
    per_q = Counter((r["q_id"], r["vec_id"]) for r in hits)
    assert max(per_q.values()) == 1


def test_hnsw_index_delete_rebuilds_touched_shards(spark, tmp_path):
    """r8 takedown leg: deleted vectors vanish from search, only shards
    containing a deleted key are returned (rebuilt from stored
    vectors — no corpus re-scan), and the operation is deterministic."""
    from data_ingestion_tool_bakasura__spark.operators.hnsw import (
        _shard_expr,
        hnsw_index,
        hnsw_index_delete,
        hnsw_topk_indexed,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cfg = dict(m=8, ef_construction=100)
    path = str(tmp_path / "idx")
    hnsw_index(emb, n_shards=8, **cfg).write.parquet(path)
    persisted = spark.read.parquet(path)

    doomed = [7, 11, 13]
    out = hnsw_index_delete(persisted, doomed, **cfg)
    rows = out.collect()
    touched = {
        r["shard"]
        for r in spark.createDataFrame([(i,) for i in doomed], "vec_id long")
        .select(_shard_expr("vec_id", 8).alias("shard")).distinct().collect()
    }
    assert {r["shard"] for r in rows} == touched and len(touched) < 8
    got_ids = {r["vec_id"] for r in rows}
    assert not (got_ids & set(doomed))
    n_before = persisted.filter(F.col("shard").isin(*touched)).count()
    assert len(rows) == n_before - len(doomed)

    # determinism
    again = hnsw_index_delete(persisted, doomed, **cfg).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))

    # swapped-in index: deleted ids unreachable, survivors still self-hit
    merged = persisted.filter(~F.col("shard").isin(*touched)).unionByName(out)
    q = emb.filter(F.col("vec_id").isin(7, 11, 13, 20)).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    hits = hnsw_topk_indexed(merged, q, k=1, ef_search=200).collect()
    by_q = {r["q_id"]: r["vec_id"] for r in hits}
    assert by_q[20] == 20
    assert all(by_q[i] not in doomed for i in doomed)


def test_hnsw_index_increment_brand_new_shard(spark, tmp_path):
    """r9 regression: a wave landing in a shard the index has NO rows
    for must not go through the cogroup (the empty old side's nested
    array<array<int>> batch segfaults pyarrow) — fresh shards build
    via the fit path, which is graph-identical to extend-from-empty
    (same sorted insertion), and serve alongside extended shards."""
    from data_ingestion_tool_bakasura__spark.operators.hnsw import (
        _shard_expr,
        hnsw_index,
        hnsw_index_increment,
        hnsw_topk_indexed,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    # build a 1-row index so most of the 8 shards are empty
    old = emb.filter(F.col("vec_id") == 0)
    wave = emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") < 20))
    cfg = dict(m=8, ef_construction=100)

    path = str(tmp_path / "tiny_idx")
    hnsw_index(old, n_shards=8, **cfg).write.partitionBy("shard").parquet(path)
    persisted = spark.read.parquet(path)
    old_shard = persisted.select("shard").first()["shard"]

    inc = hnsw_index_increment(persisted, wave, n_shards=8, **cfg)
    rows = inc.collect()
    # wave went somewhere, including shards the index had never seen
    wave_shards = {
        r["s"] for r in wave.select(_shard_expr("vec_id", 8).alias("s"))
        .distinct().collect()
    }
    assert {r["shard"] for r in rows} == wave_shards | (
        {old_shard} if old_shard in wave_shards else set()
    )
    assert len(wave_shards - {old_shard}) > 0, "fixture must hit fresh shards"
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids))

    # the merged index serves every wave vector (self-hit at sim 1.0)
    merged = persisted.filter(
        ~F.col("shard").isin(*{r["shard"] for r in rows})
    ).unionByName(inc)
    q = wave.select(F.col("vec_id").alias("q_id"), "embedding")
    got = hnsw_topk_indexed(merged, q, k=1, ef_search=200).collect()
    assert {(r["q_id"], r["vec_id"], r["cos_sim"]) for r in got} == {
        (i, i, 1.0) for i in range(1, 20)
    }

    # fresh-shard graphs are identical to a direct build of those rows
    fresh_only = wave.withColumn("s", _shard_expr("vec_id", 8)).filter(
        F.col("s") != old_shard
    ).drop("s")
    direct = sorted(map(tuple, hnsw_index(fresh_only, n_shards=8, **cfg).collect()))
    from_inc = sorted(
        tuple(r) for r in rows if r["shard"] != old_shard
    )
    assert direct == from_inc


def test_hnsw_torn_artifact_raises(spark):
    """r15 review (reproduced): neighbor ordinals are positional into
    the ord-sorted rows, so a duplicated or missing row (crashed or
    concurrent partition overwrite) silently misaligned every adjacency
    list and served wrong top-k. The load now fails loudly."""
    from data_ingestion_tool_bakasura__spark.operators.hnsw import (
        hnsw_index,
        hnsw_topk_indexed,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(40)
    idx = hnsw_index(emb, n_shards=2)
    torn = idx.unionByName(idx.limit(1))  # one duplicated row
    q = emb.limit(1).select(
        F.col("vec_id").alias("q_id"), F.col("embedding")
    )
    with pytest.raises(Exception, match="torn shard"):
        hnsw_topk_indexed(torn, q, k=3).collect()


def test_hnsw_increment_intra_wave_duplicate_id(spark):
    """r15 review (reproduced): the replay guard anti-joins only
    against the STORED index, so a wave carrying the same id twice
    inserted two nodes with one vec_id — duplicate top-k entries. The
    wave is now deduplicated to one row per id first."""
    from data_ingestion_tool_bakasura__spark.operators.hnsw import (
        hnsw_index,
        hnsw_index_increment,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(40)
    idx = hnsw_index(emb, n_shards=2)
    v = emb.limit(1).collect()[0]["embedding"]
    wave = spark.createDataFrame(
        [(999_999, v), (999_999, v)], "vec_id long, embedding array<double>"
    )
    inc = hnsw_index_increment(idx, wave, n_shards=2)
    assert inc.filter(F.col("vec_id") == 999_999).count() == 1


def test_hnsw_delete_full_shard_needs_explicit_partition_drop(spark, tmp_path):
    """r15 review (reproduced): a shard whose EVERY vector is deleted
    emits zero rows, and dynamic partition overwrite only replaces
    partitions present in the written data — the stale partition kept
    serving the deleted vectors. The docstring now prescribes the
    explicit drop; this test encodes the full takedown recipe."""
    import os
    import shutil

    from data_ingestion_tool_bakasura__spark.operators.hnsw import (
        hnsw_index,
        hnsw_index_delete,
    )

    from data_ingestion_tool_bakasura__spark.session import reliable_checkpoint

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(60)
    gpath = str(tmp_path / "graph")
    hnsw_index(emb, n_shards=4).write.partitionBy("shard").parquet(gpath)
    stored = spark.read.parquet(gpath)
    n_stored = stored.count()
    doomed = [r["vec_id"]
              for r in stored.filter("shard = 2").select("vec_id").collect()]
    assert doomed  # the fixture must actually populate shard 2
    keys_df = spark.createDataFrame([(k,) for k in doomed], "vec_id long")
    touched = {r["shard"] for r in stored.join(
        F.broadcast(keys_df), "vec_id", "semi")
        .select("shard").distinct().collect()}

    # materialize BEFORE the overwrite (the increment_ann discipline:
    # out's plan lazily reads gpath, the overwrite target)
    out = reliable_checkpoint(hnsw_index_delete(stored, doomed))
    kept = {r["shard"] for r in out.select("shard").distinct().collect()}
    assert 2 in touched and 2 not in kept  # emptied shard emits no rows
    (out.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard").parquet(gpath))
    # WITHOUT the explicit drop the deleted ids are still on disk —
    # the recipe's final step removes the emptied partitions
    for s in touched - kept:
        shutil.rmtree(os.path.join(gpath, f"shard={s}"))
    after = spark.read.parquet(gpath)
    assert after.filter(F.col("vec_id").isin(doomed)).count() == 0
    assert after.count() == n_stored - len(doomed)
