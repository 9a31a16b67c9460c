"""Executor-local HNSW ANN search (B9 / r6 verdict #8).

The reference *configures* an HNSW vector index — m=4,
efConstruction=400, efSearch=500, cosine metric (``db_utils.py:93-110``)
— but never issues a vector query (``VectorizedQuery`` imported, never
called, ``db_utils.py:24``). This module closes that last capability
gap with the Spark-native analog of how HNSW actually serves at scale:
**one graph per partition (shard), queries fanned out to every shard,
per-shard top-k merged globally** — the same shard-and-merge layout
Vespa/Lucene/Milvus use, because a single graph cannot hold 100 TB of
vectors in one executor's memory.

Scale shape:

- **Build** is ``mapInPandas`` over the corpus — each task materializes
  ITS partition's vectors (bounded by partition sizing, the same
  contract as every other per-partition operator here), builds an
  in-memory graph, answers all queries against it, and emits only
  ``(q_id, vec_id, cos_sim)`` scalar rows. No vector ever crosses the
  wire after the scan; the merge exchange carries
  ``O(n_queries x k x n_shards)`` scalars.
- **Queries** ship driver-side to every task via the closure — the
  query set is tiny by contract (the same boundedness argument as
  :func:`~.similarity.cosine_topk_batch`'s broadcast).
- **Recall** composes per shard: each shard answers its local top-k
  with HNSW recall r, and the merge is exact over shard answers, so
  corpus-wide recall ≈ r (misses are independent across shards). The
  ``ANN.md`` serving table measures this against exact scan.
- **Persistence**: the graph is rebuilt per run. At 100 TB the build is
  one corpus scan (amortize by checkpointing the assignment like the
  LSH band index); the per-shard graphs themselves are executor-local
  state and deliberately never shuffled.

Algorithm (public knowledge — Malkov & Yashunin, TPAMI 2018; the
SELECT-SIMPLE neighbor heuristic): multi-layer graph, geometric level
assignment with mL = 1/ln(M), greedy 1-NN descent through upper
layers, ef-bounded beam search at the target layer. Two deliberate
determinism substitutions (a distributed engine must give
bit-reproducible answers; the paper's randomness is incidental):

- levels come from ``md5(vec_id)`` instead of ``random()``, so the
  same corpus always builds the same graph;
- every heap/sort key is ``(distance, id)``, so ties never depend on
  insertion or hash order.
"""

from __future__ import annotations

import hashlib
import heapq
import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _hash_unit(key: str) -> float:
    """Deterministic u in (0, 1] from md5(key) — replaces random() in
    the paper's level draw so graph construction is reproducible."""
    h = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big")
    return (h + 1) / float(2**64)


class LocalHNSW:
    """In-memory HNSW over a dense matrix of L2-normalized vectors.

    Distance is cosine distance (1 - cos) on the normalized rows, so
    argmin(dist) == argmax(cosine). Pure numpy + heapq; built once per
    partition inside :func:`hnsw_topk` and discarded with the task.
    """

    def __init__(self, m: int = 8, ef_construction: int = 100):
        if m < 1:
            raise ValueError(f"m must be >= 1, got {m}")
        self.m = m
        self.m0 = 2 * m  # layer-0 degree cap (paper's Mmax0)
        self.ef_c = max(ef_construction, m + 1)
        self.ml = 1.0 / math.log(m + 1)
        self.vn: np.ndarray | None = None
        self.ids: list = []
        self.levels: list[int] = []
        # adj[layer][node] -> list[node]; layers grow on demand
        self.adj: list[dict[int, list[int]]] = []
        self.entry: int | None = None

    # -- distance ----------------------------------------------------------
    def _dist(self, q: np.ndarray, i: int) -> float:
        return float(1.0 - self.vn[i] @ q)

    # -- beam search at one layer (Algorithm 2, ef-bounded) ----------------
    def _search_layer(
        self, q: np.ndarray, entries: list[int], ef: int, layer: int
    ) -> list[tuple[float, int]]:
        adj = self.adj[layer]
        visited = set(entries)
        cand: list[tuple[float, int]] = []  # min-heap on (dist, id)
        best: list[tuple[float, int]] = []  # max-heap via (-dist, -id)
        for e in entries:
            d = self._dist(q, e)
            heapq.heappush(cand, (d, e))
            heapq.heappush(best, (-d, -e))
        while cand:
            d, c = heapq.heappop(cand)
            if d > -best[0][0] and len(best) >= ef:
                break
            for nb in adj.get(c, ()):
                if nb in visited:
                    continue
                visited.add(nb)
                dn = self._dist(q, nb)
                if len(best) < ef or dn < -best[0][0]:
                    heapq.heappush(cand, (dn, nb))
                    heapq.heappush(best, (-dn, -nb))
                    if len(best) > ef:
                        heapq.heappop(best)
        return sorted((-nd, -ni) for nd, ni in best)

    # -- greedy 1-NN descent (Algorithm 5's upper-layer walk) --------------
    def _descend(self, q: np.ndarray, entry: int, from_layer: int, to_layer: int) -> int:
        cur = entry
        cur_d = self._dist(q, cur)
        for layer in range(from_layer, to_layer, -1):
            improved = True
            while improved:
                improved = False
                for nb in self.adj[layer].get(cur, ()):
                    dn = self._dist(q, nb)
                    if (dn, nb) < (cur_d, cur):  # (dist, id) tie-break
                        cur, cur_d, improved = nb, dn, True
        return cur

    # -- build -------------------------------------------------------------
    def fit(self, ids: list, vecs: np.ndarray) -> "LocalHNSW":
        norms = np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-300)
        self.vn = (vecs / norms).astype(np.float64)
        self.ids = list(ids)
        order = sorted(range(len(ids)), key=lambda i: (str(ids[i]), i))
        for node in order:
            self._insert(node)
        return self

    def _insert(self, node: int) -> None:
        lvl = int(-math.log(_hash_unit(str(self.ids[node]))) * self.ml)
        while len(self.adj) <= lvl:
            self.adj.append({})
        self.levels.append(lvl)
        q = self.vn[node]
        if self.entry is None:
            self.entry = node
            for layer in range(lvl + 1):
                self.adj[layer][node] = []
            return
        max_level = len(self.adj) - 1
        ep = self.entry
        if max_level > lvl:
            ep = self._descend(q, ep, max_level, lvl)
        for layer in range(min(lvl, max_level), -1, -1):
            found = self._search_layer(q, [ep], self.ef_c, layer)
            cap = self.m0 if layer == 0 else self.m
            nbs = [i for _, i in found[: self.m]]
            self.adj[layer][node] = nbs
            for nb in nbs:  # bidirectional + degree-cap prune
                lst = self.adj[layer].setdefault(nb, [])
                lst.append(node)
                if len(lst) > cap:
                    lst.sort(key=lambda j: (self._dist(self.vn[nb], j), j))
                    del lst[cap:]
            ep = found[0][1]
        if lvl > max_level:
            self.entry = node

    # -- query -------------------------------------------------------------
    def search(self, q: np.ndarray, k: int, ef_search: int) -> list[tuple[float, int]]:
        """Top-k (cos_sim DESC, id ASC) as [(cos_sim, row_idx)]."""
        if self.entry is None:
            return []
        qn = np.asarray(q, dtype=np.float64)
        qn = qn / max(float(np.linalg.norm(qn)), 1e-300)
        ep = self._descend(qn, self.entry, len(self.adj) - 1, 0)
        found = self._search_layer(qn, [ep], max(ef_search, k), 0)
        return [(1.0 - d, i) for d, i in found[:k]]


def hnsw_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ef_construction: int = 100,
    ef_search: int = 64,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "q_id",
    n_shards: int | None = None,
) -> DataFrame:
    """Sharded HNSW ANN top-k: one executor-local graph per partition,
    every query answered against every shard, exact merge of shard
    answers. Columns out: ``(q_id, vec_id, cos_sim)`` — the same
    contract as :func:`~.similarity.lsh_ann_topk`.

    The reference's knobs map directly: ``m`` (graph degree),
    ``ef_construction`` (build beam), ``ef_search`` (query beam —
    recall dial, cf. efSearch=500 at ``db_utils.py:101``). Recall vs
    the dials is measured in ``ANN.md`` (tools/ann_tuning.py hnsw).
    """
    q_rows = queries.select(_c(query_id).alias("q"), _c(vec_col).alias("v")).collect()
    if not q_rows:
        raise ValueError("hnsw_topk: query set is empty")
    q_ids = [r["q"] for r in q_rows]
    Q = np.array([r["v"] for r in q_rows], dtype=np.float64)

    src = corpus.select(_c(corpus_id).alias(corpus_id), _c(vec_col).alias(vec_col))
    if n_shards is not None:
        src = src.repartition(n_shards, corpus_id)

    id_field = src.schema[corpus_id]
    q_field = queries.schema[query_id]
    out_schema = (
        f"{query_id} {q_field.dataType.simpleString()}, "
        f"{corpus_id} {id_field.dataType.simpleString()}, cos_sim double"
    )

    def _shard_search(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids: list = []
        mats: list[np.ndarray] = []
        for b in batches:  # materialize THIS partition only
            if len(b):
                ids.extend(b[corpus_id].tolist())
                mats.append(np.array(b[vec_col].tolist(), dtype=np.float64))
        if not ids:
            return
        index = LocalHNSW(m=m, ef_construction=ef_construction).fit(
            ids, np.vstack(mats)
        )
        out_q, out_id, out_s = [], [], []
        for qi, qv in zip(q_ids, Q):
            for sim, row in index.search(qv, k, ef_search):
                out_q.append(qi)
                out_id.append(ids[row])
                out_s.append(round(sim, 6))
        yield pd.DataFrame({query_id: out_q, corpus_id: out_id, "cos_sim": out_s})

    shard_hits = src.mapInPandas(_shard_search, schema=out_schema)
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.col(corpus_id))
    return (
        shard_hits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
