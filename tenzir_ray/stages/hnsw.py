"""HNSW approximate nearest-neighbor search, sharded for Ray Data.

Graph construction and search follow Malkov & Yashunin 2016
(arXiv:1603.09320, Algorithms 1-5): exponentially-distributed layer
assignment, greedy descent through the upper layers, ef-bounded beam
search at layer 0, and closest-M neighbor selection with degree-bounded
bidirectional links.

Engine extension (the reference has no vector search; this completes the
ANN family next to ``similarity.brute_force_topk`` / ``IvfIndex`` /
``pq_topk``). Scale pattern: the corpus is hash-sharded by id through
the packed exchange (:func:`tenzir_ray.stages.exchange.grouped_apply`
— fine buckets sized 8x cluster CPUs, reduce tasks coalesced by
MEASURED bytes), each reduce task builds an INDEPENDENT in-memory HNSW
graph over its shard, searches the ``ray.put``-broadcast query matrix,
and emits its local top-k; a tiny driver merge keeps the global top-k
of the ``shards * k`` candidate rows. Per-task memory is bounded by
``target_task_bytes``, queries travel once through the object store,
and nothing materializes the corpus.

Sharded HNSW trades a small recall loss for embarrassing parallelism
(each shard's true top-k union contains the global top-k, so recall
loss comes only from per-shard graph misses); this is the segment-level
graph layout production vector stores use for exactly this reason.
"""

from __future__ import annotations

import heapq
import sys

import numpy as np
import pyarrow as pa

from tenzir_ray._ship import ship_by_value
from tenzir_ray.stages.similarity import _normalize, _to_matrix


_U64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mix (SplitMix64 finalizer) — layer draws are
    a pure function of the node id, so builds do not depend on RNG state."""
    z = (int(x) + 0x9E3779B97F4A7C15) & _U64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _U64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _U64
    return z ^ (z >> 31)


class HnswGraph:
    """Single-shard in-memory HNSW over unit-normalized vectors.

    Distance is cosine distance (1 - dot on normalized vectors).
    Insertion order is the caller's; :func:`build` sorts by id so a
    shard's graph is a pure function of its row SET (partitioning- and
    block-order-independent).
    """

    def __init__(self, dim: int, M: int = 16, ef_construction: int = 100):
        if M < 2:
            raise ValueError("hnsw: M must be >= 2")
        self.dim = int(dim)
        self.M = int(M)
        self.M0 = 2 * int(M)  # layer-0 degree bound (paper Sec. 4.1)
        self.mL = 1.0 / np.log(M)
        self.ef_construction = int(ef_construction)
        self._vecs: list[np.ndarray] = []   # normalized, float32
        self._ids: list[int] = []
        # neighbors[level][node] -> list[int] (internal indices)
        self._nbrs: list[dict[int, list[int]]] = []
        self._levels: list[int] = []
        self._entry: int = -1
        self._matrix: np.ndarray | None = None  # rebuilt lazily

    # -- internals ---------------------------------------------------

    def _dist(self, q: np.ndarray, nodes: list[int]) -> np.ndarray:
        m = np.stack([self._vecs[i] for i in nodes])
        return 1.0 - m @ q

    def _level_for(self, node_id: int) -> int:
        u = (_splitmix64(node_id & _U64) + 1) / 2.0**64
        return int(-np.log(u) * self.mL)

    def _search_layer(self, q: np.ndarray, entry: list[int], ef: int,
                      level: int) -> list[tuple[float, int]]:
        """Algorithm 2: ef-bounded best-first beam from ``entry``.
        Returns (dist, node) pairs, unsorted, len <= ef."""
        nbrs = self._nbrs[level]
        d0 = self._dist(q, entry)
        visited = set(entry)
        # candidates: min-heap by dist; results: max-heap (negated)
        cand = [(float(d), n) for d, n in zip(d0, entry)]
        heapq.heapify(cand)
        res = [(-float(d), n) for d, n in zip(d0, entry)]
        heapq.heapify(res)
        while len(res) > ef:
            heapq.heappop(res)
        while cand:
            d, c = heapq.heappop(cand)
            if d > -res[0][0] and len(res) >= ef:
                break
            new = [n for n in nbrs.get(c, ()) if n not in visited]
            if not new:
                continue
            visited.update(new)
            dn = self._dist(q, new)
            worst = -res[0][0]
            for dd, n in zip(dn, new):
                dd = float(dd)
                if len(res) < ef or dd < worst:
                    heapq.heappush(cand, (dd, n))
                    heapq.heappush(res, (-dd, n))
                    if len(res) > ef:
                        heapq.heappop(res)
                    worst = -res[0][0]
        return [(-d, n) for d, n in res]

    def _select(self, cands: list[tuple[float, int]], m: int) -> list[int]:
        """Closest-M neighbor selection (Algorithm 3)."""
        return [n for _, n in sorted(cands)[:m]]

    def _shrink(self, node: int, level: int) -> None:
        cap = self.M0 if level == 0 else self.M
        lst = self._nbrs[level][node]
        if len(lst) <= cap:
            return
        d = self._dist(self._vecs[node], lst)
        order = np.argsort(d, kind="stable")[:cap]
        self._nbrs[level][node] = [lst[i] for i in order]

    # -- public ------------------------------------------------------

    def insert(self, vec: np.ndarray, node_id: int) -> None:
        idx = len(self._vecs)
        self._vecs.append(np.asarray(vec, np.float32))
        self._ids.append(int(node_id))
        self._matrix = None
        lvl = self._level_for(node_id)
        self._levels.append(lvl)
        while len(self._nbrs) <= lvl:
            self._nbrs.append({})
        for lc in range(lvl + 1):
            self._nbrs[lc][idx] = []
        if self._entry < 0:
            self._entry = idx
            return
        q = self._vecs[idx]
        ep = [self._entry]
        top = self._levels[self._entry]
        # greedy descent above the node's level (ef=1)
        for lc in range(top, lvl, -1):
            ep = [min(self._search_layer(q, ep, 1, lc))[1]]
        # beam + connect on the shared levels
        for lc in range(min(lvl, top), -1, -1):
            w = self._search_layer(q, ep, self.ef_construction, lc)
            sel = self._select(w, self.M)
            self._nbrs[lc][idx] = list(sel)
            for n in sel:
                self._nbrs[lc][n].append(idx)
                self._shrink(n, lc)
            ep = [n for _, n in sorted(w)]
        if lvl > top:
            self._entry = idx

    def search(self, q: np.ndarray, k: int, ef: int = 64) -> list[tuple[float, int]]:
        """Top-k (cosine_sim, id) for one normalized query, best first."""
        if self._entry < 0:
            return []
        ef = max(ef, k)
        ep = [self._entry]
        for lc in range(self._levels[self._entry], 0, -1):
            ep = [min(self._search_layer(q, ep, 1, lc))[1]]
        w = sorted(self._search_layer(q, ep, ef, 0))[:k]
        return [(1.0 - d, self._ids[n]) for d, n in w]

    def search_many(self, queries: np.ndarray, k: int, ef: int = 64):
        """(query_idx, id, score) arrays for a query matrix."""
        qi: list[int] = []
        ids: list[int] = []
        score: list[float] = []
        for i, q in enumerate(queries):
            for s, nid in self.search(q, k, ef):
                qi.append(i)
                ids.append(nid)
                score.append(s)
        return qi, ids, score

    @classmethod
    def build(cls, vectors: np.ndarray, ids: np.ndarray, M: int = 16,
              ef_construction: int = 100) -> "HnswGraph":
        """Build from unit-normalized vectors, inserting in id order so the
        graph is independent of the caller's row order."""
        order = np.argsort(np.asarray(ids), kind="stable")
        g = cls(vectors.shape[1], M=M, ef_construction=ef_construction)
        for i in order:
            g.insert(vectors[i], int(ids[i]))
        return g


class _ShardSearcher:
    """grouped_apply reduce fn: build this shard's graph, search the
    broadcast queries, emit the shard-local top-k."""

    def __init__(self, queries_ref, id_column: str, column: str,
                 k: int, M: int, ef_construction: int, ef_search: int):
        self.queries_ref = queries_ref
        self.id_column = id_column
        self.column = column
        self.k = k
        self.M = M
        self.efc = ef_construction
        self.efs = ef_search

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import ray

        if tbl.num_rows == 0:
            return pa.table({
                "query_idx": pa.array([], pa.int64()),
                self.id_column: pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            })
        queries = ray.get(self.queries_ref) if not isinstance(
            self.queries_ref, np.ndarray) else self.queries_ref
        vecs = _normalize(_to_matrix(tbl.column(self.column)))
        ids = np.asarray(tbl.column(self.id_column).to_numpy(
            zero_copy_only=False))
        g = HnswGraph.build(vecs, ids, M=self.M, ef_construction=self.efc)
        qi, out_ids, score = g.search_many(queries, self.k, self.efs)
        return pa.table({
            "query_idx": pa.array(qi, pa.int64()),
            self.id_column: pa.array(out_ids, pa.int64()),
            "score": pa.array(score, pa.float64()),
        })


def hnsw_topk(ds, queries: np.ndarray, k: int = 10,
              id_column: str = "vec_id", column: str = "embedding",
              M: int = 16, ef_construction: int = 100, ef_search: int = 64,
              num_buckets: int | None = None,
              target_task_bytes: int = 128 << 20) -> pa.Table:
    """Distributed HNSW cosine top-k: hash-shard by ``id_column`` via the
    packed exchange, one independent graph + search per reduce task,
    global top-k merged from the bounded ``shards * k`` candidates."""
    import ray

    from tenzir_ray.stages.exchange import grouped_apply

    queries_m = _normalize(np.asarray(queries, np.float32))
    qref = ray.put(queries_m)
    out = grouped_apply(
        ds, [id_column],
        _ShardSearcher(qref, id_column, column, k, M,
                       ef_construction, ef_search),
        num_buckets=num_buckets, target_task_bytes=target_task_bytes,
        fn_format="pyarrow", tag="hnsw",
    )
    # bounded driver merge: <= (#reduce tasks) * len(queries) * k rows
    cand = pa.concat_tables(ray.get(out.to_arrow_refs()))
    df = cand.to_pandas()
    df = df.sort_values(
        ["query_idx", "score", id_column], ascending=[True, False, True],
        kind="stable",
    )
    df = df.groupby("query_idx", sort=True).head(k).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


ship_by_value(sys.modules[__name__])
