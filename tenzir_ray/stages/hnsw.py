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
        # contiguous vector store (doubling growth): one fancy-indexed
        # GEMV per beam hop instead of an np.stack of list items — the
        # single hottest line of graph construction
        self._mat = np.zeros((256, dim), np.float32)
        self._n = 0
        self._ids: list[int] = []
        # neighbors[level][node] -> list[int] (internal indices)
        self._nbrs: list[dict[int, list[int]]] = []
        self._levels: list[int] = []
        self._entry: int = -1

    # -- internals ---------------------------------------------------

    @property
    def _vecs(self):
        return self._mat[: self._n]

    def _dist(self, q: np.ndarray, nodes: list[int]) -> np.ndarray:
        return 1.0 - self._mat[nodes] @ q

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
        d = self._dist(self._mat[node], lst)
        order = np.argsort(d, kind="stable")[:cap]
        self._nbrs[level][node] = [lst[i] for i in order]

    # -- public ------------------------------------------------------

    def insert(self, vec: np.ndarray, node_id: int) -> None:
        idx = self._n
        if idx == len(self._mat):
            self._mat = np.concatenate(
                [self._mat, np.zeros_like(self._mat)])
        self._mat[idx] = np.asarray(vec, np.float32)
        self._n = idx + 1
        self._ids.append(int(node_id))
        lvl = self._level_for(node_id)
        self._levels.append(lvl)
        while len(self._nbrs) <= lvl:
            self._nbrs.append({})
        for lc in range(lvl + 1):
            self._nbrs[lc][idx] = []
        if self._entry < 0:
            self._entry = idx
            return
        q = self._mat[idx]
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


def _graph_to_arrays(g: HnswGraph) -> dict:
    """Flatten a graph into dense numpy arrays (ragged adjacency becomes
    per-level (nodes, offsets, flat) triples) for one-file persistence."""
    out = {
        "vecs": np.ascontiguousarray(g._vecs),
        "ids": np.asarray(g._ids, np.int64),
        "levels": np.asarray(g._levels, np.int32),
        "entry": np.asarray([g._entry], np.int64),
        "params": np.asarray([g.dim, g.M, g.ef_construction], np.int64),
        "nlevels": np.asarray([len(g._nbrs)], np.int64),
    }
    for l, layer in enumerate(g._nbrs):
        nodes = np.asarray(sorted(layer), np.int64)
        flat = np.concatenate(
            [np.asarray(layer[n], np.int64) for n in nodes]
        ) if len(nodes) else np.zeros(0, np.int64)
        lens = np.asarray([len(layer[n]) for n in nodes], np.int64)
        out[f"l{l}_nodes"] = nodes
        out[f"l{l}_lens"] = lens
        out[f"l{l}_flat"] = flat
    return out


def _graph_from_arrays(d: dict) -> HnswGraph:
    dim, M, efc = (int(x) for x in d["params"])
    g = HnswGraph(dim, M=M, ef_construction=efc)
    vecs = np.asarray(d["vecs"], np.float32).reshape(-1, dim)
    g._mat = vecs.copy() if len(vecs) else np.zeros((256, dim), np.float32)
    g._n = len(vecs)
    g._ids = [int(x) for x in d["ids"]]
    g._levels = [int(x) for x in d["levels"]]
    g._entry = int(d["entry"][0])
    g._nbrs = []
    for l in range(int(d["nlevels"][0])):
        layer: dict[int, list[int]] = {}
        nodes = d[f"l{l}_nodes"]
        lens = d[f"l{l}_lens"]
        flat = d[f"l{l}_flat"]
        pos = 0
        for n, ln in zip(nodes, lens):
            layer[int(n)] = [int(x) for x in flat[pos:pos + int(ln)]]
            pos += int(ln)
        g._nbrs.append(layer)
    return g


def _shard_of(ids: np.ndarray, shards: int) -> np.ndarray:
    z = (ids.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return (z % np.uint64(shards)).astype(np.int64)


class _ShardGraphWriter:
    """grouped_apply reduce fn for HnswIndex.build/append: one graph file
    per shard, written atomically (tmp + rename)."""

    def __init__(self, root: str, id_column: str, column: str,
                 M: int, efc: int, append: bool):
        self.root = root
        self.id_column = id_column
        self.column = column
        self.M = M
        self.efc = efc
        self.append = append

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import os

        if tbl.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64()),
                             "prev": pa.array([], pa.int64())})
        ids_all = np.asarray(
            tbl.column(self.id_column).to_numpy(zero_copy_only=False))
        shard_all = np.asarray(
            tbl.column("_hnsw_shard").to_numpy(zero_copy_only=False))
        vecs_all = _normalize(_to_matrix(tbl.column(self.column)))
        out_s, out_n, out_p = [], [], []
        for s in np.unique(shard_all):
            m = shard_all == s
            ids, vecs = ids_all[m], vecs_all[m]
            path = os.path.join(self.root, "shards", f"shard-{int(s)}.npz")
            prev = 0
            if self.append and os.path.exists(path):
                with np.load(path) as z:
                    g = _graph_from_arrays(dict(z))
                prev = len(g._ids)
                for i in np.argsort(ids, kind="stable"):
                    g.insert(vecs[i], int(ids[i]))
            else:
                g = HnswGraph.build(vecs, ids, M=self.M,
                                    ef_construction=self.efc)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + f".{os.getpid()}.tmp.npz"
            np.savez(tmp, **_graph_to_arrays(g))
            os.replace(tmp, path)
            out_s.append(int(s))
            out_n.append(len(g._ids))
            out_p.append(prev)
        return pa.table({"shard": pa.array(out_s, pa.int64()),
                         "rows": pa.array(out_n, pa.int64()),
                         "prev": pa.array(out_p, pa.int64())})


class _ShardFileSearcher:
    """map_batches fn over shard paths: load one graph file, search the
    broadcast queries, emit shard-local top-k."""

    def __init__(self, queries_ref, id_column: str, k: int, ef: int):
        self.queries_ref = queries_ref
        self.id_column = id_column
        self.k = k
        self.ef = ef

    __name__ = "_ShardFileSearcher"

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        queries = (self.queries_ref if isinstance(self.queries_ref, np.ndarray)
                   else ray.get(self.queries_ref))
        qi, ids, score = [], [], []
        for path in batch.column("path").to_pylist():
            with np.load(path) as z:
                g = _graph_from_arrays(dict(z))
            a, b, c = g.search_many(queries, self.k, self.ef)
            qi += a
            ids += b
            score += c
        return pa.table({
            "query_idx": pa.array(qi, pa.int64()),
            self.id_column: pa.array(ids, pa.int64()),
            "score": pa.array(score, pa.float64()),
        })


class HnswIndex:
    """HNSW as a persisted SERVICE: segment-graph files, one per
    hash-shard of the id space::

        root/meta.json                # shards, dim, M, ef, columns, rows
        root/shards/shard-<s>.npz     # serialized HnswGraph per shard

    ``build`` writes every shard's graph once through one grouped
    exchange; ``search`` fans shard files across tasks (queries
    broadcast once) and merges the bounded ``shards*k`` candidates;
    ``append`` re-opens ONLY the touched shards, inserts, and atomically
    replaces those files — cold shards are never read or written (the
    IvfIndex.split_hot_lists discipline). Unlike IVF, every shard must
    be probed per search — the trade is build-once O(log n) insert/query
    graphs vs IVF's probe-proportional scans; both live side by side.

    Shard files live under ``root`` which must be shared storage on a
    multi-node cluster (same contract as the fs exchange transport).
    Single-writer per append epoch, like IvfIndex.append."""

    def __init__(self, root: str):
        import json
        import os

        with open(os.path.join(root, "meta.json")) as f:
            self.meta = json.load(f)
        self.root = root

    @classmethod
    def build(cls, ds, root: str, id_column: str = "vec_id",
              column: str = "embedding", shards: int | None = None,
              M: int = 16, ef_construction: int = 100) -> "HnswIndex":
        import json
        import os

        from tenzir_ray.stages.exchange import default_buckets, grouped_apply

        if os.path.exists(os.path.join(root, "meta.json")):
            raise FileExistsError(f"index already exists at {root}")
        S = int(shards or max(8, default_buckets() // 8))
        tagged = ds.map_batches(
            _ShardTagger(id_column, S), batch_format="pyarrow"
        )
        os.makedirs(os.path.join(root, "shards"), exist_ok=True)
        stats = grouped_apply(
            tagged, ["_hnsw_shard"],
            _ShardGraphWriter(root, id_column, column, M, ef_construction,
                              append=False),
            fn_format="pyarrow", tag="hnsw_build",
            target_task_bytes=1 << 20,
        ).to_pandas()
        meta = {"shards": S, "M": int(M),
                "ef_construction": int(ef_construction),
                "id_column": id_column, "column": column,
                "num_rows": int(stats["rows"].sum())}
        tmp = os.path.join(root, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(root, "meta.json"))
        return cls(root)

    def append(self, ds) -> None:
        """Insert new rows; only the touched shards' files are re-read
        and atomically replaced."""
        import json
        import os

        from tenzir_ray.stages.exchange import grouped_apply

        tagged = ds.map_batches(
            _ShardTagger(self.meta["id_column"], self.meta["shards"]),
            batch_format="pyarrow",
        )
        stats = grouped_apply(
            tagged, ["_hnsw_shard"],
            _ShardGraphWriter(self.root, self.meta["id_column"],
                              self.meta["column"], self.meta["M"],
                              self.meta["ef_construction"], append=True),
            fn_format="pyarrow", tag="hnsw_append",
            target_task_bytes=1 << 20,
        ).to_pandas()
        # writers report pre- and post-insert counts per touched shard,
        # so the delta is exact without re-reading untouched files
        self.meta["num_rows"] += int((stats["rows"] - stats["prev"]).sum())
        tmp = os.path.join(self.root, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(self.meta, f)
        os.replace(tmp, os.path.join(self.root, "meta.json"))

    def search(self, queries: np.ndarray, k: int = 10,
               ef_search: int = 64) -> pa.Table:
        import glob
        import os

        import ray
        import ray.data

        paths = sorted(glob.glob(
            os.path.join(self.root, "shards", "shard-*.npz")))
        queries_m = _normalize(np.asarray(queries, np.float32))
        qref = ray.put(queries_m)
        id_col = self.meta["id_column"]
        if not paths:
            return pa.table({"query_idx": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        out = ray.data.from_items([{"path": p} for p in paths]).map_batches(
            _ShardFileSearcher(qref, id_col, k, ef_search),
            batch_format="pyarrow", batch_size=1,
        )
        cand = pa.concat_tables(ray.get(out.to_arrow_refs()))
        df = cand.to_pandas().sort_values(
            ["query_idx", "score", id_col],
            ascending=[True, False, True], kind="stable",
        )
        df = df.groupby("query_idx", sort=True).head(k).reset_index(drop=True)
        return pa.Table.from_pandas(df, preserve_index=False)


class _ShardTagger:
    """Adds the deterministic _hnsw_shard column (SplitMix64 of the id)."""

    def __init__(self, id_column: str, shards: int):
        self.id_column = id_column
        self.shards = int(shards)

    __name__ = "_ShardTagger"

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            batch.column(self.id_column).to_numpy(zero_copy_only=False))
        return batch.append_column(
            "_hnsw_shard", pa.array(_shard_of(ids, self.shards), pa.int64())
        )


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
              target_task_bytes: int = 1 << 20) -> pa.Table:
    """Distributed HNSW cosine top-k: hash-shard by ``id_column`` via the
    packed exchange, one independent graph + search per reduce task,
    global top-k merged from the bounded ``shards * k`` candidates.

    ``target_task_bytes`` defaults far below the exchange's 128 MiB:
    graph INSERTION cost per byte dwarfs any columnar kernel, so
    byte-coalescing at the usual grain packs every CPU-bound build into
    one task. 1 MiB effectively gives every fine bucket its own task
    (parallelism = the exchange's 8x-CPU bucket count), which is the
    right grain when cost scales with rows inserted, not bytes moved."""
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
