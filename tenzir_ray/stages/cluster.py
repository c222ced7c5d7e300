"""Distributed k-means and SemDeDup-style semantic deduplication over
embedding columns (``list<float>``).

- :func:`kmeans_fit` — Lloyd's algorithm expressed Ray-Data-first: each
  iteration is ONE streaming pass (``Dataset.aggregate`` with a custom
  ``AggregateFn`` whose accumulator is the tiny (k,) count + (k, d) sum
  state; per-block work is a single GEMM). No shuffle, no driver-side
  data pass — the only driver state is k×d floats, so the same code
  holds at 100 TB. Init is seeded k-means++ on a bounded head sample.
- :func:`kmeans_assign` — broadcast the centroids once (``ray.put``)
  and attach the argmin cluster id per batch.
- :func:`semdedup` — Abbas et al. 2023 ("SemDeDup: Data-efficient
  learning at web-scale through semantic deduplication",
  arXiv:2303.09540): cluster the corpus, then WITHIN each cluster drop
  rows whose cosine similarity to an already-kept row exceeds a
  threshold. The within-cluster pass rides the packed exchange
  (``grouped_apply`` on the cluster id), so each cluster is processed
  by exactly one task and cross-cluster work never meets — the paper's
  own scale trick. The keep policy is deterministic (ascending id
  greedy), so results are independent of partitioning/encounter order.

Reference analog: the reference has no clustering operator — this is
part of the training-data-pipeline surface the engine adds on top
(SURVEY.md §6). Determinism contract: identical inputs → identical
centroids, assignments, and kept set, regardless of block layout.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa

from tenzir_ray._ship import ship_by_value
from tenzir_ray.stages.similarity import _normalize, _to_matrix


def _kpp_init(sample: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Seeded k-means++ on a driver-side sample (numpy only)."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    k = min(k, n)
    first = int(rng.integers(n))
    cents = [sample[first]]
    d2 = ((sample - cents[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        tot = d2.sum()
        if tot <= 0:  # all remaining points coincide with a centroid
            idx = int(rng.integers(n))
        else:
            idx = int(rng.choice(n, p=d2 / tot))
        cents.append(sample[idx])
        d2 = np.minimum(d2, ((sample - cents[-1]) ** 2).sum(axis=1))
    return np.stack(cents)


def _assign_dense(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin_j ||x - c_j||² via the expanded GEMM form (ties → lowest
    cluster id, which argmin guarantees)."""
    # ||x||² is constant per row — omit it; argmin over -2 x·c + ||c||²
    d = -2.0 * (m @ cents.T) + (cents * cents).sum(axis=1)[None, :]
    return d.argmin(axis=1)


class _LloydAgg:
    """AggregateFn callbacks for one Lloyd iteration. The accumulator is
    ``(counts: (k,) int64, sums: (k, d) float64)`` packed as one
    (k, d+1) array — tiny, mergeable, serializable."""

    def __init__(self, centroids: np.ndarray, column: str, normalize: bool):
        self.cents = centroids.astype(np.float64)
        self.column = column
        self.normalize = normalize
        self.k, self.d = self.cents.shape

    def init(self, _key):
        return np.zeros((self.k, self.d + 1), np.float64)

    def accumulate_block(self, acc, block):
        if isinstance(block, pd.DataFrame):
            block = pa.Table.from_pandas(block)
        if block.num_rows == 0:
            return acc
        m = _to_matrix(block.column(self.column), np.float64)
        if self.normalize:
            m = _normalize(m)
        assign = _assign_dense(m, self.cents)
        acc = acc.copy()
        np.add.at(acc[:, 0], assign, 1.0)
        np.add.at(acc[:, 1:], assign, m)
        return acc

    @staticmethod
    def merge(a, b):
        return a + b


def kmeans_fit(ds, column: str = "embedding", k: int = 16, *,
               iters: int = 10, seed: int = 11, sample: int = 4096,
               normalize: bool = True, tol: float = 1e-6,
               materialize_input: bool = True) -> np.ndarray:
    """Fit k-means centroids over an embedding column. Returns the
    (k, d) float64 centroid matrix (rows in a deterministic order).

    Each iteration streams the dataset exactly once through a
    mergeable block aggregate — state is O(k·d) everywhere, so the
    fit never shuffles. ``normalize`` L2-normalizes rows first
    (spherical k-means — the right metric for cosine-similarity
    downstream like :func:`semdedup`).

    Fast paths: when the init sample captured the WHOLE dataset
    (fewer than ``sample`` rows came back), every Lloyd iteration runs
    driver-local on that matrix — same update rule, zero extra Ray
    passes (parity-tested vs the streaming loop). Otherwise the input
    is materialized once so the 2..``iters`` streaming passes re-read
    pinned blocks instead of re-executing the upstream lineage per
    iteration; when the input exceeds object-store + spill capacity
    (it cannot pin), pass ``materialize_input=False`` to re-execute
    the lineage each pass instead — slower per iteration but never
    holds more than the streaming working set."""
    from ray.data.aggregate import AggregateFn

    head = ds.limit(sample).take_all()
    if not head:
        raise ValueError("kmeans_fit: empty dataset")
    m0 = np.stack([np.asarray(r[column], np.float64) for r in head])
    if normalize:
        m0 = _normalize(m0)
    cents = _kpp_init(m0, k, seed)
    if len(head) < sample:
        # the limit() returned everything: local Lloyd, same math as
        # _LloydAgg (gemm assign + scatter-add means)
        for _ in range(iters):
            assign = _assign_dense(m0, cents)
            counts = np.bincount(assign, minlength=len(cents)).astype(
                np.float64)
            sums = np.zeros_like(cents)
            np.add.at(sums, assign, m0)
            new = cents.copy()
            nz = counts > 0
            new[nz] = sums[nz] / counts[nz, None]
            if normalize:
                new = _normalize(new)
            shift = float(np.abs(new - cents).max())
            cents = new
            if shift <= tol:
                break
        return cents
    if iters > 1 and materialize_input:
        # pin blocks so iterations 2..N re-read instead of re-executing
        # the upstream lineage; a single pass gains nothing from the pin
        ds = ds.materialize()
    for _ in range(iters):
        cb = _LloydAgg(cents, column, normalize)
        agg = AggregateFn(init=cb.init, merge=_LloydAgg.merge,
                          accumulate_block=cb.accumulate_block,
                          name="lloyd")
        packed = ds.aggregate(agg)["lloyd"]
        counts = packed[:, 0]
        new = cents.copy()
        nz = counts > 0
        new[nz] = packed[nz, 1:] / counts[nz, None]
        if normalize:
            new = _normalize(new)
        shift = float(np.abs(new - cents).max())
        cents = new
        if shift <= tol:
            break
    return cents


class _Assigner:
    """Attach the nearest-centroid cluster id (broadcast once per actor)."""

    def __init__(self, cents_ref, column: str, out: str, normalize: bool):
        import ray

        self.cents = np.asarray(ray.get(cents_ref), np.float64)
        self.column = column
        self.out = out
        self.normalize = normalize

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(self.out, pa.array([], pa.int32()))
        m = _to_matrix(batch.column(self.column), np.float64)
        if self.normalize:
            m = _normalize(m)
        a = _assign_dense(m, self.cents).astype(np.int32)
        return batch.append_column(self.out, pa.array(a, pa.int32()))


def kmeans_assign(ds, centroids: np.ndarray, column: str = "embedding",
                  out: str = "cluster", *, normalize: bool = True,
                  concurrency=(1, 4)):
    """Attach ``out`` = nearest-centroid id. Centroids go through the
    object store once (``ray.put``), never re-shipped per batch."""
    import ray

    cref = ray.put(np.asarray(centroids, np.float64))
    return ds.map_batches(
        _Assigner, fn_constructor_args=(cref, column, out, normalize),
        batch_format="pyarrow", concurrency=concurrency,
    )


def kmeans_cluster(ds, column: str = "embedding", k: int = 16, *,
                   iters: int = 10, seed: int = 11, out: str = "cluster",
                   normalize: bool = True):
    """Fit-then-assign convenience (the pipeline-registry form):
    ds → ds with an ``out`` cluster-id column."""
    cents = kmeans_fit(ds, column, k, iters=iters, seed=seed,
                       normalize=normalize)
    return kmeans_assign(ds, cents, column, out, normalize=normalize)


def kmeans_profile(ds, column: str = "embedding", k: int = 16, *,
                   iters: int = 10, seed: int = 11,
                   normalize: bool = True) -> pa.Table:
    """Cluster-size profile: fit + assign + count per cluster (k rows,
    ascending cluster id). The smoke-level summary a corpus audit wants."""
    cents = kmeans_fit(ds, column, k, iters=iters, seed=seed,
                       normalize=normalize)
    assigned = kmeans_assign(ds, cents, column, normalize=normalize)
    prof = assigned.groupby("cluster").count().to_pandas()
    prof = prof.sort_values("cluster", ignore_index=True)
    return pa.table({
        "cluster": pa.array(prof["cluster"].astype("int32")),
        "n": pa.array(prof["count()"].astype("int64")),
    })


def _greedy_keep(ids: np.ndarray, m: np.ndarray, threshold: float) -> np.ndarray:
    """Deterministic ascending-id greedy: keep a row iff its cosine to
    every already-kept row in the cluster is < threshold. Returns a
    bool keep-mask aligned to the ASCENDING-id order of ``ids``."""
    order = np.argsort(ids, kind="stable")
    mm = m[order]
    keep = np.zeros(len(ids), bool)
    buf = np.empty_like(mm)  # kept vectors, densely packed
    nk = 0
    for i in range(len(mm)):
        if nk and float((buf[:nk] @ mm[i]).max()) >= threshold:
            continue
        buf[nk] = mm[i]
        nk += 1
        keep[order[i]] = True
    return keep


def semdedup(ds, id_column: str = "vec_id", column: str = "embedding",
             *, threshold: float = 0.95, k: int = 16, iters: int = 10,
             seed: int = 11, centroids: np.ndarray | None = None,
             num_buckets: int | None = None):
    """SemDeDup (arXiv:2303.09540): semantic near-duplicate removal.

    1. cluster the corpus (spherical k-means; pass ``centroids`` to
       reuse a fit),
    2. route rows to their cluster with one broadcast assign,
    3. within each cluster, greedily keep rows in ascending-id order,
       dropping any row whose cosine to an already-kept row ≥
       ``threshold``.

    Returns the kept rows with their original columns (cluster column
    dropped). Deterministic and partitioning-independent: the kept set
    depends only on (centroids, ids, vectors). Clusters are processed
    one-per-task over the packed exchange, so per-task memory is one
    cluster, not the corpus; size ``k`` so corpus/k fits a worker heap
    (the paper uses ~50k clusters at web scale)."""
    from tenzir_ray.stages.exchange import grouped_apply

    if centroids is None:
        centroids = kmeans_fit(ds, column, k, iters=iters, seed=seed)
    assigned = kmeans_assign(ds, centroids, column)
    orig_cols = [c for c in
                 (ds.schema().names if hasattr(ds, "schema") else [])
                 if c != "cluster"]

    def _dedup_cluster(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.drop(columns=["cluster"], errors="ignore")
        ids = df[id_column].to_numpy()
        m = _normalize(np.stack(
            [np.asarray(v, np.float64) for v in df[column]]))
        keep = _greedy_keep(ids, m, threshold)
        out = df.loc[keep]
        return out.drop(columns=["cluster"]).reset_index(drop=True)

    out = grouped_apply(assigned, "cluster", _dedup_cluster,
                        num_buckets=num_buckets, tag="semdedup")
    if orig_cols:
        out = out.select_columns(orig_cols)
    return out


ship_by_value(sys.modules[__name__])
