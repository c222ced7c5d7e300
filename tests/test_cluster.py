"""Distributed k-means + SemDeDup (stages/cluster.py)."""

import numpy as np
import pyarrow as pa
import pytest

from tenzir_ray.stages import cluster as C

SF = "/root/testdata/sf0.001"


def _blob_ds(ray, n_per=40, k=4, d=8, seed=3, shuffle_ids=False):
    """Well-separated gaussian blobs on distinct orthants."""
    rng = np.random.default_rng(seed)
    rows = []
    for j in range(k):
        center = np.zeros(d)
        center[j] = 10.0
        pts = center + rng.normal(0, 0.05, size=(n_per, d))
        for i, p in enumerate(pts):
            rows.append({"vec_id": j * n_per + i, "embedding": p.tolist(),
                         "truth": j})
    if shuffle_ids:
        rng.shuffle(rows)
    import ray.data

    return ray.data.from_items(rows)


def test_kmeans_recovers_blobs(ray_session):
    ds = _blob_ds(ray_session, k=4)
    cents = C.kmeans_fit(ds, k=4, iters=8, normalize=False)
    assert cents.shape == (4, 8)
    out = C.kmeans_assign(ds, cents, normalize=False).to_pandas()
    # every truth-group maps to exactly one cluster id, bijectively
    grp = out.groupby("truth")["cluster"].nunique()
    assert (grp == 1).all()
    assert out.groupby("truth")["cluster"].first().nunique() == 4


def test_kmeans_deterministic_across_partitioning(ray_session):
    ds1 = _blob_ds(ray_session, k=3)
    ds2 = _blob_ds(ray_session, k=3).repartition(7)
    c1 = C.kmeans_fit(ds1, k=3, iters=6, normalize=False)
    c2 = C.kmeans_fit(ds2, k=3, iters=6, normalize=False)
    # block layout must not change the fit: partial sums commute
    assert np.allclose(c1, c2, atol=1e-12)


def test_kmeans_profile_shape(ray_session):
    import ray.data

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    prof = C.kmeans_profile(ds, k=8, iters=4)
    df = prof.to_pandas()
    assert len(df) == 8
    assert df["n"].sum() == ds.count()
    assert (df["n"] > 0).all()  # seeded k-means++ on real data: no empties


def test_kmeans_empty_raises(ray_session):
    import ray.data

    ds = ray.data.from_items([{"embedding": [1.0, 2.0]}]).limit(0)
    with pytest.raises(ValueError):
        C.kmeans_fit(ds, k=2)


def test_semdedup_drops_planted_clones(ray_session):
    import ray.data

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    ds = ds.map_batches(
        lambda t: t.select(["vec_id", "embedding"]), batch_format="pyarrow")
    import pyarrow.compute as pc

    shifted = ds.map_batches(
        lambda t: t.set_column(0, "vec_id", pc.add(t.column("vec_id"), 10_000)),
        batch_format="pyarrow")
    kept = C.semdedup(ds.union(shifted), threshold=0.9, k=8, iters=4)
    ids = sorted(kept.to_pandas()["vec_id"])
    n = ds.count()
    assert len(ids) == n
    assert all(i < 10_000 for i in ids)  # lowest id of each clone pair wins


def test_semdedup_partitioning_independent(ray_session):
    ds = _blob_ds(ray_session, k=2, n_per=30)
    # plant within-cluster near-dups: clone ids 1000+i of the first 10
    head = ds.take(10)
    import ray.data

    clones = ray.data.from_items([
        {"vec_id": r["vec_id"] + 1000,
         "embedding": list(map(float, r["embedding"])),
         "truth": r["truth"]}
        for r in head
    ])
    cents = C.kmeans_fit(ds, k=2, iters=6, normalize=False)
    a = C.semdedup(ds.union(clones), centroids=cents, threshold=0.999)
    b = C.semdedup(ds.union(clones).repartition(11), centroids=cents,
                   threshold=0.999)
    ia = sorted(a.to_pandas()["vec_id"])
    ib = sorted(b.to_pandas()["vec_id"])
    assert ia == ib
    assert all(i < 1000 for i in ia)


def test_greedy_keep_transitive_chain():
    # a~b, b~c, a!~c: greedy keeps a, drops b (sim to a), keeps c
    ids = np.array([1, 2, 3])
    a = np.array([1.0, 0.0])
    b = np.array([np.cos(0.3), np.sin(0.3)])
    c = np.array([np.cos(0.6), np.sin(0.6)])
    m = np.stack([a, b, c])
    keep = C._greedy_keep(ids, m, threshold=np.cos(0.4))
    assert keep.tolist() == [True, False, True]


def test_registry_ops(ray_session):
    from tenzir_ray.pipelines.pipeline import Pipeline

    import ray.data

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    out = Pipeline([{"op": "kmeans_cluster", "k": 4, "iters": 3}]).run(ds)
    df = out.to_pandas()
    assert "cluster" in df.columns and df["cluster"].nunique() <= 4
