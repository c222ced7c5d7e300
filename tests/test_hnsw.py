"""HNSW graph + sharded hnsw_topk (stages/hnsw.py)."""

import numpy as np
import pytest

from tenzir_ray.stages.hnsw import HnswGraph, hnsw_topk

SF = "/root/testdata/sf0.001"


def _unit(rng, n, d):
    v = rng.standard_normal((n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_graph_recall_high():
    rng = np.random.default_rng(11)
    v = _unit(rng, 1000, 24)
    g = HnswGraph.build(v, np.arange(1000), M=16, ef_construction=100)
    hits = total = 0
    for i in range(10):
        true = set(np.argsort(-(v[i] @ v.T))[:10].tolist())
        got = {nid for _, nid in g.search(v[i], 10, ef=100)}
        hits += len(true & got)
        total += 10
    assert hits / total >= 0.95


def test_graph_insertion_order_independent():
    rng = np.random.default_rng(3)
    v = _unit(rng, 300, 12)
    ids = np.arange(300)
    g1 = HnswGraph.build(v, ids, M=8, ef_construction=60)
    perm = rng.permutation(300)
    g2 = HnswGraph.build(v[perm], ids[perm], M=8, ef_construction=60)
    for i in range(5):
        r1 = [nid for _, nid in g1.search(v[i], 5, ef=60)]
        r2 = [nid for _, nid in g2.search(v[i], 5, ef=60)]
        assert r1 == r2


def test_graph_tiny_exact():
    rng = np.random.default_rng(5)
    v = _unit(rng, 8, 4)
    g = HnswGraph.build(v, np.arange(8), M=4, ef_construction=16)
    for i in range(8):
        got = [nid for _, nid in g.search(v[i], 3, ef=8)]
        true = np.argsort(-(v[i] @ v.T))[:3].tolist()
        assert got[0] == i
        assert set(got) == set(true)


def test_graph_search_scores_are_cosine():
    rng = np.random.default_rng(9)
    v = _unit(rng, 50, 6)
    g = HnswGraph.build(v, np.arange(50), M=6, ef_construction=30)
    res = g.search(v[0], 1, ef=10)
    assert res[0][1] == 0
    assert res[0][0] == pytest.approx(1.0, abs=1e-5)


def test_hnsw_topk_recall_vs_brute(ray_session):
    import ray.data

    from tenzir_ray.stages import similarity as SIM

    ds = ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    rows = ds.take(3)
    queries = np.stack([np.asarray(r["embedding"]) for r in rows])
    exact = SIM.brute_force_topk(ds, queries, k=10).to_pandas()
    approx = hnsw_topk(ds, queries, k=10, ef_search=128).to_pandas()
    for qi in range(3):
        e = set(exact.loc[exact["query_idx"] == qi, "vec_id"])
        a = set(approx.loc[approx["query_idx"] == qi, "vec_id"])
        assert len(e & a) / 10 >= 0.8
    # self-hit: each query vector is in the corpus
    for qi, r in enumerate(rows):
        sub = approx[approx["query_idx"] == qi].sort_values(
            "score", ascending=False
        )
        assert sub.iloc[0]["vec_id"] == r["vec_id"]


def test_hnsw_topk_partitioning_independent(ray_session):
    import ray.data

    ds1 = ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ds2 = ds1.repartition(7)
    rows = ds1.take(2)
    queries = np.stack([np.asarray(r["embedding"]) for r in rows])
    a = hnsw_topk(ds1, queries, k=5, ef_search=64).to_pandas()
    b = hnsw_topk(ds2, queries, k=5, ef_search=64).to_pandas()
    assert a["vec_id"].tolist() == b["vec_id"].tolist()


def test_hnsw_topk_empty(ray_session):
    import ray.data

    ds = ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).filter(lambda r: False)
    q = np.ones((1, 32), np.float32)
    out = hnsw_topk(ds, q, k=3).to_pandas()
    assert len(out) == 0


def test_index_build_search_append(ray_session, tmp_path):
    import os

    import ray.data

    from tenzir_ray.stages.hnsw import HnswIndex

    rng = np.random.default_rng(17)
    v = _unit(rng, 400, 16)
    tbl = {"vec_id": list(range(400)),
           "embedding": [row.tolist() for row in v]}
    import pyarrow as pa
    ds = ray.data.from_arrow(pa.table(tbl))
    root = str(tmp_path / "hnsw")
    idx = HnswIndex.build(ds, root, shards=4, M=12, ef_construction=80)
    assert idx.meta["num_rows"] == 400
    # recall vs brute force
    q = v[:5]
    got = idx.search(q, k=10, ef_search=100).to_pandas()
    hits = 0
    for i in range(5):
        true = set(np.argsort(-(q[i] @ v.T))[:10].tolist())
        a = set(got.loc[got["query_idx"] == i, "vec_id"])
        hits += len(true & a)
    assert hits / 50 >= 0.9
    # self-hit
    top = got[got["query_idx"] == 0].sort_values("score", ascending=False)
    assert top.iloc[0]["vec_id"] == 0

    # append: only touched shard files change
    before = {f: os.path.getmtime(os.path.join(root, "shards", f))
              for f in os.listdir(os.path.join(root, "shards"))}
    w = _unit(rng, 3, 16)
    new = ray.data.from_arrow(pa.table({
        "vec_id": [1000, 1001, 1002],
        "embedding": [row.tolist() for row in w],
    }))
    idx.append(new)
    assert idx.meta["num_rows"] == 403
    after = {f: os.path.getmtime(os.path.join(root, "shards", f))
             for f in os.listdir(os.path.join(root, "shards"))}
    from tenzir_ray.stages.hnsw import _shard_of
    touched = {f"shard-{s}.npz"
               for s in _shard_of(np.array([1000, 1001, 1002]), 4)}
    for f, t in before.items():
        if f not in touched:
            assert after[f] == t, f"cold shard {f} was rewritten"
    # appended vectors are findable
    got2 = HnswIndex(root).search(w[:1], k=1, ef_search=50).to_pandas()
    assert got2.iloc[0]["vec_id"] == 1000

    with pytest.raises(FileExistsError):
        HnswIndex.build(ds, root)


def test_graph_serialization_roundtrip():
    from tenzir_ray.stages.hnsw import _graph_from_arrays, _graph_to_arrays

    rng = np.random.default_rng(23)
    v = _unit(rng, 120, 8)
    g = HnswGraph.build(v, np.arange(120), M=6, ef_construction=40)
    g2 = _graph_from_arrays(_graph_to_arrays(g))
    for i in range(5):
        assert g.search(v[i], 5, ef=40) == g2.search(v[i], 5, ef=40)


def test_ann_topk_two_input_modes(ray_session):
    import ray.data

    from tenzir_ray.stages.similarity import ann_topk

    ds = ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    right = ds.filter(expr="vec_id < 2")
    brute = ann_topk(ds, right, k=5, mode="brute",
                     precision="f64").to_pandas()
    hnsw = ann_topk(ds, right, k=5, mode="hnsw",
                    ef_search=128).to_pandas()
    assert brute["query_idx"].dtype == "int64"
    for qi in range(2):
        b = set(brute.loc[brute["query_idx"] == qi, "vec_id"])
        h = set(hnsw.loc[hnsw["query_idx"] == qi, "vec_id"])
        assert len(b & h) / 5 >= 0.8
    with pytest.raises(ValueError, match="max_queries"):
        ann_topk(ds, ds, k=3, max_queries=10)
    with pytest.raises(ValueError, match="unknown mode"):
        ann_topk(ds, right, mode="nope")
    with pytest.raises(ValueError, match="precision"):
        ann_topk(ds, right, precision="f16")
