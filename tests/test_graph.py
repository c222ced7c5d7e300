"""PageRank over edge Datasets (stages/graph.py)."""

import collections

import numpy as np
import pyarrow as pa
import pytest

from tenzir_ray.stages.graph import pagerank


def _ref_pagerank(edge_list, iters, d=0.85):
    nodes = sorted({v for e in edge_list for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    deg = collections.Counter(u for u, _ in edge_list)
    r = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(iters):
        dang = sum(r[idx[v]] for v in nodes if deg.get(v, 0) == 0)
        c = np.zeros(len(nodes))
        for u, v in edge_list:
            c[idx[v]] += r[idx[u]] / deg[u]
        r = (1 - d) / len(nodes) + d * (c + dang / len(nodes))
    return dict(zip(nodes, r))


def _to_ds(edge_list):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "src": pa.array([u for u, _ in edge_list], pa.int64()),
        "dst": pa.array([v for _, v in edge_list], pa.int64()),
    }))


def test_pagerank_matches_reference_with_dangling(ray_session):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (3, 5)]  # 5 dangles
    got = pagerank(_to_ds(edges), iters=8).to_pandas()
    want = _ref_pagerank(edges, 8)
    got = got.sort_values("node")
    assert got["node"].tolist() == sorted(want)
    assert np.allclose(
        got["rank"].to_numpy(), [want[v] for v in sorted(want)], atol=1e-12
    )
    # stochastic: total mass is conserved
    assert got["rank"].sum() == pytest.approx(1.0, abs=1e-9)


def test_pagerank_parallel_edges_count(ray_session):
    # a duplicated edge doubles its share of the source's rank flow
    single = pagerank(_to_ds([(1, 2), (1, 3), (2, 1), (3, 1)]),
                      iters=6).to_pandas().set_index("node")["rank"]
    doubled = pagerank(_to_ds([(1, 2), (1, 2), (1, 3), (2, 1), (3, 1)]),
                       iters=6).to_pandas().set_index("node")["rank"]
    assert doubled[2] > single[2]
    assert doubled[3] < single[3]


def test_pagerank_zero_iters_uniform(ray_session):
    got = pagerank(_to_ds([(1, 2), (2, 3)]), iters=0).to_pandas()
    assert np.allclose(got["rank"].to_numpy(), 1 / 3)


def test_pagerank_partitioning_independent(ray_session):
    rng = np.random.default_rng(5)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 60, (500, 2))]
    a = pagerank(_to_ds(edges), iters=3).to_pandas().sort_values("node")
    b = pagerank(_to_ds(edges).repartition(9),
                 iters=3).to_pandas().sort_values("node")
    assert a["node"].tolist() == b["node"].tolist()
    assert np.allclose(a["rank"].to_numpy(), b["rank"].to_numpy(),
                       atol=1e-12)


def test_pagerank_empty(ray_session):
    import ray.data

    empty = ray.data.from_arrow(pa.table({
        "src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
    }))
    out = pagerank(empty, iters=3).to_pandas()
    assert len(out) == 0


def test_pagerank_distributed_matches_local(ray_session):
    # force the distributed loop (driver_threshold=0) and compare to the
    # driver fast path on the same graph
    rng = np.random.default_rng(11)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 30, (200, 2))]
    local = pagerank(_to_ds(edges), iters=3).to_pandas().sort_values("node")
    dist = pagerank(_to_ds(edges), iters=3,
                    driver_threshold=0).to_pandas().sort_values("node")
    assert local["node"].tolist() == dist["node"].tolist()
    assert np.allclose(local["rank"].to_numpy(), dist["rank"].to_numpy(),
                       atol=1e-12)
