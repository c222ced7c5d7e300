"""Distributed triangle counting vs a brute-force local oracle."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa


def _brute(edges):
    adj = {}
    for s, d in edges:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = set()
    for v, nbrs in adj.items():
        for x, y in itertools.combinations(sorted(nbrs), 2):
            if y in adj.get(x, ()):
                tris.add(tuple(sorted((v, x, y))))
    return tris


def test_triangle_count_matches_bruteforce(ray_session):
    import ray.data

    from tenzir_ray.stages.graph import triangle_count

    rng = np.random.default_rng(5)
    # dense-ish random graph with self-loops and duplicate/reverse edges
    src = rng.integers(0, 40, 600)
    dst = rng.integers(0, 40, 600)
    edges = list(zip(src.tolist(), dst.tolist()))
    want = _brute(edges)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst})).repartition(5)
    assert triangle_count(ds, "src", "dst") == len(want)

    per = (triangle_count(ds, "src", "dst", per_node=True)
           .to_pandas().set_index("node")["triangles"])
    want_per = {}
    for t in want:
        for v in t:
            want_per[v] = want_per.get(v, 0) + 1
    assert per.to_dict() == want_per


def test_triangle_count_empty_and_acyclic(ray_session):
    import ray.data

    from tenzir_ray.stages.graph import triangle_count

    chain = pa.table({"src": [1, 2, 3], "dst": [2, 3, 4]})
    assert triangle_count(ray.data.from_arrow(chain)) == 0
