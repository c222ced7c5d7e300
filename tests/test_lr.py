"""Logistic-regression classifier tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _toy():
    rng = np.random.default_rng(9)
    pos_words = ["good", "great", "clean"]
    neg_words = ["bad", "noise", "junk"]
    filler = ["the", "a", "data", "row"]
    texts, ys = [], []
    for i in range(400):
        y = int(rng.random() < 0.5)
        core = rng.choice(pos_words if y else neg_words, 3).tolist()
        pad = rng.choice(filler, 4).tolist()
        words = core + pad
        rng.shuffle(words)
        texts.append(" ".join(words))
        ys.append(y)
    return pa.table({"i": np.arange(400), "text": texts,
                     "y": np.array(ys, np.int64)})


def test_lr_learns_separable(ray_session):
    import ray.data

    from tenzir_ray.stages.classify import lr_classify, lr_train

    tbl = _toy()
    ds = ray.data.from_arrow(tbl).repartition(4)
    model = lr_train(ds, "y", "text", buckets=512, iters=15, lr=1.0)
    out = (lr_classify(ds, model, "text", out="p", pred_col="pred")
           .to_pandas().sort_values("i", ignore_index=True))
    acc = (out["pred"].to_numpy() ==
           tbl.column("y").to_numpy().astype(bool)).mean()
    assert acc >= 0.99
    # scores are probabilities
    assert ((out["p"] >= 0) & (out["p"] <= 1)).all()


def test_lr_partitioning_invariance(ray_session):
    import ray.data

    from tenzir_ray.stages.classify import lr_gradient

    tbl = _toy()
    w = np.linspace(-1, 1, 128)

    def grad(parts):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        return lr_gradient(ds, "y", "text", weights=w, bias=0.1,
                           buckets=128)

    g1, g2 = grad(2), grad(7)
    assert np.allclose(g1[0], g2[0], rtol=1e-12, atol=1e-9)
    assert abs(g1[1] - g2[1]) < 1e-9
    assert g1[3] == g2[3] == 400


def test_lr_null_and_bad_labels(ray_session):
    import ray.data

    from tenzir_ray.stages.classify import lr_gradient, lr_train

    tbl = pa.table({
        "text": ["a b", "c d", "e f"],
        "y": pa.array([1, None, 0], pa.int64()),
    })
    g = lr_gradient(ray.data.from_arrow(tbl), "y", "text",
                    weights=np.zeros(64), buckets=64)
    assert g[3] == 2  # null row skipped, not treated as class 0

    bad = pa.table({"text": ["a"], "y": pa.array([2], pa.int64())})
    with pytest.raises(Exception, match="must be 0/1"):
        lr_train(ray.data.from_arrow(bad), "y", "text", iters=1)


def test_lr_first_grad_matches_closed_form(ray_session):
    import ray.data

    from tenzir_ray.stages.classify import lr_grad_buckets

    tbl = pa.table({"text": ["w w", "w"], "y": [1, 0]})
    out = lr_grad_buckets(ray.data.from_arrow(tbl), "y", "text",
                          buckets=16)
    # one bucket: tokens 2*(y=1) + 1*(y=0): 2*(1-2) + 1*(1-0) = -1
    assert out.num_rows == 1
    assert out.column("g2").to_pylist() == [-1]
    assert out.column("cnt").to_pylist() == [3]
