"""UniMax epoch-capped sampling (splits.unimax_sample /
unimax_allocation)."""

import numpy as np
import pyarrow as pa
import pytest

from tenzir_ray.stages.splits import unimax_allocation, unimax_sample


def test_allocation_waterfall_saturates_small_groups():
    counts = {"a": 10, "b": 100, "c": 1000}
    # budget 600, 2 epochs: a caps at 20, b caps at 200, c takes the rest
    n = unimax_allocation(counts, 600, max_epochs=2)
    assert n == {"a": 20, "b": 200, "c": 380}
    assert sum(n.values()) == 600


def test_allocation_uniform_when_budget_small():
    counts = {"a": 100, "b": 100, "c": 100}
    n = unimax_allocation(counts, 90, max_epochs=1)
    assert n == {"a": 30, "b": 30, "c": 30}


def test_allocation_budget_exceeds_all_caps():
    counts = {"a": 5, "b": 7}
    n = unimax_allocation(counts, 1000, max_epochs=2)
    assert n == {"a": 10, "b": 14}


def _docs():
    rng = np.random.default_rng(2)
    langs = ["lo"] * 30 + ["hi"] * 300
    ids = rng.permutation(len(langs))
    return pa.table({
        "doc_id": pa.array([int(i) for i in ids], pa.int64()),
        "lang": pa.array(langs),
    })


def test_unimax_sample_epochs(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_docs())
    out = unimax_sample(ds, by="lang", key="doc_id", total=200,
                        max_epochs=3).to_pandas()
    # waterfall: lo caps at 90 (3 epochs x 30), hi takes 110
    lo = out[out["lang"] == "lo"]
    hi = out[out["lang"] == "hi"]
    assert len(lo) == 90 and len(hi) == 110
    # every lo row appears exactly 3 times, epochs 0/1/2
    per = lo.groupby("doc_id")["epoch"].agg(["count", "min", "max"])
    assert (per["count"] == 3).all()
    assert (per["min"] == 0).all() and (per["max"] == 2).all()
    # hi: 110 of 300 rows, all epoch 0, no repeats
    assert hi["epoch"].eq(0).all()
    assert hi["doc_id"].is_unique


def test_unimax_sample_partitioning_independent(ray_session):
    import ray.data

    a = unimax_sample(ray.data.from_arrow(_docs()), "lang", "doc_id",
                      total=150, max_epochs=2).to_pandas()
    b = unimax_sample(ray.data.from_arrow(_docs()).repartition(7),
                      "lang", "doc_id", total=150, max_epochs=2).to_pandas()
    key = ["doc_id", "lang", "epoch"]
    assert (a.sort_values(key).reset_index(drop=True)
            .equals(b.sort_values(key).reset_index(drop=True)))


def test_unimax_sample_validation(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_docs())
    with pytest.raises(ValueError, match="total"):
        unimax_sample(ds, "lang", "doc_id", total=-1)
    with pytest.raises(ValueError, match="max_epochs"):
        unimax_sample(ds, "lang", "doc_id", total=10, max_epochs=0)
