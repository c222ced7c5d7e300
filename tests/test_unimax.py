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


def test_unimax_sample_null_group(ray_session):
    # null keys form a real group: they receive and use their allocation
    import ray.data

    tbl = pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "lang": pa.array((["en"] * 30) + ([None] * 10)),
    })
    ds = ray.data.from_arrow(tbl)
    out = unimax_sample(ds, by="lang", key="doc_id", total=30,
                        max_epochs=2).to_pandas()
    # waterfall: null cap 20 vs en cap 60 -> null takes 15, en takes 15
    nulls = out[out["lang"].isna()]
    ens = out[out["lang"] == "en"]
    assert len(nulls) == 15 and len(ens) == 15
    assert unimax_allocation({"en": 30, float("nan"): 10}, 30,
                             max_epochs=2)["en"] == 15


def test_unimax_sample_empty_input_has_epoch(ray_session):
    import ray.data

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "lang": pa.array([], pa.string()),
    }))
    out = unimax_sample(empty, by="lang", key="doc_id", total=10)
    # Dataset-level schema carries the epoch column (Ray's to_pandas
    # drops columns from zero-row datasets, so assert on schema())
    assert out.schema().names == ["doc_id", "lang", "epoch"]
    assert out.count() == 0


def test_temperature_sample_null_group(ray_session):
    import ray.data

    from tenzir_ray.stages.splits import temperature_sample

    tbl = pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "lang": pa.array((["en"] * 30) + ([None] * 10)),
    })
    out = temperature_sample(
        ray.data.from_arrow(tbl), by="lang", key="doc_id", total=20,
        alpha=0.5,
    ).to_pandas()
    # w = sqrt(30), sqrt(10); null group's share must be TAKEN, not dropped
    import numpy as _np
    s = _np.sqrt(30) + _np.sqrt(10)
    want_null = min(10, int(_np.floor(20 * _np.sqrt(10) / s)))
    assert len(out[out["lang"].isna()]) == want_null


def test_weighted_sample_proportional_and_deterministic(ray_session):
    import ray.data

    from tenzir_ray.stages.splits import weighted_sample

    n = 5000
    rng = np.random.default_rng(4)
    keys = rng.permutation(n)
    w = np.where(np.arange(n) % 10 == 0, 100.0, 1.0)  # 10% heavy rows
    tbl = pa.table({
        "k": pa.array([int(x) for x in keys], pa.int64()),
        "w": pa.array(w[keys], pa.float64()),
    })
    ds = ray.data.from_arrow(tbl)
    out = weighted_sample(ds, key="k", weight="w", n=500).to_pandas()
    assert len(out) == 500
    heavy = (out["w"] == 100.0).mean()
    # heavy rows are 10% of the population but ~10x more likely
    assert heavy > 0.4
    # deterministic under repartitioning
    out2 = weighted_sample(ds.repartition(13), key="k", weight="w",
                           n=500).to_pandas()
    assert sorted(out["k"]) == sorted(out2["k"])


def test_weighted_sample_edge_weights(ray_session):
    import ray.data

    from tenzir_ray.stages.splits import weighted_sample

    tbl = pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "w": pa.array([1.0, 0.0, -5.0, None], pa.float64()),
    })
    out = weighted_sample(ray.data.from_arrow(tbl), "k", "w",
                          n=4).to_pandas()
    # zero/negative/null weights can never be selected ahead of w>0...
    # only row k=1 has positive score; others score 0 and fill the tail
    assert out.iloc[0]["k"] == 1
