"""Round-4 additions: scale-proof bucketed-group family (exchange-backed
grouped_apply), and regression tests for the VERDICT r3 'next' list."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


# ---------------------------------------------------------------------------
# grouped_apply: the fixed-64-bucket replacement


def test_grouped_apply_matches_pandas_groupby(ray_session):
    from tenzir_ray.stages.exchange import grouped_apply

    rng = np.random.default_rng(7)
    n = 20_000
    tbl = pa.table({
        "k": rng.integers(0, 2_000, n),
        "v": rng.normal(size=n),
    })

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("k", as_index=False).agg(
            s=("v", "sum"), c=("v", "size"))

    out = (grouped_apply(_ds(tbl), ["k"], _agg, num_buckets=256)
           .to_pandas().sort_values("k", ignore_index=True))
    exp = (_agg(tbl.to_pandas())
           .sort_values("k", ignore_index=True))
    assert out["k"].tolist() == exp["k"].tolist()
    assert np.allclose(out["s"], exp["s"])
    assert out["c"].tolist() == exp["c"].tolist()


def test_grouped_apply_parallelism_exceeds_64_and_bounds_task_bytes(
        ray_session):
    """VERDICT r3 #1 'done' check: with fine buckets the reduce stage can
    exceed the old 64-way ceiling, and every task's input is bounded by
    MEASURED bytes (a lone hot bucket still gets its own task)."""
    from tenzir_ray.stages.exchange import (
        Exchange,
        coalesce_tasks,
        default_buckets,
    )

    rng = np.random.default_rng(11)
    n = 60_000
    tbl = pa.table({
        "k": rng.integers(0, 5_000, n),
        "v": rng.integers(0, 1 << 30, n),
    })
    B = 512
    ex = Exchange("t_grp")
    idx, nbytes = ex.run(_ds(tbl), ["k"], B, "g")
    target = 8 << 10  # 8 KiB per task → many tasks
    tasks = coalesce_tasks(list(idx), nbytes, target_bytes=target)
    assert len(tasks) > 64, len(tasks)
    biggest_bucket = max(nbytes.values())
    for t in tasks:
        task_bytes = sum(nbytes[b] for b in t)
        # bound: a task is ≤ target unless it is one oversized bucket
        assert task_bytes <= max(target, biggest_bucket) + target
    # every bucket lands in exactly one task
    flat = [b for t in tasks for b in t]
    assert sorted(flat) == sorted(idx)
    # and the default policy scales with the cluster, not a constant
    assert default_buckets() >= 32


def test_grouped_apply_full_row_key_and_empty(ray_session):
    from tenzir_ray.stages.exchange import grouped_apply

    tbl = pa.table({"a": [1, 1, 2, 2, 1], "b": ["x", "x", "y", "y", "x"]})

    def _distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    out = (grouped_apply(_ds(tbl), None, _distinct)
           .to_pandas().sort_values(["a", "b"], ignore_index=True))
    assert out.to_dict("list") == {"a": [1, 2], "b": ["x", "y"]}

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.string())})
    assert grouped_apply(_ds(empty), None, _distinct).count() == 0


def test_enumerate_global_unbiased_string_edges(ray_session):
    """Sorted high-skew string key: per-block quantile grids keep the
    range buckets balanced (a first-blocks prefix sample saw only the
    low cluster and put all remaining data in one bucket)."""
    import ray.data

    from tenzir_ray.stages import transforms as T

    # sorted + clustered: 20k copies of a LOW key first, then 20k
    # distinct high keys — the old prefix sample saw only "aaaa"
    keys = ["aaaa"] * 20_000 + [f"z{i:08d}" for i in range(20_000)]
    tbl = pa.table({"k": keys, "i": np.arange(40_000, dtype=np.int64)})
    ds = ray.data.from_arrow(tbl).repartition(20)

    edges = T._order_edges(ds, "k", 16)
    assert len(edges) >= 8, edges  # many usable cut points, not 0-1
    # bucket histogram: no range bucket should hold (almost) everything
    # beyond the unavoidable single-value "aaaa" cluster (50% of rows)
    b = np.searchsorted(edges, np.array(keys, dtype=object), side="right")
    _, counts = np.unique(b, return_counts=True)
    assert counts.max() <= 23_000, counts

    out = T.enumerate_global(ds, "k", out="rn").to_pandas()
    got = out.sort_values("rn")["k"].tolist()
    assert got == sorted(keys)
    assert sorted(out["rn"]) == list(range(40_000))


def test_taste_and_unique_over_exchange_high_card(ray_session):
    """taste/unique route over the exchange now; exactness on a key space
    larger than any fixed bucket count."""
    from tenzir_ray.stages import transforms as T

    rng = np.random.default_rng(3)
    n = 30_000
    tbl = pa.table({
        "k": rng.integers(0, 9_000, n),
        "o": np.arange(n, dtype=np.int64),
    })
    out = T.taste(_ds(tbl), 2, by="k", order_by="o").to_pandas()
    exp = (tbl.to_pandas().sort_values("o", kind="mergesort")
           .groupby("k").head(2))
    assert len(out) == len(exp)
    got = out.sort_values(["k", "o"], ignore_index=True)
    want = exp.sort_values(["k", "o"], ignore_index=True)
    assert got["o"].tolist() == want["o"].tolist()

    uq = T.unique(_ds(tbl), by=["k"]).to_pandas()
    assert len(uq) == tbl.to_pandas()["k"].nunique()
