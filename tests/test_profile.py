"""One-pass dataset profiling (stages/profile.py)."""

import duckdb
import numpy as np
import pyarrow as pa

from tenzir_ray.stages.profile import profile

SF = "/root/testdata/sf0.001"


def _tbl():
    return pa.table({
        "i": pa.array([5, None, 100, 9, 10], pa.int64()),
        "f": pa.array([1.5, -2.5, None, None, 0.0], pa.float64()),
        "s": pa.array(["b", "a", "a", None, "z"]),
    })


def test_profile_exact_fields(ray_session):
    import ray.data

    out = profile(ray.data.from_arrow(_tbl())).to_pandas().set_index(
        "column")
    assert out.loc["i", "n"] == 5 and out.loc["i", "nulls"] == 1
    # typed merge: min is 5, not lexicographic "10"/"100"
    assert out.loc["i", "min"] == "5" and out.loc["i", "max"] == "100"
    assert out.loc["f", "min"] == "-2.5" and out.loc["f", "max"] == "1.5"
    assert out.loc["s", "min"] == "a" and out.loc["s", "max"] == "z"
    assert out.loc["s", "nulls"] == 1


def test_profile_typed_minmax_across_blocks(ray_session):
    import ray.data

    # "9" > "10" lexicographically — a string-repr merge would fail this
    out = profile(
        ray.data.from_arrow(_tbl()).repartition(5)
    ).to_pandas().set_index("column")
    assert out.loc["i", "min"] == "5" and out.loc["i", "max"] == "100"


def test_profile_mode_and_distinct(ray_session):
    import ray.data

    n = 3000
    vals = (["hot"] * 1500) + [f"v{i}" for i in range(1500)]
    ds = ray.data.from_arrow(pa.table({
        "s": pa.array(vals),
        "k": pa.array(list(range(n)), pa.int64()),
    })).repartition(7)
    out = profile(ds).to_pandas().set_index("column")
    assert out.loc["s", "top_value"] == "hot"
    assert out.loc["s", "top_count"] >= 1400  # MG estimate <= true count
    # HLL within 5% on both columns
    assert abs(out.loc["k", "approx_distinct"] - n) / n < 0.05
    assert abs(out.loc["s", "approx_distinct"] - 1501) / 1501 < 0.05


def test_profile_vs_duckdb_summarize(ray_session):
    import ray.data

    ds = ray.data.read_parquet(f"{SF}/orders.parquet",
                               columns=["o_orderkey", "o_totalprice"])
    out = profile(ds).to_pandas().set_index("column")
    want = duckdb.sql(
        f"""SELECT count(*) n, min(o_orderkey) mn, max(o_orderkey) mx,
                   min(o_totalprice) fmn
            FROM read_parquet('{SF}/orders.parquet')"""
    ).df().iloc[0]
    assert out.loc["o_orderkey", "n"] == want["n"]
    assert out.loc["o_orderkey", "min"] == str(int(want["mn"]))
    assert out.loc["o_orderkey", "max"] == str(int(want["mx"]))
    assert out.loc["o_totalprice", "min"] == str(float(want["fmn"]))


def test_profile_nested_and_empty(ray_session):
    import ray.data

    tbl = pa.table({
        "v": pa.array([[1, 2], [3]], pa.list_(pa.int64())),
        "k": pa.array([1, 2], pa.int64()),
    })
    out = profile(ray.data.from_arrow(tbl)).to_pandas().set_index("column")
    assert out.loc["v", "min"] is None  # nested: no min/max
    assert out.loc["v", "n"] == 2
    empty = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    assert len(profile(empty)) == 0
