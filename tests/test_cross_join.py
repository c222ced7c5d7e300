"""Broadcast cross/theta join vs DuckDB."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


@pytest.fixture(scope="module")
def sides():
    rng = np.random.default_rng(2)
    A = pa.table({"k": rng.integers(0, 50, 5_000),
                  "v": rng.normal(size=5_000)})
    B = pa.table({"lo": np.arange(0, 50, 10.0),
                  "name": [f"b{i}" for i in range(5)],
                  "v": np.arange(5.0)})
    return A, B


def test_cross_join_cartesian(ray_session, sides):
    from tenzir_ray.stages.join import cross_join

    A, B = sides
    got = cross_join(_ds(A), _ds(B)).to_pandas()
    assert len(got) == len(A) * len(B)
    # overlapping right column gets the suffix
    assert sorted(got.columns) == ["k", "lo", "name", "v", "v_r"]


def test_cross_join_theta_condition(ray_session, sides):
    import duckdb

    from tenzir_ray.stages.join import cross_join

    A, B = sides
    got = cross_join(
        _ds(A), _ds(B),
        condition="k >= lo and k < lo + 10 and v > v_r").to_pandas()
    TA, TB = A.to_pandas(), B.to_pandas()  # noqa: F841
    want = duckdb.sql(
        "SELECT a.k, a.v, b.lo, b.name, b.v AS v_r FROM TA a JOIN TB b "
        "ON a.k >= b.lo AND a.k < b.lo + 10 AND a.v > b.v").df()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols, ignore_index=True)
    w = want[cols].sort_values(cols, ignore_index=True)
    assert g.shape == w.shape
    for c in cols:
        assert (g[c].values == w[c].values).all(), c


def test_cross_join_size_gate_and_empty(ray_session, sides):
    from tenzir_ray.stages.join import cross_join

    A, _ = sides
    with pytest.raises(ValueError, match="broadcast gate"):
        cross_join(_ds(A), _ds(A), max_broadcast_bytes=1_000)
    E = pa.table({"x": pa.array([], pa.int64())})
    out = cross_join(_ds(A), _ds(E)).to_pandas()
    assert len(out) == 0


def test_cross_join_tql(ray_session, tmp_path, sides):
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines.tql import run_pipeline

    A, B = sides
    pq.write_table(A, tmp_path / "a.parquet")
    pq.write_table(B, tmp_path / "b.parquet")
    out = run_pipeline(
        f'read_parquet "{tmp_path}/a.parquet" '
        f'| cross_join right=( read_parquet "{tmp_path}/b.parquet" ) '
        'condition="k >= lo and k < lo + 10" '
        "| summarize n=count(*) by name | sort name"
    ).to_pandas()
    assert len(out) == 5 and out["n"].sum() == len(A)
