"""SQL set operations (INTERSECT/EXCEPT, DISTINCT + ALL) vs DuckDB."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True,
                          key=lambda s: s.astype(str))


def _pair(seed=5, n=8_000):
    rng = np.random.default_rng(seed)
    A = pa.table({
        "k": rng.integers(0, 400, n),
        "s": rng.choice(np.array(["a", "b", "c", None]), n),
    })
    B = pa.table({
        # different column ORDER on purpose: right side must realign
        "s": rng.choice(np.array(["a", "b", "d", None]), n // 2),
        "k": rng.integers(0, 500, n // 2),
    })
    return A, B


@pytest.mark.parametrize("op,all_rows,sql", [
    ("intersect", False, "INTERSECT"),
    ("intersect", True, "INTERSECT ALL"),
    ("except", False, "EXCEPT"),
    ("except", True, "EXCEPT ALL"),
])
def test_setops_match_duckdb(ray_session, op, all_rows, sql):
    import duckdb

    from tenzir_ray.stages.setops import set_op

    A, B = _pair()
    got = _canon(set_op(_ds(A), _ds(B), op, all_rows=all_rows).to_pandas())
    con = duckdb.connect()
    con.register("A", A.to_pandas())
    con.register("B", B.to_pandas())
    want = _canon(con.execute(
        f"SELECT k, s FROM A {sql} SELECT k, s FROM B").df())
    assert got.shape == want.shape
    for c in got.columns:
        assert got[c].fillna("<N>").astype(str).tolist() \
            == want[c].fillna("<N>").astype(str).tolist(), c


def test_setops_nulls_compare_equal(ray_session):
    # the defining difference from join equality: (NULL,) appears on
    # both sides -> INTERSECT keeps it, EXCEPT drops it
    from tenzir_ray.stages.setops import except_, intersect

    A = pa.table({"s": pa.array(["x", None, None], pa.string())})
    B = pa.table({"s": pa.array([None, "y"], pa.string())})
    i = intersect(_ds(A), _ds(B)).to_pandas()
    assert i["s"].isna().tolist() == [True]
    e = except_(_ds(A), _ds(B)).to_pandas()
    assert e["s"].tolist() == ["x"]
    # ALL: two left NULLs minus one right NULL leaves one
    ea = except_(_ds(A), _ds(B), all_rows=True).to_pandas()
    assert sorted(ea["s"].fillna("<N>")) == ["<N>", "x"]


def test_setops_empty_and_errors(ray_session):
    from tenzir_ray.stages.setops import except_, intersect, set_op

    A = pa.table({"k": pa.array([1, 2, 2], pa.int64())})
    E = pa.table({"k": pa.array([], pa.int64())})
    assert sorted(except_(_ds(A), _ds(E)).to_pandas()["k"]) == [1, 2]
    assert len(intersect(_ds(A), _ds(E)).to_pandas()) == 0
    with pytest.raises(ValueError, match="column sets differ"):
        set_op(_ds(A), _ds(pa.table({"x": [1]})), "except")
    with pytest.raises(ValueError, match="op must be"):
        set_op(_ds(A), _ds(A), "union")


def test_setops_right_side_casts(ray_session):
    # int32 right casts to the left's int64
    from tenzir_ray.stages.setops import intersect

    A = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    B = pa.table({"k": pa.array([2, 3, 4], pa.int32())})
    got = sorted(intersect(_ds(A), _ds(B)).to_pandas()["k"])
    assert got == [2, 3]


def test_setops_tql_string(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines.tql import run_pipeline

    A = pa.table({"k": pa.array([1, 2, 3, 3], pa.int64())})
    B = pa.table({"k": pa.array([3, 4], pa.int64())})
    pq.write_table(A, tmp_path / "a.parquet")
    pq.write_table(B, tmp_path / "b.parquet")
    out = run_pipeline(
        f'read_parquet "{tmp_path}/a.parquet" '
        f'| except right=( read_parquet "{tmp_path}/b.parquet" )'
    ).to_pandas()
    assert sorted(out["k"]) == [1, 2]
    out = run_pipeline(
        f'read_parquet "{tmp_path}/a.parquet" '
        f'| intersect right=( read_parquet "{tmp_path}/b.parquet" )'
    ).to_pandas()
    assert sorted(out["k"]) == [3]


def test_union_by_name(ray_session):
    import duckdb
    import pyarrow as pa

    from tenzir_ray.stages.transforms import union_by_name

    A = pa.table({"id": pa.array([1, 2], pa.int32()), "v": [1.5, 2.5]})
    B = pa.table({"id": pa.array([3], pa.int64()), "name": ["x"]})
    C = pa.table({"name": ["y"], "v": [9.0]})
    out = union_by_name(_ds(A), _ds(B), _ds(C)).to_pandas()
    TA, TB, TC = A.to_pandas(), B.to_pandas(), C.to_pandas()  # noqa: F841
    want = duckdb.sql(
        "SELECT * FROM TA UNION ALL BY NAME SELECT * FROM TB "
        "UNION ALL BY NAME SELECT * FROM TC").df()
    g = _canon(out)
    w = _canon(want)
    assert g.shape == w.shape
    for c in g.columns:
        assert g[c].fillna("<N>").astype(str).tolist() \
            == w[c].fillna("<N>").astype(str).tolist(), c
    with pytest.raises(ValueError, match="column sets differ"):
        union_by_name(_ds(A), _ds(B), strict=True)
    with pytest.raises(ValueError, match="at least two"):
        union_by_name(_ds(A))
