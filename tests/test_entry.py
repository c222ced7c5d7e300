"""Mirror of the driver's correctness gate: run every queries() entry and
compare against oracle_sql() via DuckDB (row count + column names + sorted
values), and rows-only sanity for the non-SQL entries."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).df()


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


ORACLE = E.oracle_sql()
ALL = None  # filled lazily inside test to keep collection cheap


@pytest.mark.parametrize("name", list(E.queries().keys()))
def test_query_against_oracle(ray_session, name):
    fn = E.queries()[name]
    got = _to_df(fn(SF))
    if name not in ORACLE:
        assert len(got) >= 0  # rows-only: must run and have a stable schema
        assert list(got.columns)
        return
    want = _duck(ORACLE[name])
    assert sorted(got.columns) == sorted(want.columns), (
        name, sorted(got.columns), sorted(want.columns))
    assert len(got) == len(want), (name, len(got), len(want))
    cols = sorted(got.columns)
    from tools.check import stringify_list_cells

    g = stringify_list_cells(got[cols]).sort_values(cols, ignore_index=True)
    w = stringify_list_cells(want[cols]).sort_values(cols, ignore_index=True)
    for c in cols:
        if g[c].dtype.kind == "f" or w[c].dtype.kind == "f":
            gg = g[c].astype(float).to_numpy()
            ww = w[c].astype(float).to_numpy()
            assert np.allclose(gg, ww, rtol=1e-9, atol=1e-9, equal_nan=True), (name, c)
        else:
            assert g[c].astype(str).equals(w[c].astype(str)), (name, c)


def test_entry_smoke(ray_session):
    res = E.entry()
    df = _to_df(res)
    assert len(df) > 0
    assert {"conv_id", "turn_idx", "role", "text", "tool", "ts"} <= set(df.columns)
