#!/usr/bin/env python
"""Local emulation of the driver's correctness gate: run each
``__ray_entry__.queries()`` entry AND its ``oracle_sql()`` DuckDB query
over the same sf dir, compare row count, schema (column names), and an
order-insensitive value hash (columns sorted by name, rows sorted by all
columns, exact values).

    python tools/check.py [sf_dir] [query ...]

Exit code 0 iff every checked query matches.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def stringify_list_cells(df: pd.DataFrame) -> pd.DataFrame:
    """list/array cells are unhashable for pandas' multi-key sort;
    canonicalize them to JSON strings (shared with tests/test_entry.py
    so the two oracle compares can't diverge)."""
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: json.dumps(list(v), default=str)
                if isinstance(v, (list, np.ndarray))
                else v
            )
    return df


def _dtype_class(dt) -> str:
    """Canonical dtype class mirroring the driver's value-representation
    sensitivity (calibrated against 4 rounds of driver records): integer
    width/signedness differences hash green (int64 vs uint64/int32 —
    lr_grad_docs, unicode_norm_docs, doc_langid all driver-green), but
    float-vs-int ("3.0" vs "3"), pandas extension dtypes ("<NA>" vs
    "nan"), and bool-vs-int ("True" vs "1") hash red even when every
    value matches (r4's three driver-reds)."""
    s = str(dt)
    if pd.api.types.is_extension_array_dtype(dt):
        return f"EXTENSION:{s}"  # never canonical; DuckDB .df() has none
    kind = getattr(dt, "kind", "")
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if s.startswith("datetime64"):
        return "datetime"
    if s.startswith("timedelta64"):
        return "timedelta"
    return s


def dtype_mismatches(res: pd.DataFrame, exp: pd.DataFrame) -> list:
    """Driver-fidelity dtype check over ``result.to_pandas()`` vs DuckDB
    ``.df()`` — see :func:`_dtype_class`. Local green predicts driver
    green; the old value-only hash let float-widened ints and pandas
    Int64 columns pass locally and red at the driver."""
    bad = []
    for c in sorted(set(res.columns) & set(exp.columns)):
        a, b = _dtype_class(res[c].dtype), _dtype_class(exp[c].dtype)
        if a != b:
            bad.append((c, str(res[c].dtype), str(exp[c].dtype)))
    return bad


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = stringify_list_cells(df[sorted(df.columns)])
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("uint32", "Int64"):
            # width/extension nuisance dtypes still compare by VALUE
            # (the strict dtype gate reports them separately)
            df[c] = df[c].astype("float64") if df[c].isna().any() else df[c].astype("int64", errors="ignore")
    try:
        df = df.sort_values(list(df.columns), kind="mergesort", ignore_index=True)
    except Exception:
        df = df.sort_values(
            list(df.columns), key=lambda s: s.astype(str), kind="mergesort",
            ignore_index=True,
        )
    return df


def _values_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if a.shape != b.shape:
        return False
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind in "iu" and bv.dtype.kind in "iu" \
                and av.dtype != bv.dtype:
            # mixed uint64/int64 would promote to float64 and lose
            # exactness above 2^53 (md5-hash columns live up there);
            # compare as Python ints instead
            if av.tolist() != bv.tolist():
                return False
            continue
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af = av.astype(np.float64)
            bf = bv.astype(np.float64)
            both_nan = np.isnan(af) & np.isnan(bf)
            if not np.all(both_nan | (af == bf)):
                return False
        else:
            am = pd.isna(av)
            bm = pd.isna(bv)
            if not (np.array_equal(am, bm) and np.array_equal(av[~am], bv[~bm])):
                return False
    return True


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if not os.path.isdir(a)]

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = only or list(queries)
    failures = []
    for name in names:
        fn = queries[name]
        try:
            res = _to_pandas(fn(sf))
        except Exception as e:
            failures.append(name)
            print(f"{name}: RAY ERROR {type(e).__name__}: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name}: rows={len(res)} (no_oracle)")
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            failures.append(name)
            print(f"{name}: SQL ERROR {type(e).__name__}: {e}")
            continue
        a, b = _canon(res), _canon(exp)
        rows_ok = len(a) == len(b)
        schema_ok = list(a.columns) == list(b.columns)
        dt_bad = dtype_mismatches(res, exp) if schema_ok else []
        vals_ok = rows_ok and schema_ok and _values_equal(a, b)
        status = "OK" if (rows_ok and schema_ok and vals_ok and not dt_bad) else "FAIL"
        if status == "FAIL":
            failures.append(name)
            print(f"{name}: {status} rows {len(a)}/{len(b)} schema_ok={schema_ok} "
                  f"cols_ray={list(a.columns)} cols_sql={list(b.columns)}")
            for c, da, db in dt_bad:
                print(f"  dtype mismatch col {c}: ray={da} sql={db}")
            if rows_ok and schema_ok:
                for c in a.columns:
                    try:
                        same = _values_equal(a[[c]], b[[c]])
                    except Exception:
                        same = False
                    if not same:
                        print(f"  mismatch col {c}: ray={a[c].head(3).tolist()} "
                              f"sql={b[c].head(3).tolist()}")
        else:
            print(f"{name}: OK rows={len(a)}")
    print(f"\n{len(names) - len(failures)}/{len(names)} ok; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
