"""One-pass dataset profiling — the ``SUMMARIZE``/``DESCRIBE`` analog
(reference: `show` aspects expose catalog stats,
libtenzir/builtins/operators/show.cpp; DuckDB's SUMMARIZE is the
SQL-world twin).

``profile(ds)`` returns ONE row per column with row/null counts, typed
min/max, an approximate distinct count (HyperLogLog, Flajolet et al.
2007 — same register math as summarize's approx_count_distinct) and the
most frequent value (Misra-Gries sketch, Misra & Gries 1982). All of it
comes from a single streaming ``map_batches`` pass: each batch emits a
tiny per-column partial (counts + min/max + HLL registers + MG
counters), and the driver merges #columns x #batches partial rows —
never the data. Mergeable sketches make the pass exact-once-over at any
scale; nothing shuffles."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from tenzir_ray._ship import ship_by_value

_P = 12  # HLL precision: ~1.6% standard error
_M = 1 << _P
_CAP = 256  # Misra-Gries counter bound


def _hll_add(regs: np.ndarray, values: pa.Array) -> np.ndarray:
    """Fold a column's distinct values into HLL registers (the
    summarize._hll register math, shared hash family)."""
    vals = pc.drop_null(values).unique()
    if len(vals) == 0:
        return regs
    h = pd.util.hash_array(
        np.asarray(vals.to_pylist(), dtype=object)
    ).astype(np.uint64)
    idx = (h >> np.uint64(64 - _P)).astype(np.int64)
    rest = h << np.uint64(_P)
    rank = np.ones(len(h), dtype=np.uint8)
    mask_bit = np.uint64(1) << np.uint64(63)
    work = rest.copy()
    for _ in range(64 - _P):
        zero = (work & mask_bit) == 0
        if not zero.any():
            break
        rank[zero] += 1
        work = work << np.uint64(1)
        work[~zero] = mask_bit
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> int:
    r = regs.astype(np.float64)
    alpha = 0.7213 / (1 + 1.079 / _M)
    est = alpha * _M * _M / np.sum(np.power(2.0, -r))
    zeros = int((r == 0).sum())
    if est <= 2.5 * _M and zeros:
        est = _M * np.log(_M / zeros)
    return int(round(est))


def _mg_combine(va, ca, vb, cb, capacity: int = _CAP):
    """Misra-Gries merge (Agarwal et al., Mergeable Summaries, PODS'12)."""
    v = np.concatenate([np.asarray(va, dtype=object),
                        np.asarray(vb, dtype=object)])
    c = np.concatenate([np.asarray(ca, dtype=np.int64),
                        np.asarray(cb, dtype=np.int64)])
    if len(v) == 0:
        return [], []
    u, inv = np.unique(v.astype(str), return_inverse=True)
    cc = np.bincount(inv, weights=c.astype(np.float64)).astype(np.int64)
    if len(u) > capacity:
        cut = np.partition(cc, -capacity - 1)[-capacity - 1]
        keep = cc > cut
        u, cc = u[keep], cc[keep] - cut
    return u.tolist(), cc.tolist()


def _supports_minmax(t: pa.DataType) -> bool:
    return (pa.types.is_integer(t) or pa.types.is_floating(t)
            or pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_timestamp(t) or pa.types.is_date(t)
            or pa.types.is_boolean(t))


class _ProfilePartial:
    """Per-batch partial: one row per column, sketches packed as
    Arrow-representable binaries/lists."""

    def __init__(self, columns: list[str] | None):
        self.columns = columns

    __name__ = "_ProfilePartial"

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = self.columns or batch.column_names
        out = {"column": [], "n": [], "nulls": [],
               "mn_i": [], "mx_i": [], "mn_f": [], "mx_f": [],
               "mn_s": [], "mx_s": [], "hll": [], "mg_v": [], "mg_c": []}
        for name in cols:
            col = batch.column(name).combine_chunks()
            out["column"].append(name)
            out["n"].append(batch.num_rows)
            out["nulls"].append(col.null_count)
            # typed min/max channels: merging across batches must compare
            # VALUES, not string reprs ("10" < "9" lexicographically) —
            # ints and floats keep native channels; timestamps/dates/
            # bools stringify (ISO strings ARE lexicographic-safe)
            mn_i = mx_i = mn_f = mx_f = mn_s = mx_s = None
            if _supports_minmax(col.type) and len(col) > col.null_count:
                mm = pc.min_max(col)
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                if pa.types.is_integer(col.type):
                    mn_i, mx_i = int(lo), int(hi)
                elif pa.types.is_floating(col.type):
                    mn_f, mx_f = float(lo), float(hi)
                else:
                    mn_s, mx_s = str(lo), str(hi)
            out["mn_i"].append(mn_i)
            out["mx_i"].append(mx_i)
            out["mn_f"].append(mn_f)
            out["mx_f"].append(mx_f)
            out["mn_s"].append(mn_s)
            out["mx_s"].append(mx_s)
            if pa.types.is_nested(col.type):
                # no unique/cast kernels for nested types: counts and
                # null stats still profile, sketches stay empty
                out["hll"].append(np.zeros(_M, np.uint8).tobytes())
                out["mg_v"].append([])
                out["mg_c"].append([])
                continue
            regs = _hll_add(np.zeros(_M, np.uint8), col)
            out["hll"].append(regs.tobytes())
            try:
                vc = pc.drop_null(col).cast(pa.string()).value_counts()
                v, c = _mg_combine(vc.field("values").to_pylist(),
                                   vc.field("counts").to_pylist(), [], [])
            except pa.ArrowNotImplementedError:
                v, c = [], []
            out["mg_v"].append(v)
            out["mg_c"].append([int(x) for x in c])
        return pa.table({
            "column": pa.array(out["column"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "nulls": pa.array(out["nulls"], pa.int64()),
            "mn_i": pa.array(out["mn_i"], pa.int64()),
            "mx_i": pa.array(out["mx_i"], pa.int64()),
            "mn_f": pa.array(out["mn_f"], pa.float64()),
            "mx_f": pa.array(out["mx_f"], pa.float64()),
            "mn_s": pa.array(out["mn_s"], pa.string()),
            "mx_s": pa.array(out["mx_s"], pa.string()),
            "hll": pa.array(out["hll"], pa.binary()),
            "mg_v": pa.array(out["mg_v"], pa.list_(pa.string())),
            "mg_c": pa.array(out["mg_c"], pa.list_(pa.int64())),
        })


def profile(ds, columns: list[str] | None = None) -> pa.Table:
    """Profile a Dataset in one streaming pass: one output row per
    column — (column, n, nulls, approx_distinct, min, max, top_value,
    top_count). min/max stringify the typed extremes (None for nested
    types); top_value is the Misra-Gries mode estimate."""
    import ray

    parts = ds.map_batches(_ProfilePartial(columns), batch_format="pyarrow")
    merged: dict[str, dict] = {}
    order: list[str] = []
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        if "column" not in t.column_names:
            continue  # empty input block kept its original schema
        for row in t.to_pylist():
            name = row["column"]
            m = merged.get(name)
            if m is None:
                order.append(name)
                row["hll"] = np.frombuffer(row["hll"], np.uint8).copy()
                merged[name] = row
                continue
            m["n"] += row["n"]
            m["nulls"] += row["nulls"]
            for k, op in (("mn_i", min), ("mn_f", min), ("mn_s", min),
                          ("mx_i", max), ("mx_f", max), ("mx_s", max)):
                if row[k] is not None:
                    m[k] = row[k] if m[k] is None else op(m[k], row[k])
            np.maximum(m["hll"], np.frombuffer(row["hll"], np.uint8),
                       out=m["hll"])
            m["mg_v"], m["mg_c"] = _mg_combine(
                m["mg_v"], m["mg_c"], row["mg_v"], row["mg_c"])
    rows = []
    for name in order:
        m = merged[name]
        if m["mg_c"]:
            i = int(np.lexsort(
                (np.asarray(m["mg_v"], dtype=object),
                 -np.asarray(m["mg_c"], dtype=np.int64)))[0])
            top_v, top_c = m["mg_v"][i], int(m["mg_c"][i])
        else:
            top_v, top_c = None, 0
        def _fmt(i, f, st):
            if i is not None:
                return str(i)
            if f is not None:
                return str(f)
            return st

        rows.append({
            "column": name, "n": m["n"], "nulls": m["nulls"],
            "approx_distinct": _hll_estimate(m["hll"]),
            "min": _fmt(m["mn_i"], m["mn_f"], m["mn_s"]),
            "max": _fmt(m["mx_i"], m["mx_f"], m["mx_s"]),
            "top_value": top_v, "top_count": top_c,
        })
    schema = pa.schema([
        ("column", pa.string()), ("n", pa.int64()), ("nulls", pa.int64()),
        ("approx_distinct", pa.int64()), ("min", pa.string()),
        ("max", pa.string()), ("top_value", pa.string()),
        ("top_count", pa.int64()),
    ])
    return pa.Table.from_pylist(rows, schema=schema)


ship_by_value(sys.modules[__name__])
