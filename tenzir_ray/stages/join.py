"""Large-large joins on the packed-IPC hash exchange.

The reference has NO stream-stream join (SURVEY §2.5 notes the absence;
enrichment contexts are its only join-like construct) — this is an
engine extension, built on :mod:`tenzir_ray.stages.exchange` (the
shuffle design the CDC lake proved 2-3x faster than Ray's shuffle
backends for partition-keyed patterns):

- both sides exchange into ``num_buckets`` hash buckets (default 8x
  CPUs) as packed Arrow-IPC files — fine-grained, so no bucket holds a
  large fraction of either side;
- reduce tasks are formed by coalescing buckets by MEASURED bytes from
  the stage-1 stats (task size tracks data size; hot buckets stay
  isolated);
- each task joins its buckets in ARROW (`pa.Table.join` — typed null
  padding on outer rows; never object-dtype pandas blocks), or via
  ``pd.merge_asof`` for the as-of variant with an explicit typed cast
  back to the target Arrow schema.

Broadcast `state.context.enrich` remains the right tool for small
dimension sides. Cluster note: the exchange staging dir must live on
shared storage (same documented assumption as the CDC lake).
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa

from tenzir_ray._ship import ship_by_value
from tenzir_ray.stages.exchange import (
    Exchange,
    coalesce_tasks,
    default_buckets,
)


def _arrow_schema(ds_schema, rename: dict | None = None) -> pa.Schema:
    ren = rename or {}
    return pa.schema(
        [pa.field(ren.get(n, n), t) for n, t in zip(ds_schema.names, ds_schema.types)]
    )


def _task_buckets(batch: pa.Table) -> list[int]:
    return [int(x) for x in batch.column("buckets").to_pylist()[0]]


class _HashJoinReducer:
    def __init__(self, read_l, read_r, lkeys, rkeys, how, out_cols):
        self.read_l = read_l
        self.read_r = read_r
        self.lkeys = lkeys
        self.rkeys = rkeys
        self.join_type = {"inner": "inner", "left": "left outer"}[how]
        self.coalesce = lkeys == rkeys
        self.out_cols = out_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        bl = _task_buckets(batch)
        ltbl = self.read_l(bl)
        rtbl = self.read_r(bl)
        joined = ltbl.join(
            rtbl,
            keys=self.lkeys,
            right_keys=self.rkeys,
            join_type=self.join_type,
            coalesce_keys=self.coalesce,
        )
        return joined.select(self.out_cols).combine_chunks()


def hash_join(left, right, on: str | list[str], right_on: str | list[str] | None = None,
              how: str = "inner", right_suffix: str = "_r",
              num_buckets: int | None = None,
              target_task_bytes: int = 128 << 20,
              batch_size: int | None = 65536,
              transport: str | None = None,
              staging_root: str | None = None):
    """Co-partitioned hash join of two Datasets via the packed exchange.

    ``on``/``right_on`` name the key columns; overlapping non-key columns
    from the right get ``right_suffix``. Supported ``how``: inner, left.
    When the two sides' key names differ, both key columns appear in the
    output (pandas-merge convention); identical names coalesce into one.
    ``transport``: "fs" (packed-IPC staging; needs shared storage
    multi-node — configure via ``staging_root`` / $TENZIR_RAY_EXCHANGE_ROOT)
    or "object" (Ray object store, no shared-FS requirement).
    """
    import ray.data

    lkeys = [on] if isinstance(on, str) else list(on)
    rkeys = lkeys if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on)
    )
    lschema, rschema = left.schema(), right.schema()
    lcols = lschema.names
    key_partner = dict(zip(rkeys, lkeys))
    rename_r = {}
    for c in rschema.names:
        if c in rkeys:
            # a right KEY keeps its name unless it collides with a left
            # column other than its own join partner (which would create
            # duplicate output columns)
            clash = c in lcols and key_partner[c] != c
            rename_r[c] = c + right_suffix if clash else c
        else:
            rename_r[c] = c + right_suffix if c in lcols else c
    r_key_names = [rename_r.get(k, k) for k in rkeys]
    l_arrow = _arrow_schema(lschema)
    r_arrow = _arrow_schema(rschema, rename_r)

    # Arrow's hash join needs IDENTICAL key types; widen each key pair to
    # the common type (int32+int64 → int64 etc., the registry lattice)
    from tenzir_ray.cdc.registry import widen

    l_casts: dict[str, pa.DataType] = {}
    r_casts: dict[str, pa.DataType] = {}
    for lk, rk in zip(lkeys, r_key_names):
        lt = l_arrow.field(lk).type
        rt = r_arrow.field(rk).type
        if not lt.equals(rt):
            wt = widen(lt, rt)
            l_casts[lk] = wt
            r_casts[rk] = wt
            l_arrow = l_arrow.set(
                l_arrow.get_field_index(lk), pa.field(lk, wt)
            )
            r_arrow = r_arrow.set(
                r_arrow.get_field_index(rk), pa.field(rk, wt)
            )

    coalesce = lkeys == r_key_names
    out_cols = list(lcols) + [
        c for c in r_arrow.names
        if not (coalesce and c in lkeys) and c not in lcols
    ]

    B = num_buckets or default_buckets()
    ex = Exchange("join", transport, staging_root)

    def _cast_cols(casts: dict):
        def f(b: pa.Table) -> pa.Table:
            for name, t in casts.items():
                i = b.schema.get_field_index(name)
                b = b.set_column(i, name, b.column(name).cast(t))
            return b

        return f

    def _ren(b: pa.Table) -> pa.Table:
        b = b.rename_columns([rename_r.get(c, c) for c in b.column_names])
        return _cast_cols(r_casts)(b)

    lidx, lbytes = ex.run(
        left, lkeys, B, "l",
        transform=_cast_cols(l_casts) if l_casts else None,
        batch_size=batch_size,
    )
    ridx, rbytes = ex.run(
        right, r_key_names, B, "r", transform=_ren, batch_size=batch_size
    )
    relevant = set(lidx) & set(ridx) if how == "inner" else set(lidx)
    total = {b: lbytes.get(b, 0) + rbytes.get(b, 0) for b in relevant}
    tasks = coalesce_tasks(list(relevant), total, target_task_bytes)
    reducer = _HashJoinReducer(
        ex.reader(lidx, l_arrow), ex.reader(ridx, r_arrow),
        lkeys, r_key_names, how, out_cols,
    )
    if not tasks:
        empty = reducer(pa.table({"buckets": pa.array([[]], pa.list_(pa.int64()))}))
        return ray.data.from_arrow(empty)
    return ray.data.from_items([{"buckets": t} for t in tasks]).map_batches(
        reducer, batch_format="pyarrow", batch_size=1
    )


class _AsofReducer:
    def __init__(self, read_l, read_r, keys, on, direction, out_schema):
        self.read_l = read_l
        self.read_r = read_r
        self.keys = keys
        self.on = on
        self.direction = direction
        self.out_schema = out_schema

    def __call__(self, batch: pa.Table) -> pa.Table:
        bl = _task_buckets(batch)
        ltbl = self.read_l(bl)
        rtbl = self.read_r(bl)
        lhs = ltbl.to_pandas().sort_values(self.on, kind="mergesort")
        if rtbl.num_rows == 0:
            # typed null padding straight in Arrow — no pandas objects
            out = ltbl
            for f in self.out_schema:
                if f.name not in out.column_names:
                    out = out.append_column(f.name, pa.nulls(out.num_rows, f.type))
            return out.select(self.out_schema.names)
        rhs = rtbl.to_pandas().sort_values(self.on, kind="mergesort")
        # string timestamp columns (post NDJSON/syslog parse) merge on
        # their datetime interpretation; the output keeps the ORIGINAL
        # left strings so the typed schema cast below still holds
        orig_on = None
        if lhs[self.on].dtype == object or rhs[self.on].dtype == object:
            orig = lhs[self.on].copy()
            lhs = lhs.assign(**{self.on: pd.to_datetime(lhs[self.on])})
            rhs = rhs.assign(**{self.on: pd.to_datetime(rhs[self.on])})
            order = np.argsort(lhs[self.on].to_numpy(), kind="stable")
            lhs = lhs.iloc[order]
            orig_on = orig.iloc[order]
            rhs = rhs.sort_values(self.on, kind="mergesort")
        merged = pd.merge_asof(
            lhs, rhs, on=self.on, by=self.keys, direction=self.direction
        )
        if orig_on is not None:
            # merge_asof preserves left row order/count — restore positionally
            merged[self.on] = orig_on.to_numpy()
        # cast back to the target Arrow schema: unmatched rows turned int
        # columns into float64-with-NaN in pandas; from_pandas restores
        # the typed column with nulls, identical across all tasks
        arrays = [
            pa.array(merged[f.name], type=f.type, from_pandas=True)
            for f in self.out_schema
        ]
        return pa.Table.from_arrays(arrays, schema=self.out_schema)


def asof_join(left, right, by: str | list[str], on: str,
              direction: str = "backward", right_suffix: str = "_r",
              num_buckets: int | None = None,
              target_task_bytes: int = 128 << 20,
              batch_size: int | None = 65536,
              transport: str | None = None,
              staging_root: str | None = None):
    """As-of join: for each left row, the latest right row with
    ``right.on <= left.on`` (direction="backward") within the same
    ``by`` key — the time-series enrichment join. Both sides exchange on
    the BY key (every key's full history lands in one bucket), each
    reduce task runs one vectorized ``pd.merge_asof`` and emits rows cast
    to a fixed typed Arrow schema (no object-dtype padding)."""
    import ray.data

    keys = [by] if isinstance(by, str) else list(by)
    lschema, rschema = left.schema(), right.schema()
    lcols = lschema.names
    rename_r = {
        c: (c + right_suffix if c in lcols and c not in keys and c != on else c)
        for c in rschema.names
    }
    l_arrow = _arrow_schema(lschema)
    r_arrow = _arrow_schema(rschema, rename_r)

    # widen mismatched by/on key dtypes to their common type, mirroring
    # hash_join: key_buckets co-buckets int32-vs-int64 fine, but
    # pd.merge_asof raises MergeError on incompatible key dtypes at
    # reduce time — a late, confusing failure for inputs hash_join accepts
    from tenzir_ray.cdc.registry import widen

    l_casts: dict[str, pa.DataType] = {}
    r_casts: dict[str, pa.DataType] = {}
    for k in keys + [on]:
        lt = l_arrow.field(k).type
        rt = r_arrow.field(k).type
        if not lt.equals(rt):
            try:
                wt = widen(lt, rt)
            except TypeError:
                if k == on:
                    # e.g. string-vs-timestamp `on`: the reducer's
                    # to_datetime path reconciles those at merge time
                    continue
                raise
            l_casts[k] = wt
            r_casts[k] = wt
            l_arrow = l_arrow.set(l_arrow.get_field_index(k), pa.field(k, wt))
            r_arrow = r_arrow.set(r_arrow.get_field_index(k), pa.field(k, wt))

    out_schema = pa.schema(
        list(l_arrow)
        + [f for f in r_arrow if f.name not in keys and f.name != on]
    )

    B = num_buckets or default_buckets()
    ex = Exchange("asof", transport, staging_root)

    def _cast(b: pa.Table, casts: dict) -> pa.Table:
        for name, t in casts.items():
            i = b.schema.get_field_index(name)
            b = b.set_column(i, name, b.column(name).cast(t))
        return b

    def _ren(b: pa.Table) -> pa.Table:
        b = b.rename_columns([rename_r.get(c, c) for c in b.column_names])
        return _cast(b, r_casts) if r_casts else b

    lidx, lbytes = ex.run(
        left, keys, B, "l",
        transform=(lambda b: _cast(b, l_casts)) if l_casts else None,
        batch_size=batch_size,
    )
    ridx, rbytes = ex.run(right, keys, B, "r", transform=_ren, batch_size=batch_size)
    relevant = set(lidx)  # as-of is a left join
    total = {b: lbytes.get(b, 0) + rbytes.get(b, 0) for b in relevant}
    tasks = coalesce_tasks(list(relevant), total, target_task_bytes)
    reducer = _AsofReducer(
        ex.reader(lidx, l_arrow), ex.reader(ridx, r_arrow),
        keys, on, direction, out_schema,
    )
    if not tasks:
        return ray.data.from_arrow(out_schema.empty_table())
    return ray.data.from_items([{"buckets": t} for t in tasks]).map_batches(
        reducer, batch_format="pyarrow", batch_size=1
    )


ship_by_value(sys.modules[__name__])
