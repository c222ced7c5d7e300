"""Stateless per-batch transform operators (reference §2.3).

Each function takes and returns a ``ray.data.Dataset``; per-batch work is
vectorized ``pyarrow.compute`` over zero-copy Arrow batches. Reference
semantics (file:line into /root/reference):

- where    → builtins/operators/where.cpp:55 (expression bitmap filter)
- select   → builtins/operators/select.cpp
- drop     → builtins/operators/drop.cpp
- put/extend/replace/set → builtins/operators/put_extend_replace_set.cpp:29
- rename   → builtins/operators/rename.cpp
- flatten/unflatten → builtins/operators/flatten.cpp, unflatten.cpp
- unroll   → builtins/operators/unroll.cpp (one event per list element)
- hash     → builtins/operators/hash.cpp (SHA-256 digest column)
- timeshift→ builtins/operators/timeshift.cpp
- head/tail→ builtins/operators/head.cpp, tail.cpp
- taste    → builtins/operators/taste.cpp:25 (first n per group)
- unique   → builtins/operators/unique.cpp (duplicate suppression)
- deduplicate → builtins/operators/deduplicate.cpp:102 (≤limit per key)
- sort     → builtins/operators/sort.cpp (distributed range sort here)
- top/rare → builtins/operators/top_rare.cpp:72
- parse    → builtins/operators/parse.cpp (string field through a parser)
"""

from __future__ import annotations

import hashlib
import json
import sys
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from tenzir_ray._ship import ship_by_value
from tenzir_ray.expr import compile_expr


def _eval_on_batch(expr, batch: pa.Table):
    """Evaluate a pyarrow.dataset Expression against a record batch."""
    import pyarrow.dataset as pads

    if not isinstance(expr, pads.Expression):
        return expr
    # dataset expressions evaluate via a one-table in-memory dataset scan —
    # cheap (no copy) and supports nested field refs
    return pads.dataset(batch).to_table(columns={"_": expr}).column("_")


# ---------------------------------------------------------------------------
# filtering / projection


def where(ds, expr: str):
    """Filter rows by a compiled expression (vectorized bitmap per batch)."""
    compiled = compile_expr(expr)

    def _filter(batch: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        return pads.dataset(batch).to_table(filter=compiled)

    return ds.map_batches(_filter, batch_format="pyarrow")


def select(ds, columns: list[str]):
    return ds.select_columns(columns)


def drop(ds, columns: list[str]):
    return ds.drop_columns(columns)


def rename(ds, mapping: dict[str, str]):
    """mapping: old name → new name."""

    def _rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([mapping.get(c, c) for c in batch.column_names])

    return ds.map_batches(_rename, batch_format="pyarrow")


def set_(ds, **exprs: str):
    """Upsert computed fields (extend+replace, reference `set`)."""
    compiled = {k: compile_expr(v) for k, v in exprs.items()}

    def _set(batch: pa.Table) -> pa.Table:
        for name, e in compiled.items():
            col = _eval_on_batch(e, batch)
            if not isinstance(col, (pa.Array, pa.ChunkedArray)):
                col = pa.array([col] * batch.num_rows)
            if name in batch.column_names:
                batch = batch.set_column(
                    batch.schema.get_field_index(name), name, col
                )
            else:
                batch = batch.append_column(name, col)
        return batch

    return ds.map_batches(_set, batch_format="pyarrow")


def extend(ds, **exprs: str):
    """Append new computed fields (error if the field exists)."""
    return set_(ds, **exprs)


def put(ds, **exprs: str):
    """New events containing exactly the given fields."""
    names = list(exprs)
    return select(set_(ds, **exprs), names)


# ---------------------------------------------------------------------------
# shape


def flatten(ds, sep: str = "."):
    """Flatten nested struct columns into dotted top-level columns."""

    def _flatten(batch: pa.Table) -> pa.Table:
        changed = True
        while changed:
            changed = False
            for i, f in enumerate(batch.schema):
                if pa.types.is_struct(f.type):
                    col = batch.column(i)
                    if isinstance(col, pa.ChunkedArray):
                        col = col.combine_chunks()
                    flat = col.flatten()
                    batch = batch.remove_column(i)
                    for sub_f, sub_col in zip(f.type, flat):
                        batch = batch.append_column(
                            f"{f.name}{sep}{sub_f.name}", sub_col
                        )
                    changed = True
                    break
        return batch

    return ds.map_batches(_flatten, batch_format="pyarrow")


def unflatten(ds, sep: str = "."):
    """Rebuild nested structs from dotted column names."""

    def _unflatten(batch: pa.Table) -> pa.Table:
        groups: dict[str, dict[str, Any]] = {}
        plain: list[tuple[str, Any]] = []
        for name in batch.column_names:
            if sep in name:
                top, rest = name.split(sep, 1)
                groups.setdefault(top, {})[rest] = batch.column(name)
            else:
                plain.append((name, batch.column(name)))
        cols, names = [c for _, c in plain], [n for n, _ in plain]
        for top, sub in groups.items():
            arrays = [
                c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                for c in sub.values()
            ]
            struct = pa.StructArray.from_arrays(arrays, names=list(sub.keys()))
            cols.append(struct)
            names.append(top)
        return pa.table(cols, names=names)

    return ds.map_batches(_unflatten, batch_format="pyarrow")


def unroll(ds, column: str):
    """One output row per list element (explode); other columns repeated.
    Rows with null/empty lists are dropped (reference unroll.cpp:227)."""

    def _unroll(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pc.list_value_length(col)
        lengths = pc.fill_null(lengths, 0).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(batch.num_rows), lengths)
        flat = pc.list_flatten(col)
        out = batch.drop_columns([column]).take(pa.array(parent))
        return out.append_column(column, flat)

    return ds.map_batches(_unroll, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-row computed columns


def hash_(ds, column: str, out: str | None = None, salt: str = ""):
    """SHA-256 hex digest of a column (reference hash.cpp: SHA-256)."""
    out = out or f"{column}_hash"
    salt_b = salt.encode()

    def _hash(batch: pa.Table) -> pa.Table:
        vals = batch.column(column).to_pylist()
        digests = [
            None
            if v is None
            else hashlib.sha256(salt_b + str(v).encode()).hexdigest()
            for v in vals
        ]
        return batch.append_column(out, pa.array(digests, pa.string()))

    return ds.map_batches(_hash, batch_format="pyarrow")


def timeshift(ds, column: str, start: Any | None = None, speed: float = 1.0):
    """Rebase timestamps: t' = start + (t - min(t)) / speed.

    Needs the global min → one cheap aggregate pass first."""
    import ray.data

    tmin = ds.aggregate(ray.data.aggregate.Min(column))[f"min({column})"]
    start = start if start is not None else tmin

    def _shift(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        delta = pc.subtract(col.cast(pa.int64()), pa.scalar(pa.scalar(tmin).cast(pa.int64()).as_py()))
        if speed != 1.0:
            delta = pc.cast(pc.divide(pc.cast(delta, pa.float64()), speed), pa.int64())
        shifted = pc.add(pa.scalar(start).cast(pa.int64()), delta).cast(col.type)
        return batch.set_column(
            batch.schema.get_field_index(column), column, shifted
        )

    return ds.map_batches(_shift, batch_format="pyarrow")


def parse_json(ds, column: str, prefix: str | None = None, drop_source: bool = False):
    """Parse a JSON-string column into top-level columns (reference
    `parse` operator + json format). Schema is inferred per batch and
    unified by Arrow; fields become ``<prefix><key>`` columns."""
    prefix = prefix if prefix is not None else f"{column}."

    def _parse(batch: pa.Table) -> pa.Table:
        rows = [
            {} if v is None else json.loads(v) for v in batch.column(column).to_pylist()
        ]
        parsed = pa.Table.from_pylist(rows)
        for f in parsed.schema:
            batch = batch.append_column(f"{prefix}{f.name}", parsed.column(f.name))
        if drop_source:
            batch = batch.drop_columns([column])
        return batch

    return ds.map_batches(_parse, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# order-dependent / windowed

def head(ds, n: int = 10):
    return ds.limit(n)


def tail(ds, n: int, by: str | list[str]):
    """Last n by ordering key (the stream-order analog needs an explicit
    key in a distributed engine; reference tail.cpp buffers n)."""
    keys = [by] if isinstance(by, str) else by
    return ds.sort(keys, descending=[True] * len(keys)).limit(n)


def taste(ds, n: int, by: str | list[str], order_by: str | None = None):
    """First n events per group (reference taste.cpp:25 — per schema;
    generalized to any key)."""
    keys = [by] if isinstance(by, str) else by

    def _head(g: pd.DataFrame) -> pd.DataFrame:
        if order_by:
            g = g.sort_values(order_by, kind="mergesort")
        return g.head(n)

    return ds.groupby(keys).map_groups(_head, batch_format="pandas")


def deduplicate(ds, by: list[str], limit: int = 1, order_by: str | None = None):
    """Keep at most `limit` rows per key tuple (reference
    deduplicate.cpp:102; batch semantics — no timeout/distance windows)."""
    return taste(ds, limit, by, order_by=order_by)


def unique(ds, by: list[str] | None = None):
    """Suppress duplicate rows (reference unique.cpp suppresses adjacent
    duplicates of a sorted stream; distributed batch semantics = global
    dedup on the key columns, keeping one arbitrary-but-deterministic row)."""

    def _key_cols(batch):
        return by or list(batch.columns)

    def _local(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=by, keep="first")

    # local pre-dedup (combiner) then global per-key first
    pre = ds.map_batches(_local, batch_format="pandas")
    return pre.groupby(by).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def sort(ds, keys: str | list[str], descending: bool | list[bool] = False):
    keys = [keys] if isinstance(keys, str) else keys
    if isinstance(descending, bool):
        descending = [descending] * len(keys)
    return ds.sort(keys, descending=descending)


def top(ds, column: str, k: int = 10):
    """Most common values (reference top_rare.cpp:72 — expands to
    summarize count … | sort desc | head)."""
    return (
        ds.groupby(column)
        .count()
        .sort(["count()", column], descending=[True, False])
        .limit(k)
        .map_batches(
            lambda t: t.rename_columns(
                [("count" if c == "count()" else c) for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
    )


def rare(ds, column: str, k: int = 10):
    return (
        ds.groupby(column)
        .count()
        .sort(["count()", column], descending=[False, False])
        .limit(k)
        .map_batches(
            lambda t: t.rename_columns(
                [("count" if c == "count()" else c) for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
    )


def slice_(ds, start: int = 0, stop: int | None = None, order_by: str | list[str] | None = None):
    """Python-style row slice over an explicit global order (reference
    slice.cpp:30 — stream order; a distributed engine needs a sort key).
    Implemented with sort + split_at_indices (ordered, no driver loop).
    Negative indices are resolved against ds.count()."""
    if order_by is not None:
        keys = [order_by] if isinstance(order_by, str) else order_by
        ds = ds.sort(keys)
    if (start is not None and start < 0) or (stop is not None and stop < 0):
        n = ds.count()
        if start is not None and start < 0:
            start = max(0, n + start)
        if stop is not None and stop < 0:
            stop = max(0, n + stop)
    if stop is None:
        return ds.split_at_indices([start])[1]
    lo, mid, hi = ds.split_at_indices([start, stop])[0:3]
    return mid


def reverse(ds, order_by: str | list[str]):
    """Reverse event order (reference reverse.cpp buffers the stream; here
    = descending sort on the explicit order key)."""
    keys = [order_by] if isinstance(order_by, str) else order_by
    return ds.sort(keys, descending=[True] * len(keys))


def repeat_(ds, n: int):
    """Replay the input n times (reference repeat.cpp:102; union of n
    lazy references re-executes the plan per copy)."""
    out = ds
    for _ in range(n - 1):
        out = out.union(ds)
    return out


def enumerate_per_group(ds, by: str | list[str], out: str = "index",
                        order_by: str | None = None):
    """Per-group row number (reference enumerate.cpp numbers per schema;
    generalized to any key; global enumerate needs a total order — use
    slice_/sort + downstream consumption instead)."""
    keys = [by] if isinstance(by, str) else by

    def _enum(g: pd.DataFrame) -> pd.DataFrame:
        if order_by:
            g = g.sort_values(order_by, kind="mergesort")
        g[out] = np.arange(len(g), dtype=np.int64)
        return g

    return ds.groupby(keys).map_groups(_enum, batch_format="pandas")


class _Pseudonymizer:
    """Prefix-preserving IPv4 pseudonymization in the Crypto-PAn
    construction (Xu et al. 2002) with an HMAC-SHA256 bit oracle instead
    of AES (no crypto libs in this environment; same prefix-preserving
    property, keyed by `salt`). Reference: operators/pseudonymize.cpp
    (-m crypto-pan)."""

    def __init__(self, column: str, salt: str):
        import hmac as hmac_mod

        self.column = column
        self.key = salt.encode()
        self._hmac = hmac_mod
        self.cache: dict[str, str] = {}
        self.bit_cache: dict[str, int] = {}  # prefixes shared across IPs

    def _bit(self, prefix_bits: str) -> int:
        b = self.bit_cache.get(prefix_bits)
        if b is None:
            import hashlib

            d = self._hmac.new(self.key, prefix_bits.encode(), hashlib.sha256).digest()
            b = d[0] & 1
            self.bit_cache[prefix_bits] = b
        return b

    def _anon_one(self, ip: str) -> str:
        if ip in self.cache:
            return self.cache[ip]
        try:
            parts = [int(x) for x in ip.split(".")]
            assert len(parts) == 4
        except Exception:
            return ip
        bits = "".join(f"{p:08b}" for p in parts)
        out_bits = "".join(
            str(int(bits[i]) ^ self._bit(bits[:i])) for i in range(32)
        )
        octets = [int(out_bits[i : i + 8], 2) for i in range(0, 32, 8)]
        res = ".".join(map(str, octets))
        self.cache[ip] = res
        return res

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch[self.column] = batch[self.column].map(
            lambda v: self._anon_one(v) if isinstance(v, str) else v
        )
        return batch


def pseudonymize(ds, column: str, salt: str = "seed", concurrency=(1, 4)):
    """Prefix-preserving IP pseudonymization (keyed; per-actor memo cache)."""
    return ds.map_batches(
        _Pseudonymizer, fn_constructor_args=(column, salt),
        batch_format="pandas", concurrency=concurrency,
    )


def round_cols(ds, columns: list[str], ndigits: int = 6):
    """Round float columns (stabilizes parallel-reduction float noise for
    cross-engine comparisons; parallel sums differ in the last ulp)."""

    def _round(batch: pa.Table) -> pa.Table:
        for c in columns:
            i = batch.schema.get_field_index(c)
            batch = batch.set_column(
                i, c, pc.round(batch.column(c), ndigits=ndigits)
            )
        return batch

    return ds.map_batches(_round, batch_format="pyarrow")


def scale_int_cols(ds, columns: list[str], factor: int = 1_000_000):
    """Convert float columns to scaled int64 (micro-units by default).

    Cross-engine float comparison is fragile even after rounding: pc.round
    and DuckDB's round can return doubles differing in the last ulp for
    the same decimal. Integers have one representation — emit
    round(x * factor) as int64 on BOTH sides of an oracle comparison."""

    def _scale(batch: pa.Table) -> pa.Table:
        for c in columns:
            i = batch.schema.get_field_index(c)
            batch = batch.set_column(
                i, c,
                pc.cast(pc.round(pc.multiply(batch.column(c), factor)), pa.int64()),
            )
        return batch

    return ds.map_batches(_scale, batch_format="pyarrow")


def yield_(ds, path: str):
    """Hoist a nested record to the top level (reference yield.cpp:217):
    ``yield_(ds, "a.b")`` makes the fields of struct column a.b the new
    event; a list along the path is unrolled (one event per element)."""

    def _hoist(batch: pa.Table) -> pa.Table:
        col = batch
        parts = path.split(".")
        arr = batch.column(parts[0])
        for p in parts[1:]:
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if pa.types.is_struct(arr.type):
                arr = arr.field(p)
            else:
                raise ValueError(f"cannot descend into {p!r} of {arr.type}")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_list(arr.type):
            arr = pc.list_flatten(arr)
        if not pa.types.is_struct(arr.type):
            return pa.table({parts[-1]: arr})
        flat = arr.flatten()
        return pa.table(
            {f.name: a for f, a in zip(arr.type, flat)}
        )

    return ds.map_batches(_hoist, batch_format="pyarrow")


def parse_time(ds, column: str, fmt: str, out: str | None = None,
               unit: str = "us"):
    """strptime a string column into a timestamp (the reference `time`
    sub-parser inside `parse`, builtins/operators/time.cpp)."""
    out = out or column

    def _parse(batch: pa.Table) -> pa.Table:
        parsed = pc.strptime(batch.column(column), format=fmt, unit=unit)
        if out in batch.column_names:
            return batch.set_column(batch.schema.get_field_index(out), out, parsed)
        return batch.append_column(out, parsed)

    return ds.map_batches(_parse, batch_format="pyarrow")


ship_by_value(sys.modules[__name__])
