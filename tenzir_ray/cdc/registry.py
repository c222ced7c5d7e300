"""Schema-evolution registry: additive columns + type widening only.

The Ray-side analog of the reference's adaptive ``series_builder``
(libtenzir/include/tenzir/series_builder.hpp:41-84 — upgrades types as new
fields/values arrive) and explicit ``cast``
(libtenzir/include/tenzir/cast.hpp:28-260), restricted to the rules the
CDC north-star mandates: new nullable columns may appear (older rows read
as null) and numeric/temporal types may widen; nothing may narrow or be
dropped.

The registry is a plain value object (picklable) so tasks/actors can carry
it; persistence is a JSON document next to the lake manifest.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import pyarrow as pa

# widening lattice: type -> rank; widen to the higher-ranked type within a family
_INT_ORDER = [pa.int8(), pa.int16(), pa.int32(), pa.int64()]
_UINT_ORDER = [pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64()]
_FLOAT_ORDER = [pa.float16(), pa.float32(), pa.float64()]


def _family_rank(t: pa.DataType) -> tuple[str, int] | None:
    for fam, order in (("int", _INT_ORDER), ("uint", _UINT_ORDER), ("float", _FLOAT_ORDER)):
        for i, o in enumerate(order):
            if t.equals(o):
                return fam, i
    return None


def widen(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """The widened common type of a and b, or raise if incompatible."""
    if a.equals(b):
        return a
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    fa, fb = _family_rank(a), _family_rank(b)
    if fa and fb:
        if fa[0] == fb[0]:
            order = {"int": _INT_ORDER, "uint": _UINT_ORDER, "float": _FLOAT_ORDER}[fa[0]]
            return order[max(fa[1], fb[1])]
        # mixed signed/unsigned/float → float64 (lossless enough for our domain)
        if "float" in (fa[0], fb[0]):
            return pa.float64()
        return pa.int64() if {fa[0], fb[0]} == {"int", "uint"} else pa.float64()
    if pa.types.is_timestamp(a) and pa.types.is_timestamp(b):
        # finer unit wins (ns > us > ms > s); tz must agree — silently
        # reconciling tz-aware with tz-naive (or dropping the tz when
        # widening across units) would shift semantics, violating the
        # "nothing may narrow" contract
        if a.tz != b.tz:
            raise TypeError(
                f"schema evolution cannot reconcile timestamp tz {a.tz!r} "
                f"with {b.tz!r}"
            )
        units = ["s", "ms", "us", "ns"]
        unit = units[max(units.index(a.unit), units.index(b.unit))]
        return pa.timestamp(unit, tz=a.tz)
    if pa.types.is_string(a) and pa.types.is_large_string(b):
        return b
    if pa.types.is_large_string(a) and pa.types.is_string(b):
        return a
    if pa.types.is_list(a) and pa.types.is_list(b):
        return pa.list_(widen(a.value_type, b.value_type))
    if pa.types.is_struct(a) and pa.types.is_struct(b):
        merged = _merge_fields(list(a), list(b))
        return pa.struct(merged)
    raise TypeError(f"schema evolution cannot reconcile {a} and {b}")


def _merge_fields(a: list[pa.Field], b: list[pa.Field]) -> list[pa.Field]:
    out = list(a)
    index = {f.name: i for i, f in enumerate(out)}
    for f in b:
        if f.name in index:
            i = index[f.name]
            out[i] = pa.field(f.name, widen(out[i].type, f.type))
        else:
            out.append(pa.field(f.name, f.type))
    return out


@dataclass
class SchemaRegistry:
    """Current unified schema + evolve/conform operations."""

    schema: pa.Schema | None = None
    version: int = 0
    history: list[str] = field(default_factory=list)

    def evolve(self, incoming: pa.Schema) -> bool:
        """Merge an incoming batch schema; returns True if the registry changed."""
        if self.schema is None:
            self.schema = incoming
            self.version = 1
            self.history.append(f"v1: init {incoming.names}")
            return True
        merged = pa.schema(_merge_fields(list(self.schema), list(incoming)))
        if merged.equals(self.schema):
            return False
        self.history.append(
            f"v{self.version + 1}: {self.schema.names} -> {merged.names}"
        )
        self.schema = merged
        self.version += 1
        return True

    def conform(self, tbl: pa.Table) -> pa.Table:
        """Cast a batch to the registry schema (missing columns → null)."""
        assert self.schema is not None, "registry is empty"
        cols = []
        n = tbl.num_rows
        for f in self.schema:
            if f.name in tbl.column_names:
                col = tbl.column(f.name)
                if not col.type.equals(f.type):
                    col = col.cast(f.type)
                cols.append(col)
            else:
                cols.append(pa.nulls(n, f.type))
        return pa.table(cols, schema=self.schema)

    # --- persistence ---------------------------------------------------
    def to_json(self) -> str:
        assert self.schema is not None
        return json.dumps(
            {
                "version": self.version,
                "history": self.history,
                "schema": self.schema.serialize().to_pybytes().hex(),
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "SchemaRegistry":
        d = json.loads(s)
        schema = pa.ipc.read_schema(pa.BufferReader(bytes.fromhex(d["schema"])))
        return cls(schema=schema, version=d["version"], history=d["history"])


import sys as _sys
from tenzir_ray._ship import ship_by_value as _ship
_ship(_sys.modules[__name__])
