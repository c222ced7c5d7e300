"""Heterogeneous (multi-schema) streams — the reference's core dataflow
shape (SURVEY §1.1: one pipeline interleaves table slices of many
schemas, libtenzir/include/tenzir/pipeline.hpp:30; operators resolve
fields per schema at runtime).

Ray Datasets are single-schema, so the engine models a heterogeneous
stream as a **dict of per-schema Datasets** (`SchemaStreams`) with the
two standard exits:

- ``union_by_name()`` → ONE wide Dataset under the registry-unified
  schema (missing columns null, ``_schema`` tag kept) — option (b) of
  the SURVEY §1 mapping, what the CDC engine uses;
- ``write_parquet(dir)`` → one subdirectory per schema — exactly the
  reference's `directory` connector (one output file set per schema,
  connectors/directory.cpp).
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

from tenzir_ray.cdc.registry import SchemaRegistry


_REG_CACHE: dict = {}


def _registry_cache(reg_json: str):
    """Per-process registry parse cache (JSON + hex + IPC schema decode
    would otherwise run per batch). SchemaRegistry is captured at module
    import (a runtime `import tenzir_ray...` inside a shipped-by-value
    function would fail on workers without the repo on sys.path)."""
    r = _REG_CACHE.get(reg_json)
    if r is None:
        r = _REG_CACHE[reg_json] = SchemaRegistry.from_json(reg_json)
    return r


class SchemaStreams:
    """A heterogeneous stream: schema name → ``ray.data.Dataset``."""

    def __init__(self, streams: dict):
        self.streams = dict(streams)

    # -- constructors ----------------------------------------------------
    @classmethod
    def from_selector(cls, ds, column: str = "_schema",
                      materialize: bool = True) -> "SchemaStreams":
        """Split a ``_schema``-tagged Dataset (e.g. from
        ``parse_ndjson(selector=...)``) into per-schema streams.

        The tagged parent is MATERIALIZED first by default: every split
        stream is a filter over the same parent, so an unmaterialized
        parent would re-execute its whole upstream once per schema (and
        again per consumption)."""
        from tenzir_ray.sources.parsers import split_by_schema  # driver-side

        if materialize:
            ds = ds.materialize()
        return cls(split_by_schema(ds, column=column))

    # -- per-schema operations (the reference's per-schema resolution) ---
    def map(self, fn: Callable) -> "SchemaStreams":
        """Apply ``fn(name, dataset) -> dataset`` to every stream."""
        return SchemaStreams({k: fn(k, v) for k, v in self.streams.items()})

    def filter_schemas(self, names) -> "SchemaStreams":
        keep = set(names)
        return SchemaStreams(
            {k: v for k, v in self.streams.items() if k in keep}
        )

    def schemas(self) -> dict:
        """EXACT Arrow schema per stream: the registry-widened union over
        every batch's schema (a first-block peek would silently drop
        columns that appear only in later blocks). The collection pass is
        tiny — one serialized-schema row per batch."""
        out = {}
        for k, v in self.streams.items():
            def _schema_row(batch: pa.Table) -> pa.Table:
                return pa.table(
                    {"schema_hex": [batch.schema.serialize().to_pybytes().hex()]}
                )

            hexes = v.map_batches(
                _schema_row, batch_format="pyarrow"
            ).to_pandas()["schema_hex"].unique()
            reg = SchemaRegistry()
            for h in hexes:
                reg.evolve(pa.ipc.read_schema(pa.BufferReader(bytes.fromhex(h))))
            out[k] = reg.schema if reg.schema is not None else pa.schema([])
        return out

    # -- exits -----------------------------------------------------------
    def union_by_name(self, tag_column: str = "_schema"):
        """One wide Dataset: the union-by-name of every stream's schema
        (registry widening rules — additive columns, type widening),
        missing columns null, each row tagged with its schema name."""
        import ray.data

        if not self.streams:
            raise ValueError("no streams to union")
        reg = SchemaRegistry()
        arrow_schemas = self.schemas()  # exact: every batch's schema seen
        for name, sch in arrow_schemas.items():
            reg.evolve(pa.schema([f for f in sch if f.name != tag_column]))
        reg_json = reg.to_json()

        def _conform(name: str):
            def f(batch: pa.Table) -> pa.Table:
                r = _registry_cache(reg_json)  # parsed once per process
                if tag_column in batch.column_names:
                    batch = batch.drop_columns([tag_column])
                out = r.conform(batch)
                return out.append_column(
                    tag_column,
                    pa.array([name] * out.num_rows, pa.string()),
                )

            return f

        parts = [
            v.map_batches(_conform(k), batch_format="pyarrow")
            for k, v in sorted(self.streams.items())
        ]
        out = parts[0]
        if len(parts) > 1:
            out = out.union(*parts[1:])
        return out

    def write_parquet(self, root: str) -> dict:
        """One subdirectory per schema (the `directory` connector,
        connectors/directory.cpp: file-set per schema)."""
        import os

        written = {}
        for name, ds in self.streams.items():
            path = os.path.join(root, f"schema={name}")
            ds.write_parquet(path)
            written[name] = path
        return written

    def counts(self) -> dict:
        return {k: v.count() for k, v in self.streams.items()}


import sys as _sys
from tenzir_ray._ship import ship_by_value as _ship
_ship(_sys.modules[__name__])
