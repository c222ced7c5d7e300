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


class SchemaStreams:
    """A heterogeneous stream: schema name → ``ray.data.Dataset``."""

    def __init__(self, streams: dict):
        self.streams = dict(streams)

    # -- constructors ----------------------------------------------------
    @classmethod
    def from_selector(cls, ds, column: str = "_schema") -> "SchemaStreams":
        """Split a ``_schema``-tagged Dataset (e.g. from
        ``parse_ndjson(selector=...)``) into per-schema streams."""
        from tenzir_ray.sources.parsers import split_by_schema

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
        """Arrow schema per stream (triggers a first-block fetch each)."""
        out = {}
        for k, v in self.streams.items():
            s = v.schema()
            out[k] = pa.schema(
                [pa.field(n, t) for n, t in zip(s.names, s.types)]
            )
        return out

    # -- exits -----------------------------------------------------------
    def union_by_name(self, tag_column: str = "_schema"):
        """One wide Dataset: the union-by-name of every stream's schema
        (registry widening rules — additive columns, type widening),
        missing columns null, each row tagged with its schema name."""
        import ray.data

        from tenzir_ray.cdc.registry import SchemaRegistry

        reg = SchemaRegistry()
        arrow_schemas = self.schemas()
        for name, sch in arrow_schemas.items():
            reg.evolve(pa.schema([f for f in sch if f.name != tag_column]))
        reg_json = reg.to_json()

        def _conform(name: str):
            def f(batch: pa.Table) -> pa.Table:
                r = SchemaRegistry.from_json(reg_json)
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
        if not parts:
            raise ValueError("no streams to union")
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
