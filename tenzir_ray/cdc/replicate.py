"""Multi-table CDC replication router: one heterogeneous change stream →
N lake tables, exactly-once per table.

The reference routes one input stream to per-schema partitions
(libtenzir/src/exec_pipeline.cpp pipeline fan-out + the `import` path's
per-schema store files, active_partition.cpp:103); a binlog/WAL tail is
the same shape — every record carries its target table. Here the router
splits one epoch's micro-batch by a routing column and applies each
slice through its :class:`~tenzir_ray.cdc.lake.LakeTable` under the SAME
epoch id. Exactly-once composes per table: each lake's two-phase-commit
manifest makes the epoch idempotent, so a crash between tables resumes
by re-running the whole router — already-committed tables skip, the rest
apply, and the multi-table state converges (the Kafka-Connect
per-sink-offsets pattern, one sink per table).

Scale notes: the source is materialized ONCE (an epoch is a bounded
micro-batch by definition — object-store resident, spillable), so the N
per-table filters re-read plasma blocks instead of re-executing the
upstream pipeline N times. Each filter is a vectorized Arrow mask; the
heavy lifting (exchange + reduce) stays inside each lake's apply.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc


def replicate_stream(
    changes,
    lakes: "dict[str, Any]",
    epoch_id: str,
    table_col: str = "_table",
    strict: bool = True,
    **apply_kwargs,
) -> dict[str, dict]:
    """Apply one epoch of a multi-table change stream to every target lake.

    ``changes``: Dataset (or Arrow table) of change rows carrying
    ``table_col`` naming each row's target table. ``lakes`` maps table
    name → :class:`LakeTable`. Returns ``{table: epoch_record}``.

    ``strict=True`` raises if any row routes to an undeclared table
    (silently dropping binlog rows is how replicas diverge); pass False
    to ignore them (e.g. tailing a server with tables you don't mirror).
    """
    import ray.data

    if isinstance(changes, pa.Table):
        changes = ray.data.from_arrow(changes)
    if not lakes:
        raise ValueError("no target lakes")
    # one materialization; N filters re-read blocks, not the pipeline
    src = changes.materialize()

    if strict:
        known = set(lakes)

        def _check(t: pa.Table) -> pa.Table:
            vals = pc.unique(t.column(table_col)).to_pylist()
            unknown = [v for v in vals if v not in known]
            if unknown:
                raise ValueError(
                    f"rows route to undeclared table(s) {sorted(unknown)!r}; "
                    "declare them in `lakes` or pass strict=False")
            return t.slice(0, 0)

        src.map_batches(_check, batch_format="pyarrow").count()

    def _slice(name: str):
        def f(t: pa.Table) -> pa.Table:
            out = t.filter(pc.equal(t.column(table_col), name))
            return out.drop_columns([table_col])

        return f

    results: dict[str, dict] = {}
    for name in sorted(lakes):
        results[name] = lakes[name].apply_changes(
            src.map_batches(_slice(name), batch_format="pyarrow"),
            epoch_id=epoch_id,
            **apply_kwargs,
        )
    return results


import sys as _sys

from tenzir_ray._ship import ship_by_value as _ship

_ship(_sys.modules[__name__])
