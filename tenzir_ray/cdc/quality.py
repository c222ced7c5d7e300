"""Ingest constraints + dead-letter quarantine for change streams.

The Delta-Lake ``CHECK`` constraint / dead-letter-queue pattern for a
CDC pipeline: every change row must satisfy a set of named expression
rules BEFORE it reaches the lake; violating rows are diverted to a
quarantine table (partitioned Parquet) carrying which rules failed and
which epoch they arrived in, instead of silently poisoning the lake or
killing the stream.

Semantics are FAIL-CLOSED: a row passes a rule only when the expression
evaluates to TRUE — an unknown/NULL result quarantines (stricter than
ANSI CHECK, which lets NULL through; an ingest guard that waves through
rows it cannot judge is not a guard). Delete ops are exempt from rules
that reference payload columns they legitimately null out — pass
``ops=("insert", "update")`` (the default) to scope enforcement.

Exactly-once: quarantine files are content-addressed (sha1 of the
violating rows' IPC bytes), so replaying an epoch after a crash
re-creates byte-identical names instead of duplicating rows — the same
idempotence contract as the lake's uuid-immutable data files, achieved
by naming-from-content because quarantine writes happen mid-stream,
before the epoch's two-phase commit point.

Scale: one streaming ``map_batches`` over zero-copy Arrow; rule masks
are vectorized (the expression compiler's pushdown/residual kernels);
the quarantine write is per-batch, per-violation-subset only — a clean
stream writes nothing.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

# top-level (not lazy-in-worker) import: expr is ship-by-value
# registered, so cloudpickle embeds the compiler inside the task spec —
# a worker-side `import tenzir_ray` would need the repo on sys.path
from tenzir_ray.expr import compile_filter

META_PASS_OPS = ("insert", "update")


class ConstraintGate:
    """Callable actor stage: compile the rule expressions once per
    actor (``__init__``), evaluate every rule's mask per batch, divert
    violating rows to the dead-letter dir, return passing rows."""

    def __init__(self, rules: dict[str, str], dlq_root: str,
                 epoch_id: str, ops: tuple = META_PASS_OPS):
        self.rules = {name: compile_filter(expr)
                      for name, expr in rules.items()}
        self.dlq_dir = os.path.join(dlq_root, epoch_id)
        self.epoch_id = epoch_id
        self.ops = set(ops)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if not n:
            return batch
        # rows whose op is out of scope (e.g. deletes with null payloads)
        # pass unconditionally
        if "op" in batch.column_names:
            scoped = np.isin(np.asarray(batch.column("op")), list(self.ops))
        else:
            scoped = np.ones(n, dtype=bool)
        ok = np.ones(n, dtype=bool)
        violated = [[] for _ in range(n)]
        for name, filt in self.rules.items():
            mask = filt.mask(batch)  # null → False: fail-closed
            bad = scoped & ~np.asarray(mask, dtype=bool)
            if bad.any():
                ok &= ~bad
                for i in np.flatnonzero(bad):
                    violated[i].append(name)
        if ok.all():
            return batch
        bad_idx = np.flatnonzero(~ok)
        bad_rows = batch.take(pa.array(bad_idx))
        bad_rows = bad_rows.append_column(
            "_violated",
            pa.array([",".join(violated[i]) for i in bad_idx], pa.string()),
        ).append_column(
            "_epoch_id", pa.array([self.epoch_id] * len(bad_idx), pa.string()))
        self._write_dlq(bad_rows)
        return batch.take(pa.array(np.flatnonzero(ok)))

    def _write_dlq(self, tbl: pa.Table) -> None:
        import pyarrow.ipc as ipc
        import pyarrow.parquet as pq

        sink = pa.BufferOutputStream()
        with ipc.new_stream(sink, tbl.schema) as w:
            w.write_table(tbl)
        digest = hashlib.sha1(sink.getvalue().to_pybytes()).hexdigest()[:20]
        os.makedirs(self.dlq_dir, exist_ok=True)
        dest = os.path.join(self.dlq_dir, f"{digest}.parquet")
        if os.path.exists(dest):  # exact replay of this batch — idempotent
            return
        tmp = dest + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, dest)


def quarantine_changes(changes, rules: dict[str, str], dlq_root: str,
                       epoch_id: str, ops: tuple = META_PASS_OPS,
                       batch_size: int = 65536,
                       concurrency=(1, 4)):
    """Guard a change stream: returns the Dataset of PASSING rows;
    violating rows land under ``dlq_root/<epoch_id>/`` as parquet with
    ``_violated`` (comma-joined rule names) + ``_epoch_id`` columns.
    Compose directly in front of ``LakeTable.apply_changes`` — the
    quarantine divert and the lake apply stream in one pipeline."""
    return changes.map_batches(
        ConstraintGate,
        fn_constructor_args=(rules, dlq_root, epoch_id, ops),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def read_quarantine(dlq_root: str, epoch_id: str | None = None):
    """The dead-letter table as a streaming Dataset (empty-safe)."""
    import ray.data

    root = os.path.join(dlq_root, epoch_id) if epoch_id else dlq_root
    files = []
    for dirpath, _dirs, names in os.walk(root):
        files.extend(os.path.join(dirpath, f) for f in sorted(names)
                     if f.endswith(".parquet"))
    if not files:
        return ray.data.from_items([]).limit(0)
    return ray.data.read_parquet(files)


import sys as _sys

from tenzir_ray._ship import ship_by_value as _ship

_ship(_sys.modules[__name__])
