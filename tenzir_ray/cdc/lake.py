"""Partitioned Parquet lake table with exactly-once CDC merge-apply.

The heart of the engine (BASELINE.json north_star): change batches flow
through ``ray.data.Dataset.map_batches`` over zero-copy Arrow into a
hash-partitioned merge-apply, LSN-ordered last-writer-wins per key
``(conv_id, turn_idx)``, with schema evolution (additive columns + type
widening via :class:`SchemaRegistry`) and an idempotent two-phase commit
manifest so replays after failure converge to the identical final table.

Physical layout (reference analog: one store file per partition +
catalog, libtenzir/src/active_partition.cpp:103-187)::

    root/
      _manifest.json          # two-phase commit + lineage (manifest.py)
      _registry.json          # schema registry state
      part=<k>/epoch-<id>-<uuid>.parquet   # live iff listed in manifest

Dataflow per epoch (one bounded chunk of the binlog)::

    read changes (Dataset, arrival order ≠ lsn order)
      → map_batches(_NormalizeCombine)     # conform to registry schema,
        #   add _part = crc32(conv_id) % P, and PARTIAL LWW reduce within
        #   the batch (combiner) — the first line of skew defense: a hot
        #   key collapses to ≤1 row per input block before any shuffle
      [→ groupby(_part, _salt).map_groups(partial)  # optional salted
        #   sub-partition pre-reduce for extreme skew (north rule)]
      → groupby(_part).map_groups(_PartitionReducer)  # the one shuffle:
        #   merge with the partition's live base rows, final LWW by lsn,
        #   drop deletes, sort (conv_id, turn_idx), write the new
        #   partition file, emit a 1-row lineage record
      → driver collects the tiny lineage records → atomic manifest commit

Scale notes: P (num_partitions) is chosen so one partition's live rows
fit a worker's heap (e.g. 64Ki partitions at 100 TB); an epoch is a
bounded micro-batch of the log sized to the cluster's object store. Only
partitions actually touched by the epoch are read back (merge-on-write,
like the reference's partition rebuild, builtins/commands/rebuild.cpp:26).
"""

from __future__ import annotations

import os
import uuid
import zlib
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from tenzir_ray.cdc.manifest import Manifest, REGISTRY_NAME
from tenzir_ray.cdc.registry import SchemaRegistry

META_COLS = ("lsn", "op")
KEY_COLS = ("conv_id", "turn_idx")
LSN_COL = "_lsn"  # lsn column name as stored in lake files


def stable_part(conv: np.ndarray, num_partitions: int) -> np.ndarray:
    """Deterministic hash partition of conv_id strings: crc32(uniq) % P,
    mapped back through the inverse index (vectorized; crc32 only per
    unique value, and conversations repeat across turns)."""
    uniq, inv = np.unique(np.asarray(conv, dtype=object), return_inverse=True)
    h = np.fromiter(
        (zlib.crc32(str(u).encode()) for u in uniq), dtype=np.int64, count=len(uniq)
    )
    return (h % num_partitions)[inv].astype(np.int32)


def _lww_mask(lsn: np.ndarray, conv: np.ndarray, turn: np.ndarray) -> np.ndarray:
    """Boolean mask selecting, per (conv, turn) key, the single row with the
    greatest lsn (ties → first occurrence; lsns are unique in a log).

    Vectorized on integer codes (strings are factorized once) — object
    comparisons never touch the hot path."""
    n = len(lsn)
    if n == 0:
        return np.zeros(0, dtype=bool)
    codes = conv if np.issubdtype(conv.dtype, np.integer) else np.unique(conv, return_inverse=True)[1]
    turn = np.asarray(turn, dtype=np.int64)
    # lexsort: primary conv code, then turn, then lsn desc
    order = np.lexsort((-lsn, turn, codes))
    sc, st = codes[order], turn[order]
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = (sc[1:] != sc[:-1]) | (st[1:] != st[:-1])
    mask = np.zeros(n, dtype=bool)
    mask[order[first]] = True
    return mask


class _NormalizeCombine:
    """map_batches stage: conform payload to the registry schema, attach
    ``_part`` (and optional ``_salt``), partial-LWW-reduce the batch."""

    def __init__(self, registry_json: str, num_partitions: int, num_salts: int = 0):
        self.registry = SchemaRegistry.from_json(registry_json)
        self.num_partitions = num_partitions
        self.num_salts = num_salts

    def __call__(self, batch: pa.Table) -> pa.Table:
        lsn = batch.column("lsn").to_numpy(zero_copy_only=False)
        conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
        turn = batch.column("turn_idx").to_numpy(zero_copy_only=False)
        mask = _lww_mask(lsn, conv, turn)
        idx = np.flatnonzero(mask)
        payload = self.registry.conform(batch.select(
            [c for c in batch.column_names if c not in META_COLS]
        ))
        out = payload.take(idx)
        out = out.append_column("lsn", pa.array(lsn[idx], pa.int64()))
        out = out.append_column("op", batch.column("op").take(idx).cast(pa.string()))
        out = out.append_column(
            "_part", pa.array(stable_part(conv[idx], self.num_partitions))
        )
        if self.num_salts > 1:
            out = out.append_column(
                "_salt", pa.array((lsn[idx] % self.num_salts).astype(np.int32))
            )
        return out


def _partial_reduce_group(df: pd.DataFrame) -> pd.DataFrame:
    """Salted pre-reduce: per (conv, turn) within a (_part, _salt) group,
    keep only the max-lsn row. Vectorized pandas; op kept for the final."""
    mask = _lww_mask(
        df["lsn"].to_numpy(), df["conv_id"].to_numpy(), df["turn_idx"].to_numpy()
    )
    return df.loc[mask].drop(columns=["_salt"])


class _PartitionReducer:
    """groupby(_part).map_groups final stage: merge changes with the
    partition's live base rows, final LWW, drop deletes, write the new
    partition file, return a 1-row lineage record."""

    __name__ = "partition_reduce"  # map_groups requires a named callable

    def __init__(self, root: str, registry_json: str, epoch_id: str,
                 base_files: dict[int, list[str]], payload_cols: list[str]):
        self.root = root
        self.registry = SchemaRegistry.from_json(registry_json)
        self.epoch_id = epoch_id
        self.base_files = base_files  # part -> list of live file relpaths
        self.payload_cols = payload_cols

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        part = int(df["_part"].iloc[0])
        raw = pa.Table.from_pandas(df.drop(columns=["_part"]), preserve_index=False)
        # re-conform: pandas round-trips can degrade types (all-null → null type)
        changes = self.registry.conform(
            raw.select([c for c in raw.column_names if c not in META_COLS])
        )
        changes = changes.append_column("lsn", raw.column("lsn").cast(pa.int64()))
        changes = changes.append_column("op", raw.column("op").cast(pa.string()))
        tables = [changes]
        for rel in self.base_files.get(part, ()):
            stored = pq.read_table(os.path.join(self.root, rel))
            lsn_col = stored.column(LSN_COL).cast(pa.int64())
            base = self.registry.conform(
                stored.select([c for c in stored.column_names if c != LSN_COL])
            )
            base = base.append_column("lsn", lsn_col)
            base = base.append_column(
                "op", pa.array(np.repeat("insert", base.num_rows), pa.string())
            )
            tables.append(base.select(changes.column_names))
        merged = pa.concat_tables(tables, promote_options="permissive")

        lsn = merged.column("lsn").to_numpy(zero_copy_only=False)
        conv = merged.column("conv_id").to_numpy(zero_copy_only=False)
        turn = merged.column("turn_idx").to_numpy(zero_copy_only=False)
        mask = _lww_mask(lsn, conv, turn)
        alive = mask & (merged.column("op").to_numpy(zero_copy_only=False) != "delete")
        final = merged.filter(pa.array(alive))
        # stable output order (the verification ordering key)
        final = final.take(
            pc.sort_indices(
                final, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
            )
        )
        out = final.select(self.payload_cols).append_column(
            LSN_COL, final.column("lsn")
        )

        rel = f"part={part}/epoch-{self.epoch_id}-{uuid.uuid4().hex[:8]}.parquet"
        path = os.path.join(self.root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(out, tmp, compression="zstd")
        os.replace(tmp, path)  # write-then-rename (posix_filesystem.cpp:29)

        checksum = int(
            pd.util.hash_pandas_object(
                final.select(self.payload_cols).to_pandas(), index=False
            ).sum()
            & 0xFFFFFFFFFFFFFFFF
        )
        change_lsn = changes.column("lsn").to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                "part": [part],
                "rows": [out.num_rows],
                # applied-LSN watermark incl. base (resume checkpoint)
                "lsn_high": [int(lsn.max()) if len(lsn) else -1],
                # this epoch's change-lsn range (lineage)
                "lsn_lo": [int(change_lsn.min()) if len(change_lsn) else -1],
                "lsn_hi": [int(change_lsn.max()) if len(change_lsn) else -1],
                "checksum": [checksum],
                "file": [rel],
            }
        )


class LakeTable:
    """A partitioned Parquet lake table with exactly-once CDC apply."""

    def __init__(self, root: str, num_partitions: int = 16):
        self.root = root
        os.makedirs(root, exist_ok=True)
        m = Manifest.load(root)
        if m is None:
            m = Manifest(root=root, num_partitions=num_partitions)
        self.manifest = m
        self.num_partitions = m.num_partitions
        reg_path = os.path.join(root, REGISTRY_NAME)
        if os.path.exists(reg_path):
            with open(reg_path) as f:
                self.registry = SchemaRegistry.from_json(f.read())
        else:
            self.registry = SchemaRegistry()

    # ------------------------------------------------------------------
    def apply_changes(
        self,
        changes: "ray.data.Dataset | pa.Table",
        epoch_id: str,
        num_salts: int = 0,
        batch_size: int = 65536,
    ) -> dict[str, Any]:
        """Apply one epoch (a bounded chunk of the binlog) exactly once.

        Returns the epoch lineage record. Re-applying a committed
        ``epoch_id`` is a no-op (idempotence/resume gate).
        """
        import ray.data

        if epoch_id in self.manifest.committed_epoch_ids():
            return {"epoch_id": epoch_id, "skipped": True}

        if isinstance(changes, pa.Table):
            changes = ray.data.from_arrow(changes)

        # -- schema evolution: merge the incoming payload schema ---------
        incoming = changes.schema()
        payload_fields = [
            pa.field(n, t)
            for n, t in zip(incoming.names, incoming.types)
            if n not in META_COLS
        ]
        self.registry.evolve(pa.schema(payload_fields))
        self._persist_registry()
        reg_json = self.registry.to_json()
        payload_cols = list(self.registry.schema.names)

        # -- normalize + per-batch partial LWW reduce (combiner) ---------
        norm = changes.map_batches(
            _NormalizeCombine(reg_json, self.num_partitions, num_salts),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        if num_salts > 1:
            norm = norm.groupby(["_part", "_salt"]).map_groups(
                _partial_reduce_group, batch_format="pandas"
            )

        # Every partition's live files go into the (small) reducer plan;
        # a reducer group only exists for partitions the epoch touches, so
        # untouched partitions are never read or rewritten, and the epoch
        # lsn range comes back in the lineage rows — one single pass over
        # the change stream, no extra materialize/aggregate.
        base_files = {
            int(k): info["files"] for k, info in self.manifest.partitions.items()
        }

        # -- the shuffle: per-partition merge-apply + file write ---------
        reducer = _PartitionReducer(
            self.root, reg_json, epoch_id, base_files, payload_cols
        )
        lineage = (
            norm.groupby("_part")
            .map_groups(reducer, batch_format="pandas")
            .to_pandas()
        )

        # -- two-phase commit -------------------------------------------
        part_results = {
            str(int(r.part)): {
                "files": [r.file],
                "rows": int(r.rows),
                "lsn_high": int(r.lsn_high),
                "checksum": int(r.checksum),
            }
            for r in lineage.itertuples()
        }
        lsn_min = int(lineage["lsn_lo"].min())
        lsn_max = int(lineage["lsn_hi"].max())
        self.manifest.commit_epoch(epoch_id, lsn_min, lsn_max, part_results)
        return {
            "epoch_id": epoch_id,
            "lsn_min": lsn_min,
            "lsn_max": lsn_max,
            "partitions_touched": len(part_results),
            "rows_live": int(lineage["rows"].sum()),
        }

    # ------------------------------------------------------------------
    def read(self, columns: list[str] | None = None) -> "ray.data.Dataset":
        """Streaming Dataset over the live table (payload columns only)."""
        import ray.data

        files = self.manifest.live_files()
        if not files:
            return ray.data.from_arrow(
                pa.table({c: [] for c in (columns or ["conv_id"])})
            )
        ds = ray.data.read_parquet(files, columns=columns)
        if columns is None:
            ds = ds.drop_columns([LSN_COL])
        return ds

    def final_table(self) -> pa.Table:
        """Driver-side full read, sorted by (conv_id, turn_idx) — for
        verification at test scale only (materializes)."""
        files = self.manifest.live_files()
        if not files:
            return pa.table({})
        tbl = pa.concat_tables(
            [pq.read_table(f) for f in files], promote_options="permissive"
        )
        tbl = tbl.drop_columns([LSN_COL])
        return tbl.take(
            pc.sort_indices(
                tbl, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
            )
        )

    def resume_lsn(self) -> int:
        """Next lsn to tail from (checkpoint/resume-from-offset)."""
        return self.manifest.lsn_high() + 1

    def _persist_registry(self) -> None:
        p = os.path.join(self.root, REGISTRY_NAME)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            f.write(self.registry.to_json())
        os.replace(tmp, p)


import sys as _sys
from tenzir_ray._ship import ship_by_value as _ship
_ship(_sys.modules[__name__])
