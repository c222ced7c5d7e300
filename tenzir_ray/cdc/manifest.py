"""Two-phase-commit manifest + lineage/checkpoint store for the Parquet lake.

The reference's durability discipline — write store files, then atomically
rename, then merge the partition synopsis into the catalog
(libtenzir/src/posix_filesystem.cpp:29-36,85-98;
libtenzir/src/active_partition.cpp:103-187;
libtenzir/include/tenzir/catalog.hpp:83-88) — generalized to an atomic
manifest swap:

1. tasks write ``part=<k>/epoch-<id>-<uuid>.parquet`` data files;
2. the driver appends one epoch record (applied lsn range, per-partition
   files, row counts, checksums — the lineage record) and atomically
   replaces ``_manifest.json`` (write tmp + ``os.replace``).

Readers only see files listed in the manifest's ``partitions`` map, so a
crash between (1) and (2) leaves orphaned files, never corruption — and a
replay of the same epoch id is a no-op (exactly-once under Ray's
at-least-once task retries). ``lsn_high`` per partition is the
resume-from-offset checkpoint.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

MANIFEST_NAME = "_manifest.json"
REGISTRY_NAME = "_registry.json"


@dataclass
class Manifest:
    root: str
    num_partitions: int
    # current live state: partition id (str) -> {"files": [...], "rows": n, "lsn_high": l}
    partitions: dict[str, dict[str, Any]] = field(default_factory=dict)
    # lineage: one record per committed epoch
    epochs: list[dict[str, Any]] = field(default_factory=list)

    @property
    def path(self) -> str:
        return os.path.join(self.root, MANIFEST_NAME)

    @classmethod
    def load(cls, root: str) -> "Manifest | None":
        p = os.path.join(root, MANIFEST_NAME)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            d = json.load(f)
        return cls(
            root=root,
            num_partitions=d["num_partitions"],
            partitions=d["partitions"],
            epochs=d["epochs"],
        )

    def committed_epoch_ids(self) -> set[str]:
        return {e["epoch_id"] for e in self.epochs}

    def next_seq(self) -> int:
        """Next absolute apply-sequence number: monotone across
        truncate_lineage() (unlike a lineage index, which shrinks)."""
        return max(
            (e.get("seq", i) for i, e in enumerate(self.epochs)), default=-1
        ) + 1

    def epoch_seq(self, epoch_id: str) -> int:
        """Absolute apply-sequence number of a committed epoch (falls back
        to the lineage index for pre-seq records)."""
        for i, e in enumerate(self.epochs):
            if e["epoch_id"] == epoch_id:
                return e.get("seq", i)
        raise KeyError(f"epoch {epoch_id!r} not in lineage")

    def resolve_epoch(self, as_of: "str | int") -> int:
        """Index into ``epochs`` for an epoch id (str) or positional index
        (int, negatives count from the end) — the time-travel version
        resolver (Delta-Lake ``versionAsOf`` analog)."""
        if isinstance(as_of, bool):
            raise TypeError("as_of must be an epoch id or index")
        if isinstance(as_of, int):
            n = len(self.epochs)
            idx = as_of + n if as_of < 0 else as_of
            if not 0 <= idx < n:
                raise IndexError(
                    f"epoch index {as_of} out of range ({n} epochs retained; "
                    "truncate_lineage() drops old snapshots)")
            return idx
        for i, e in enumerate(self.epochs):
            if e["epoch_id"] == as_of:
                return i
        raise KeyError(
            f"epoch {as_of!r} not in lineage ({len(self.epochs)} epochs "
            "retained; truncate_lineage() drops old snapshots)")

    def state_as_of(self, as_of: "str | int") -> dict[str, dict[str, Any]]:
        """Reconstruct the per-partition live state as of a committed epoch
        (inclusive): each epoch record stores the FULL replacement file set
        of every partition it touched, so the snapshot is the last record
        per partition in the prefix. Returns ``{part: {"files": [...],
        "tombstones": int|None, ...}}``; ``tombstones`` is None for
        pre-round-4 lineage records (readers must then assume tombstones
        may exist). Snapshots reference historical data files — they stay
        readable until ``optimize()``/``gc()`` collect superseded files
        (VACUUM semantics)."""
        idx = self.resolve_epoch(as_of)
        parts: dict[str, dict[str, Any]] = {}
        for e in self.epochs[: idx + 1]:
            recs = e.get("partitions", {})
            for k, files in e.get("files", {}).items():
                rec = dict(recs.get(k, {}))
                rec["files"] = files
                if "tombstones" not in rec:
                    rec["tombstones"] = None
                parts[k] = rec
        return parts

    def lsn_high(self) -> int:
        """Global applied-LSN high watermark (resume-from-offset checkpoint)."""
        return max((e["lsn_max"] for e in self.epochs), default=-1)

    def live_files(self, parts: list[str] | None = None) -> list[str]:
        out: list[str] = []
        for k, info in sorted(self.partitions.items(), key=lambda kv: int(kv[0])):
            if parts is None or k in parts:
                out.extend(os.path.join(self.root, f) for f in info["files"])
        return out

    def commit_epoch(
        self,
        epoch_id: str,
        lsn_min: int,
        lsn_max: int,
        part_results: dict[str, dict[str, Any]],
        meta: dict[str, Any] | None = None,
    ) -> None:
        """Atomically publish an epoch: replace the touched partitions'
        live file sets and append the lineage record. ``meta`` rides in
        the lineage record — source-offset checkpoints (broker topic/
        partition/offset ranges) commit in the SAME atomic write as the
        data, which is what makes partitioned-log consumption
        exactly-once (the Kafka-Connect store-offsets-in-the-sink
        pattern)."""
        for k, res in part_results.items():
            # store the full result record — callers own the field set
            # (files/rows/delta_rows/tombstones/lsn_high/checksum)
            self.partitions[k] = dict(res)
        self.epochs.append(
            {
                "epoch_id": epoch_id,
                "seq": self.next_seq(),
                "lsn_min": lsn_min,
                "lsn_max": lsn_max,
                **({"meta": meta} if meta else {}),
                "committed_at": time.time(),
                "partitions": {
                    k: {
                        "rows": r["rows"],
                        "lsn_high": r["lsn_high"],
                        "checksum": r["checksum"],
                        # round-4 fields: cumulative tombstone/delta counts
                        # (time-travel fast-path gate) and this epoch's own
                        # output files (change-data-feed source)
                        **{
                            f: r[f]
                            for f in ("tombstones", "delta_rows", "mode",
                                      "new_file", "cdf_file", "file_stats")
                            if f in r
                        },
                    }
                    for k, r in part_results.items()
                },
                "files": {k: r["files"] for k, r in part_results.items()},
            }
        )
        self._atomic_write()

    def _atomic_write(self) -> None:
        tmp = self.path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "num_partitions": self.num_partitions,
                    "partitions": self.partitions,
                    "epochs": self.epochs,
                },
                f,
                indent=1,
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)


import sys as _sys
from tenzir_ray._ship import ship_by_value as _ship
_ship(_sys.modules[__name__])
