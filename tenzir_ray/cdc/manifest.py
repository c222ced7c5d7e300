"""Two-phase-commit manifest + lineage/checkpoint store for the Parquet lake.

The reference's durability discipline — write store files, then atomically
rename, then merge the partition synopsis into the catalog
(libtenzir/src/posix_filesystem.cpp:29-36,85-98;
libtenzir/src/active_partition.cpp:103-187;
libtenzir/include/tenzir/catalog.hpp:83-88) — generalized to an atomic
manifest swap:

1. tasks write ``part=<k>/epoch-<id>-<uuid>.parquet`` data files;
2. the driver appends one epoch record (applied lsn range, per-partition
   files, row counts, checksums — the lineage record) and publishes it.

Readers only see files listed in the manifest's ``partitions`` map, so a
crash between (1) and (2) leaves orphaned files, never corruption — and a
replay of the same epoch id is a no-op (exactly-once under Ray's
at-least-once task retries). ``lsn_high`` per partition is the
resume-from-offset checkpoint.

Multi-writer optimistic concurrency (round 4, Delta-Lake commit-protocol
analog): commits are serialized through a versioned log directory
``_log/v<version>.json``. A writer claims version ``V+1`` by
``os.link``-ing a fully-written temp file to the log name — atomic
create-with-content on POSIX, so a half-written record can never be
observed and exactly ONE writer wins each version (``FileExistsError``
is the CAS failure). ``_manifest.json`` becomes a snapshot CACHE: it
carries the folded state up to some version, and :meth:`load` replays
any newer log records on top, so a crash between log-append and
snapshot-write loses nothing. Conflict semantics live in the caller
(``LakeTable.apply_changes``): append/delta epochs compose under LWW and
rebase automatically; concurrent full-rewrites of the same partition
raise :class:`ConcurrentModificationError`. Schema-registry deltas ride
the log record and fold via the evolve lattice join (commutative), so
two writers adding different columns converge.
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
LOG_DIR = "_log"


class ConcurrentModificationError(RuntimeError):
    """Another writer committed a conflicting change between this writer's
    read of the table state and its commit attempt (Delta-Lake
    ``ConcurrentModificationException`` analog). The losing epoch was NOT
    committed; re-running it is safe (idempotent by epoch id) and will
    recompute against the new base."""


@dataclass
class Manifest:
    root: str
    num_partitions: int
    # current live state: partition id (str) -> {"files": [...], "rows": n, "lsn_high": l}
    partitions: dict[str, dict[str, Any]] = field(default_factory=dict)
    # lineage: one record per committed epoch
    epochs: list[dict[str, Any]] = field(default_factory=list)
    # commit-log version: count of committed log records folded into this
    # state (0 = fresh table). The CAS claim for the next commit is
    # version+1.
    version: int = 0
    # schema-registry JSON folded from commit records (lattice join of
    # every writer's evolve) — None on legacy roots whose registry only
    # lives in _registry.json
    registry_json: str | None = None

    @property
    def path(self) -> str:
        return os.path.join(self.root, MANIFEST_NAME)

    @property
    def log_dir(self) -> str:
        return os.path.join(self.root, LOG_DIR)

    @classmethod
    def load(cls, root: str) -> "Manifest | None":
        p = os.path.join(root, MANIFEST_NAME)
        m = None
        if os.path.exists(p):
            with open(p) as f:
                d = json.load(f)
            m = cls(
                root=root,
                num_partitions=d["num_partitions"],
                partitions=d["partitions"],
                epochs=d["epochs"],
                # legacy snapshot (pre-OCC): no log records existed when it
                # was written, so its effective version is arbitrary as long
                # as it is consistent across loads — len(epochs) is
                version=d.get("version", len(d["epochs"])),
                registry_json=d.get("registry_json"),
            )
        m2 = cls._replay_log(root, m)
        return m2 if m2 is not None else m

    @classmethod
    def _replay_log(cls, root: str, m: "Manifest | None") -> "Manifest | None":
        """Fold commit-log records newer than the snapshot into ``m``.
        Handles the crash-before-first-snapshot case (``m is None`` but
        ``_log/v...1.json`` exists) by bootstrapping from the log."""
        logd = os.path.join(root, LOG_DIR)
        if not os.path.isdir(logd):
            return m
        recs: dict[int, str] = {}
        for fn in os.listdir(logd):
            if fn.startswith("v") and fn.endswith(".json"):
                try:
                    recs[int(fn[1:-5])] = fn
                except ValueError:
                    continue
        if not recs:
            return m
        if m is None:
            first = recs.get(1)
            if first is None:
                return None
            with open(os.path.join(logd, first)) as f:
                rec = json.load(f)
            m = cls(root=root, num_partitions=rec["num_partitions"])
        # strictly sequential replay — versions are claimed via CAS so
        # there are no gaps; stop defensively at one anyway
        v = m.version + 1
        while v in recs:
            with open(os.path.join(logd, recs[v])) as f:
                rec = json.load(f)
            m._apply_record(rec)
            v += 1
        return m

    def _apply_record(self, rec: dict[str, Any]) -> None:
        for k, res in rec["state"].items():
            self.partitions[k] = res
        self.epochs.append(rec["epoch"])
        if rec.get("registry"):
            self._fold_registry(rec["registry"])
        self.version = rec["version"]

    def _fold_registry(self, reg_json: str) -> None:
        if self.registry_json is None or self.registry_json == reg_json:
            self.registry_json = reg_json
            return
        from tenzir_ray.cdc.registry import SchemaRegistry

        cur = SchemaRegistry.from_json(self.registry_json)
        cur.evolve(SchemaRegistry.from_json(reg_json).schema)
        self.registry_json = cur.to_json()

    def reload(self) -> None:
        """Re-read the published state (snapshot + any newer log records)
        — the resync step after a lost CAS."""
        m = Manifest.load(self.root)
        if m is None:
            self.partitions, self.epochs, self.version = {}, [], 0
            self.registry_json = None
            return
        self.partitions = m.partitions
        self.epochs = m.epochs
        self.version = m.version
        self.registry_json = m.registry_json
        self.num_partitions = m.num_partitions

    def touched_since(self, version: int) -> set[str]:
        """Partition ids touched by commits newer than ``version`` — the
        conflict-detection input after a lost CAS (records without a
        version are from a pre-OCC snapshot, i.e. older than any load)."""
        out: set[str] = set()
        for e in self.epochs:
            if e.get("version", -1) > version:
                out.update(e.get("files", {}))
        return out

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

    def _epoch_record(
        self,
        epoch_id: str,
        lsn_min: int,
        lsn_max: int,
        part_results: dict[str, dict[str, Any]],
        meta: dict[str, Any] | None,
        version: int,
    ) -> dict[str, Any]:
        return {
            "epoch_id": epoch_id,
            "seq": self.next_seq(),
            "version": version,
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

    def try_commit_epoch(
        self,
        epoch_id: str,
        lsn_min: int,
        lsn_max: int,
        part_results: dict[str, dict[str, Any]],
        meta: dict[str, Any] | None = None,
        registry_json: str | None = None,
    ) -> bool:
        """CAS-commit one epoch at version ``self.version + 1``.

        Returns True on success (state updated, snapshot refreshed). On a
        lost race — another writer claimed the version first — reloads the
        published state and returns False; the CALLER decides whether to
        rebase (append/delta epochs compose under LWW), skip (epoch id
        already committed by the winner) or raise
        :class:`ConcurrentModificationError` (overlapping full rewrite).

        ``registry_json`` (if the epoch evolved the schema) rides the
        record and folds commutatively on replay, so concurrent writers
        adding different columns converge."""
        claim = self.version + 1
        rec = {
            "version": claim,
            "num_partitions": self.num_partitions,
            "epoch": self._epoch_record(
                epoch_id, lsn_min, lsn_max, part_results, meta, claim),
            # full replacement records — callers own the field set
            # (files/rows/delta_rows/tombstones/lsn_high/checksum/…)
            "state": {k: dict(r) for k, r in part_results.items()},
            **({"registry": registry_json} if registry_json else {}),
        }
        logd = self.log_dir
        os.makedirs(logd, exist_ok=True)
        tmp = os.path.join(logd, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(rec, f)
            f.flush()
            os.fsync(f.fileno())
        final = os.path.join(logd, f"v{claim:020d}.json")
        try:
            # atomic create-with-content: link fails iff the name exists,
            # and the content is already durable — no half-written record
            # is ever observable under the final name
            os.link(tmp, final)
        except FileExistsError:
            os.unlink(tmp)
            self.reload()
            return False
        os.unlink(tmp)
        # folded-history guard: if an admin compact_log() deleted records
        # ≤ some snapshot version, a long-stale writer could re-claim a
        # folded number — its record would then be invisible to replay
        # (replay starts after the snapshot version). Detect and undo.
        snap_v = self._snapshot_version()
        if snap_v is not None and snap_v >= claim:
            os.unlink(final)
            self.reload()
            return False
        self._apply_record(rec)
        self._atomic_write()  # snapshot cache; load() replays anything newer
        return True

    def _snapshot_version(self) -> int | None:
        try:
            with open(self.path) as f:
                return json.load(f).get("version", 0)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def commit_epoch(
        self,
        epoch_id: str,
        lsn_min: int,
        lsn_max: int,
        part_results: dict[str, dict[str, Any]],
        meta: dict[str, Any] | None = None,
        registry_json: str | None = None,
    ) -> None:
        """Publish an epoch, retrying lost CAS races. Safe-by-default
        conflict rule: if a concurrent commit touched any of OUR
        partitions, the retry would publish state computed from a stale
        base — raise :class:`ConcurrentModificationError` instead (callers
        with composable semantics, e.g. the lake's append/delta rebase,
        drive :meth:`try_commit_epoch` directly)."""
        while True:
            base_version = self.version
            if self.try_commit_epoch(epoch_id, lsn_min, lsn_max,
                                     part_results, meta=meta,
                                     registry_json=registry_json):
                return
            if epoch_id in self.committed_epoch_ids():
                return  # another process committed this very epoch
            overlap = self.touched_since(base_version) & set(part_results)
            if overlap:
                raise ConcurrentModificationError(
                    f"epoch {epoch_id!r}: partitions {sorted(overlap)} were "
                    "modified by a concurrent writer; re-run against the "
                    "new base")

    def _atomic_write(self) -> None:
        tmp = self.path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "num_partitions": self.num_partitions,
                    "partitions": self.partitions,
                    "epochs": self.epochs,
                    "version": self.version,
                    **({"registry_json": self.registry_json}
                       if self.registry_json else {}),
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
