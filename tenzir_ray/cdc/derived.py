"""Incrementally-maintained materialized aggregate over a CDC lake table.

The missing half of a CDC engine: once changes land in the lake, derived
tables (per-conversation rollups, counters, feature tables) must follow
without full recomputes. This is delta-driven PARTIAL recompute: each
source epoch's change feed names the groups it touched; only those
groups are re-aggregated from the (partition/row-group-pruned) live lake
and upserted into a second :class:`LakeTable` under the SAME epoch id —
so the refresh inherits the lake's exactly-once machinery, crash-resume
included (re-running a refresh skips source epochs already committed to
the derived manifest). Refresh cost tracks change volume, not base size.

Scale contract: a refresh holds ONE epoch's distinct group keys on the
driver (bounded by the epoch micro-batch, the same class of bound as a
broadcast join side) and re-reads only those groups via an ``isin`` scan
filter. The re-aggregate runs through ``summarize``'s shuffle-free
partial path for decomposable functions.

Monotonicity: derived-row LSNs are the source epoch's POSITION in
lineage (apply order), not its lsn range — source epochs may arrive
out of LSN order (backfill), but refreshes always observe the CURRENT
live state, so later refreshes must win LWW in the derived table.

Reference analog: continuous `export | summarize | import` loops users
build with the reference's pipelines-as-code API (web/docs use cases);
here it is a first-class operator with exactly-once semantics.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from tenzir_ray.cdc.lake import LakeTable


class DerivedView:
    """A materialized aggregate ``SELECT group, aggs FROM source GROUP BY
    group`` maintained incrementally from the source lake's change feed.

    ``aggs`` uses ``summarize`` syntax: ``{"turns": "count(*)",
    "max_turn": "max(turn_idx)"}``. Group values are stored in the
    derived lake's ``conv_id`` key column (stringified); ``turn_idx`` is
    a constant 0 (one row per group).
    """

    def __init__(self, source: LakeTable, root: str,
                 aggs: dict[str, str], group_col: str = "conv_id",
                 num_partitions: int = 16):
        self.source = source
        self.aggs = dict(aggs)
        self.group_col = group_col
        self.table = LakeTable(root, num_partitions)

    # ------------------------------------------------------------------
    def pending_epochs(self) -> list[str]:
        """Source epochs not yet reflected in the derived table, in
        lineage (apply) order. Compaction records don't change state."""
        done = self.table.manifest.committed_epoch_ids()
        return [
            e["epoch_id"]
            for e in self.source.manifest.epochs
            if not (e.get("meta") or {}).get("_compaction")
            and e["epoch_id"] not in done
        ]

    def refresh(self, epochs: "list[str] | None" = None) -> list[dict]:
        """Apply every pending source epoch (or the given subset) to the
        derived table. Idempotent: committed source epochs skip."""
        from tenzir_ray.stages.summarize import summarize

        todo = self.pending_epochs()
        if epochs is not None:
            keep = set(epochs)
            todo = [e for e in todo if e in keep]
        results = []
        src_epochs = {e["epoch_id"]: e for e in self.source.manifest.epochs}
        for eid in todo:
            # absolute apply-sequence, NOT the lineage index: the index
            # shrinks under source.truncate_lineage(), which would hand
            # later refreshes lower LWW lsns than already-stored rows
            seq = self.source.manifest.epoch_seq(eid)
            if not src_epochs.get(eid, {}).get("partitions"):
                # zero-row source epoch (idle binlog tail): nothing to
                # touch — drain it BEFORE the feed-mode check, whose
                # empty-feed fallback has no _change_type column and
                # would wedge a payload-group view on this epoch forever
                self.table.manifest.commit_epoch(eid, -1, -1, {})
                results.append({"epoch_id": eid, "groups": 0})
                continue
            touched = self._touched_groups(eid)
            if not touched:
                # zero-row source epoch: commit an empty derived epoch so
                # pending_epochs() drains
                self.table.manifest.commit_epoch(eid, -1, -1, {})
                results.append({"epoch_id": eid, "groups": 0})
                continue
            change_tbl = self._recompute(sorted(touched), seq, summarize)
            res = self.table.apply_changes(change_tbl, epoch_id=eid)
            res["groups"] = len(touched)
            results.append(res)
        return results

    # ------------------------------------------------------------------
    #: lake key columns — group values for these ride every change row
    #: (tombstones included), so the postimage feed suffices
    _KEY_COLS = ("conv_id", "turn_idx")

    def _touched_groups(self, epoch_id: str) -> set:
        from tenzir_ray.cdc.lake import CHANGE_TYPE_COL

        feed = self.source.changes(epochs=[epoch_id])
        col = self.group_col
        if col not in self._KEY_COLS:
            names = feed.schema().names
            if CHANGE_TYPE_COL not in names:
                raise ValueError(
                    f"group_col {col!r} is a payload column: an update that "
                    "moves a row between groups (or a delete tombstone with "
                    "a null payload) only names the OLD group in a preimage "
                    "feed — apply source epochs with "
                    'change_feed="preimages" to maintain this view')

        def _uniq(t: pa.Table) -> pa.Table:
            return pa.table({col: pc.unique(t.column(col))})

        vals: set = set()
        for b in feed.map_batches(_uniq, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            vals.update(v for v in b.column(col).to_pylist() if v is not None)
        return vals

    def _recompute(self, groups: list, seq: int, summarize) -> pa.Table:
        import pyarrow.dataset as pads

        flt = pads.field(self.group_col).isin(groups)
        live = self.source.read(filter=flt)
        agg = summarize(live, by=[self.group_col], **self.aggs)
        # bounded: one row per touched group. An empty Dataset drops its
        # schema in to_pandas (all rows of every touched group deleted) —
        # treat missing columns as zero present groups.
        cur = agg.to_pandas()
        if cur.empty or self.group_col not in cur.columns:
            present: set = set()
            cur = None
        else:
            present = set(cur[self.group_col])
        gone = [g for g in groups if g not in present]

        tables = []
        if cur is not None:
            n = len(cur)
            cols: dict[str, pa.Array] = {
                "lsn": pa.array([seq] * n, pa.int64()),
                "op": pa.array(["insert"] * n, pa.string()),
                "conv_id": pa.array(cur[self.group_col].astype(str), pa.string()),
                "turn_idx": pa.array([0] * n, pa.int32()),
            }
            for alias in self.aggs:
                cols[alias] = pa.Array.from_pandas(cur[alias])
            tables.append(pa.table(cols))
        if gone:
            m = len(gone)
            # agg columns omitted: the lake's permissive concat / registry
            # conform pads tombstone payloads with nulls
            tables.append(pa.table({
                "lsn": pa.array([seq] * m, pa.int64()),
                "op": pa.array(["delete"] * m, pa.string()),
                "conv_id": pa.array([str(g) for g in gone], pa.string()),
                "turn_idx": pa.array([0] * m, pa.int32()),
            }))
        if len(tables) == 1:
            return tables[0]
        return pa.concat_tables(tables, promote_options="permissive")

    # ------------------------------------------------------------------
    def read(self, columns: list[str] | None = None):
        return self.table.read(columns=columns)

    def final_table(self) -> pa.Table:
        t = self.table.final_table()
        if t.num_columns == 0:  # no refresh yet / only zero-row epochs
            reg = self.table.registry.schema
            if reg is not None:
                # a prior refresh fixed the real aggregate types — match
                # them so empty/non-empty snapshots share one schema
                return pa.table({
                    (self.group_col if f.name == "conv_id" else f.name):
                        pa.array([], f.type)
                    for f in reg if f.name != "turn_idx"})
            return pa.table({self.group_col: pa.array([], pa.string()),
                             **{a: pa.array([], pa.float64())
                                for a in self.aggs}})
        return t.drop_columns(["turn_idx"]).rename_columns(
            [self.group_col if c == "conv_id" else c
             for c in t.column_names if c != "turn_idx"]
        )


import sys as _sys

from tenzir_ray._ship import ship_by_value as _ship

_ship(_sys.modules[__name__])
