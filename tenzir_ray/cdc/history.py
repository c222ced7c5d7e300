"""Change-stream history shaping: SCD Type-2 versioning and LSN gap
audits.

- :func:`scd2_history` turns a change stream into the slowly-changing-
  dimension Type-2 layout every warehouse keeps next to its live
  table: one row PER VERSION with ``valid_from`` / ``valid_to`` LSNs
  and an ``is_current`` flag. The live LWW table is exactly
  ``is_current`` + not-deleted; joins against any past LSN become a
  range predicate on ``[valid_from, valid_to)`` (the lake's
  time-travel reads reconstruct state; this materializes the full
  version timeline as DATA, which is what an auditing/ML-feature
  pipeline wants to join against).
- :func:`lsn_gaps` audits stream continuity: per partition key, the
  count of missing LSNs, the largest hole, and the covered range — the
  monitoring signal that a binlog tail dropped records.

Both are one grouped exchange + vectorized shift passes, no per-row
Python. Reference analog: none (the reference keeps no version
history); layout follows the public SCD2 convention (Kimball).
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa

from tenzir_ray._ship import ship_by_value


def scd2_history(ds, keys, lsn_col: str = "lsn", op_col: str = "op",
                 buckets: int | None = None):
    """Materialize SCD Type-2 version rows from a change stream.

    Per key in ``lsn_col`` order: every insert/update row becomes one
    version with ``valid_from = lsn`` and ``valid_to`` = the NEXT
    change's lsn (NULL while current); a delete closes the prior
    version and emits no row of its own; ``is_current`` marks versions
    with no later change (a closing delete makes the key have NO
    current version). Requires each key's history within the stream
    (a replay or the lake's change feed)."""
    from tenzir_ray.stages.exchange import grouped_apply

    kcols = [keys] if isinstance(keys, str) else list(keys)

    def _v(df: pd.DataFrame) -> pd.DataFrame:
        payload = [c for c in df.columns
                   if c not in kcols + [lsn_col, op_col]]
        if not len(df):
            out = df[kcols + payload].iloc[:0].copy()
            out["valid_from"] = pd.Series([], dtype="int64")
            out["valid_to"] = pd.Series([], dtype="float64")
            out["is_current"] = pd.Series([], dtype=bool)
            return out
        df = df.sort_values(kcols + [lsn_col],
                            kind="mergesort").reset_index(drop=True)
        gid = df.groupby(kcols, sort=False, dropna=False).ngroup().to_numpy()
        lsn = df[lsn_col].to_numpy(dtype=np.int64)
        nxt = np.roll(lsn, -1).astype(np.float64)
        has_next = np.r_[gid[1:] == gid[:-1], False]
        out = df[kcols + payload].copy()
        out["valid_from"] = lsn
        out["valid_to"] = np.where(has_next, nxt, np.nan)
        out["is_current"] = ~has_next
        keep = (df[op_col] != "delete").to_numpy()
        return out.loc[keep].reset_index(drop=True)

    return grouped_apply(ds, kcols, _v, num_buckets=buckets, tag="scd2")


def lsn_gaps(ds, lsn_col: str = "lsn", by=None,
             buckets: int | None = None):
    """Stream-continuity audit: per ``by`` group, report ``n_rows``,
    ``lsn_min`` / ``lsn_max``, ``n_missing`` (holes in the dense range;
    duplicates count as covered) and ``max_gap`` (largest single hole,
    0 when contiguous). A healthy exactly-once tail has
    ``n_missing = 0``.

    ``by=None`` audits the whole stream as one group: the input is
    pruned to the lsn column (8 bytes/row crosses the exchange) but the
    final pass IS one task — pass ``by=`` (e.g. the partition id) at
    very large scale."""
    from tenzir_ray.stages.exchange import grouped_apply

    kcols = [by] if isinstance(by, str) else list(by) if by else []

    def _prune(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c) for c in kcols}
        cols[lsn_col] = t.column(lsn_col)
        if not kcols:
            cols["_all"] = pa.array(np.zeros(t.num_rows, dtype=np.int64))
        return pa.table(cols)

    group_cols = kcols or ["_all"]

    def _g(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = df[group_cols].iloc[:0].copy()
            for c in ("n_rows", "lsn_min", "lsn_max", "n_missing",
                      "max_gap"):
                out[c] = pd.Series([], dtype="int64")
            return out
        df = df.sort_values(group_cols + [lsn_col],
                            kind="mergesort").reset_index(drop=True)
        gid = df.groupby(group_cols, sort=False,
                         dropna=False).ngroup().to_numpy()
        starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        ends = np.append(starts[1:], len(df))
        lsn = df[lsn_col].to_numpy(dtype=np.int64)
        prev = np.roll(lsn, 1)
        same = np.r_[False, gid[1:] == gid[:-1]]
        gap = np.where(same, np.maximum(lsn - prev - 1, 0), 0)
        out = df[group_cols].iloc[starts].reset_index(drop=True)
        out["n_rows"] = (ends - starts).astype(np.int64)
        out["lsn_min"] = lsn[starts]
        out["lsn_max"] = lsn[ends - 1]
        out["n_missing"] = np.add.reduceat(gap, starts)
        out["max_gap"] = np.maximum.reduceat(gap, starts)
        return out

    pruned = ds.map_batches(_prune, batch_format="pyarrow")
    out = grouped_apply(pruned, group_cols, _g, num_buckets=buckets,
                        tag="lsngaps")
    if kcols:
        return out

    def _drop(t: pa.Table) -> pa.Table:
        return t.drop_columns(["_all"])

    return out.map_batches(_drop, batch_format="pyarrow")


def snapshot_diff(lake, from_epoch, to_epoch=None,
                  buckets: int | None = None):
    """Row-level diff between two committed lake snapshots — the
    time-travel audit / downstream-sync primitive: which keys were
    inserted, updated, or deleted between epoch ``from_epoch`` and
    ``to_epoch`` (``None`` = the live table)?

    Returns one row per CHANGED key: the key columns, ``change`` in
    {'insert','update','delete'}, and the payload image (the TO side's
    for insert/update, the FROM side's for delete — what a consumer
    needs to undo or re-apply). Unchanged keys (payload equal, nulls
    comparing equal) emit nothing. Both snapshots conform to the
    CURRENT schema registry, so columns always line up; each snapshot
    holds at most one row per key (LWW invariant).

    Scale shape: both sides are distributed time-travel reads
    (:meth:`LakeTable.read` ``as_of`` — lineage file sets, no driver
    materialization), tagged with a side bit and sent through ONE
    grouped exchange on the key columns; per-task groups are ≤2 rows
    per key and compare vectorized."""
    out_schema = _registry_diff_schema(lake)
    a = lake.read(as_of=from_epoch)
    b = lake.read(as_of=to_epoch)
    return dataset_diff(a, b, out_schema=out_schema, buckets=buckets)


def _registry_diff_schema(lake):
    """Arrow output schema of a diff over this lake (keys + change +
    payload), pinned from the schema registry so every reduce task —
    including all-empty ones (a no-change diff) — emits it; Ray drops
    the schema of all-empty PANDAS outputs, but keeps Arrow schemas."""
    from tenzir_ray.cdc.lake import KEY_COLS

    reg = lake.registry.schema
    if reg is None:
        return None
    fields = [f for f in reg if f.name not in ("lsn", "op")]
    by_name = {f.name: f for f in fields}
    if not all(k in by_name for k in KEY_COLS):
        return None
    return pa.schema(
        [by_name[k] for k in KEY_COLS]
        + [pa.field("change", pa.string())]
        + [f for f in fields if f.name not in KEY_COLS])


def dataset_diff(a, b, keys=None, out_schema=None,
                 buckets: int | None = None):
    """Row-level diff of two keyed datasets (at most one row per key
    each): what must change in ``a`` to become ``b``. The engine of
    :func:`snapshot_diff` and :func:`sync_lakes`; same output contract
    (keys + ``change`` + payload image)."""
    import pandas as pd

    from tenzir_ray.cdc.lake import KEY_COLS
    from tenzir_ray.stages.exchange import grouped_apply

    kcols = list(KEY_COLS) if keys is None else (
        [keys] if isinstance(keys, str) else list(keys))

    def _tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, side, np.int8)))

        f.__name__ = f"tag_side{side}"
        return f

    both = a.map_batches(_tag(0), batch_format="pyarrow").union(
        b.map_batches(_tag(1), batch_format="pyarrow"))

    def _diff(df: pd.DataFrame) -> pd.DataFrame:
        payload = [c for c in df.columns if c not in kcols + ["__side"]]
        if not len(df):
            if out_schema is not None:
                return out_schema.empty_table()
            out = df[kcols + payload].iloc[:0].copy()
            out.insert(len(kcols), "change", pd.Series([], dtype=object))
            return out
        df = df.sort_values(kcols + ["__side"],
                            kind="mergesort").reset_index(drop=True)
        gid = df.groupby(kcols, sort=False, dropna=False).ngroup().to_numpy()
        starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        ends = np.append(starts[1:], len(df))
        n = ends - starts
        side = df["__side"].to_numpy()
        single = n == 1
        # count==1: side decides insert/delete; count==2: compare rows
        # starts (from) vs starts+1 (to), both-null = equal
        pair = ~single
        p0, p1 = starts[pair], starts[pair] + 1
        differs = np.zeros(len(p0), dtype=bool)
        for c in payload:
            v = df[c]
            a_, b_ = v.iloc[p0].reset_index(drop=True), \
                v.iloc[p1].reset_index(drop=True)
            na, nb = a_.isna().to_numpy(), b_.isna().to_numpy()
            neq = (a_ != b_).to_numpy() & ~(na & nb)
            differs |= neq | (na != nb)
        ins = starts[single & (side[starts] == 1)]
        dele = starts[single & (side[starts] == 0)]
        upd = p1[differs]
        take = np.concatenate([ins, dele, upd])
        change = np.concatenate([
            np.full(len(ins), "insert", object),
            np.full(len(dele), "delete", object),
            np.full(len(upd), "update", object)])
        out = df.iloc[take][kcols + payload].reset_index(drop=True)
        out.insert(len(kcols), "change", change)
        if out_schema is not None:
            return pa.Table.from_pandas(
                out[out_schema.names], schema=out_schema,
                preserve_index=False)
        return out

    return grouped_apply(both, kcols, _diff, num_buckets=buckets,
                         tag="snapdiff")


def sync_lakes(src, dst, epoch_id: str, buckets: int | None = None):
    """Anti-entropy replication step: make ``dst`` converge to ``src``
    in ONE exactly-once epoch, whatever their histories. Diffs the two
    LIVE states (``dataset_diff(dst, src)`` — so it repairs divergence,
    not just replays deltas), turns the diff into change rows (delete →
    tombstone, insert/update → upsert) with an lsn strictly above
    everything ``dst`` holds, and applies it. A no-change sync commits
    an empty epoch; re-running the same ``epoch_id`` is a no-op
    (the lake's exactly-once contract). Cost: one grouped exchange over
    both tables + an apply sized by the DIFF, not the tables."""
    diff_schema = _registry_diff_schema(src)
    d = dataset_diff(dst.read(), src.read(), out_schema=diff_schema,
                     buckets=buckets)
    lsn0 = max(int(dst.resume_lsn()), int(src.resume_lsn()))

    def _as_changes(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        op = pc.if_else(pc.equal(t.column("change"), "delete"),
                        pa.scalar("delete"), pa.scalar("insert"))
        t = t.drop_columns(["change"])
        t = t.append_column("lsn", pa.array(
            np.full(t.num_rows, lsn0, np.int64)))
        return t.append_column("op", op)

    changes = d.map_batches(_as_changes, batch_format="pyarrow")
    if diff_schema is not None:
        # Ray reports schema None for an all-empty mapped dataset (the
        # no-change sync); a 0-row Arrow anchor keeps apply_changes'
        # schema probe working
        import ray.data

        anchor = pa.schema(
            [f for f in diff_schema if f.name != "change"]
            + [pa.field("lsn", pa.int64()), pa.field("op", pa.string())]
        ).empty_table()
        changes = ray.data.from_arrow(anchor).union(changes)
    return dst.apply_changes(changes, epoch_id=epoch_id)


ship_by_value(sys.modules[__name__])
