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


ship_by_value(sys.modules[__name__])
