"""Large-large joins.

The reference has NO stream-stream join (SURVEY §2.5 notes the absence;
enrichment contexts are its only join-like construct) — this is an
engine extension. Two paths:

- :func:`hash_join` — the portable explicit co-partitioned hash join:
  both sides get a deterministic ``bucket = hash(key) % B`` column and a
  side tag, are unioned under a combined schema, and each bucket joins
  its two sides with one vectorized pandas merge (B Python calls total).
  Use for both-sides-large; broadcast `state.context.enrich` remains the
  right tool for small dimension sides.
- ``Dataset.join`` (Ray native, hash-partitioned) exists in this Ray
  version but rides the hash-shuffle backend that measured pathological
  in local mode; prefer :func:`hash_join` until that backend matures.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa

from tenzir_ray._ship import ship_by_value


def _key_hash(df: pd.DataFrame, keys: list[str], buckets: int) -> np.ndarray:
    """Deterministic bucket per key tuple; keys stringified so the two
    sides agree even when physical dtypes differ (int32 vs int64)."""
    h = pd.util.hash_array(df[keys[0]].astype(str).to_numpy(dtype=object))
    for k in keys[1:]:
        h = h ^ pd.util.hash_array(df[k].astype(str).to_numpy(dtype=object))
    return (h % buckets).astype(np.int64)


def hash_join(left, right, on: str | list[str], right_on: str | list[str] | None = None,
              how: str = "inner", buckets: int = 32, right_suffix: str = "_r"):
    """Co-partitioned hash join of two Datasets.

    ``on``/``right_on`` name the key columns; overlapping non-key columns
    from the right get ``right_suffix``. Supported ``how``: inner, left.
    """
    lkeys = [on] if isinstance(on, str) else list(on)
    rkeys = lkeys if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on)
    )

    lschema = left.schema()
    rschema = right.schema()
    lcols = lschema.names
    rcols = rschema.names
    rename_r = {
        c: (c + right_suffix if c in lcols and c not in rkeys else c) for c in rcols
    }
    l_out = [c for c in lcols]
    r_out = [rename_r[c] for c in rcols]
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = {rename_r[n]: t for n, t in zip(rschema.names, rschema.types)}
    # combined schema with TYPED null padding — object-dtype padding would
    # force pickled pandas blocks through the shuffle (measured ~3x cost)
    combined = {**{c: ltypes[c] for c in l_out},
                **{c: rtypes[c] for c in r_out if c not in l_out}}
    all_cols = list(combined)

    def _tag_pad(side: int, keys_for_hash: list[str], ren: dict | None):
        def f(batch: pa.Table) -> pa.Table:
            if ren:
                batch = batch.rename_columns([ren.get(c, c) for c in batch.column_names])
            kdf = pd.DataFrame({k: batch.column(k).to_pandas() for k in keys_for_hash})
            jb = _key_hash(kdf, keys_for_hash, buckets)
            n = batch.num_rows
            cols = []
            for c in all_cols:
                if c in batch.column_names:
                    col = batch.column(c)
                    if not col.type.equals(combined[c]):
                        col = col.cast(combined[c])
                    cols.append(col)
                else:
                    cols.append(pa.nulls(n, combined[c]))
            out = pa.table(cols, names=all_cols)
            out = out.append_column("_jb", pa.array(jb, pa.int64()))
            return out.append_column(
                "_side", pa.array(np.full(n, side, dtype=np.int8))
            )

        return f

    unioned = left.map_batches(
        _tag_pad(0, lkeys, None), batch_format="pyarrow"
    ).union(
        right.map_batches(
            _tag_pad(1, [rename_r.get(k, k) for k in rkeys], rename_r),
            batch_format="pyarrow",
        )
    )

    r_key_names = [rename_r.get(k, k) for k in rkeys]

    def _join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g[g["_side"] == 0][l_out]
        rhs = g[g["_side"] == 1][[c for c in r_out]]
        merged = lhs.merge(
            rhs, how=how, left_on=lkeys, right_on=r_key_names
        )
        return merged

    return unioned.groupby("_jb").map_groups(_join_bucket, batch_format="pandas")


def asof_join(left, right, by: str | list[str], on: str,
              direction: str = "backward", right_suffix: str = "_r",
              buckets: int = 32):
    """As-of join: for each left row, the latest right row with
    ``right.on <= left.on`` (direction="backward") within the same
    ``by`` key — the time-series enrichment join (pd.merge_asof per
    co-partitioned bucket; both sides bucketed by the BY key so every
    key's full history lands in one bucket)."""
    keys = [by] if isinstance(by, str) else list(by)
    lcols = left.schema().names
    rcols = right.schema().names
    rename_r = {
        c: (c + right_suffix if c in lcols and c not in keys and c != on else c)
        for c in rcols
    }

    def _tag(side: int, ren: dict | None):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            if ren:
                df = df.rename(columns=ren)
            df = df.copy()
            df["_jb"] = _key_hash(df, keys, buckets)
            df["_side"] = side
            return df

        return f

    l_out = list(lcols)
    r_out = [rename_r[c] for c in rcols]
    all_cols = l_out + [c for c in r_out if c not in l_out] + ["_jb", "_side"]

    def _pad(df: pd.DataFrame) -> pd.DataFrame:
        for c in all_cols:
            if c not in df.columns:
                df[c] = None
        return df[all_cols]

    lt = left.map_batches(_tag(0, None), batch_format="pandas").map_batches(
        _pad, batch_format="pandas"
    )
    rt = right.map_batches(_tag(1, rename_r), batch_format="pandas").map_batches(
        _pad, batch_format="pandas"
    )

    def _asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g[g["_side"] == 0][l_out].sort_values(on, kind="mergesort")
        rhs = g[g["_side"] == 1][r_out].sort_values(on, kind="mergesort")
        for df in (lhs, rhs):
            df[on] = pd.to_datetime(df[on]) if df[on].dtype == object else df[on]
        if not len(rhs):
            out = lhs.copy()
            for c in r_out:
                if c not in out.columns:
                    out[c] = None
            return out
        return pd.merge_asof(
            lhs, rhs, on=on, by=keys, direction=direction
        )

    return lt.union(rt).groupby("_jb").map_groups(
        _asof_bucket, batch_format="pandas"
    )


ship_by_value(sys.modules[__name__])
