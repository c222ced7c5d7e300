"""Windowed aggregation over event-time (stream-shaped workloads).

Ray Data has no event-time windows/watermarks; per the engine's ordering
philosophy (explicit keys, not assumed stream order), windows are
computed per key with ``groupby(key).map_groups`` over the sorted group:

- tumbling: fixed buckets — use ``summarize.time_bucket`` + ``summarize``
  (the reference's `resolution`, summarize.cpp:41).
- sliding_window: overlapping fixed windows (each event lands in
  ``size/slide`` windows; implemented by exploding events to their
  window starts — stays vectorized).
- session_window: gap-based sessions per key (a new session starts when
  the gap to the previous event exceeds ``gap``) — beyond the
  reference's wall-clock timeouts, expressed in event time.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd

from tenzir_ray._ship import ship_by_value


def _to_ns(s: str) -> int:
    import re

    m = re.match(r"^(\d+)\s*(s|m|min|h|d)$", s)
    if not m:
        raise ValueError(f"bad duration {s!r}")
    mult = {"s": 1, "m": 60, "min": 60, "h": 3600, "d": 86400}[m.group(2)]
    return int(m.group(1)) * mult * 1_000_000_000


def sliding_window(ds, ts_column: str, size: str, slide: str,
                   by: str | list[str] | None = None,
                   agg_column: str | None = None):
    """Overlapping windows: emit (window_start[, keys], n[, sum_v]).

    Each event belongs to every window whose start is in
    ``(ts - size, ts]`` stepped by ``slide`` — the explode is vectorized
    per batch (size/slide copies per row), then one groupby.
    """
    size_ns, slide_ns = _to_ns(size), _to_ns(slide)
    copies = (size_ns + slide_ns - 1) // slide_ns
    keys = ([by] if isinstance(by, str) else list(by)) if by else []

    def _explode(df: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(df[ts_column]).astype("datetime64[ns]").astype("int64").to_numpy()
        # last window start covering the event
        last_start = (ts // slide_ns) * slide_ns
        offsets = np.arange(copies) * slide_ns
        starts = last_start[:, None] - offsets[None, :]
        valid = starts > (ts[:, None] - size_ns)
        idx, win = np.nonzero(valid)
        out = df.iloc[idx].copy()
        out["window_start"] = pd.to_datetime(starts[idx, win])
        return out

    exploded = ds.map_batches(_explode, batch_format="pandas")
    gcols = ["window_start"] + keys

    def _agg(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(gcols, as_index=False, sort=False)
        if agg_column:
            out = gb.agg(n=(ts_column, "size"), total=(agg_column, "sum"))
        else:
            out = gb.agg(n=(ts_column, "size"))
        return out

    # bucket by window_start hash → vectorized pandas agg per bucket
    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["_b"] = pd.util.hash_array(df["window_start"].to_numpy()) % 32
        return df

    return (
        exploded.map_batches(_bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(lambda g: _agg(g.drop(columns=["_b"])), batch_format="pandas")
    )


def session_window(ds, ts_column: str, gap: str, by: str | list[str],
                   agg_column: str | None = None):
    """Gap-based sessions per key: a session breaks when consecutive
    events are more than ``gap`` apart. Emits
    (keys, session_start, session_end, n[, total])."""
    gap_ns = _to_ns(gap)
    keys = [by] if isinstance(by, str) else list(by)

    from tenzir_ray.stages.transforms import _bucketed_groups

    def _sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """ONE vectorized sessionization over ALL keys in the bucket:
        sort by (keys, ts), mark session starts where the key tuple
        changes OR the gap is exceeded, cumsum session ids, one pandas
        groupby. No per-key Python — the per-group ``map_groups`` trap
        (~4 ms/group) this replaces melts at millions of session keys."""
        if not len(g):
            cols = keys + ["session_start", "session_end", "n"]
            if agg_column:
                cols.append("total")
            return pd.DataFrame({c: [] for c in cols})
        g = g.sort_values(keys + [ts_column], kind="mergesort")
        # normalize to ns regardless of the column's stored resolution
        ts = pd.to_datetime(g[ts_column]).astype("datetime64[ns]").astype("int64").to_numpy()
        key_change = np.zeros(len(g), dtype=bool)
        key_change[0] = True
        for k in keys:
            # factorize: null keys get one sentinel code, so null==null
            # (a null-keyed group sessionizes as one key, not per-row)
            codes = pd.factorize(g[k], use_na_sentinel=True)[0]
            key_change[1:] |= codes[1:] != codes[:-1]
        new_session = key_change | np.r_[True, (ts[1:] - ts[:-1]) > gap_ns]
        sid = np.cumsum(new_session)
        g = g.assign(_sid=sid)
        gb = g.groupby(keys + ["_sid"], as_index=False, sort=False)
        aggs = {"session_start": (ts_column, "min"),
                "session_end": (ts_column, "max"),
                "n": (ts_column, "size")}
        if agg_column:
            aggs["total"] = (agg_column, "sum")
        return gb.agg(**aggs).drop(columns=["_sid"])

    cols = keys + [ts_column] + ([agg_column] if agg_column else [])
    return _bucketed_groups(ds.select_columns(cols), keys, _sessions_bucket)


def window_shift(ds, by, order_by: str, column: str, periods: int = 1,
                 out: str | None = None, buckets: int | None = None):
    """Per-group ordered lag/lead: SQL's ``lag(column, n) OVER
    (PARTITION BY by ORDER BY order_by)`` (negative ``periods`` =
    lead). Output = input columns + ``out`` (default
    ``{column}_lag{n}`` / ``{column}_lead{n}``), null where the window
    runs off the group edge.

    Determinism contract (same as SQL): ``order_by`` must be unique
    within a group, else peer ordering is unspecified — ties here break
    by the engine's stable sort of arrival order, which a re-shuffled
    run may permute.

    Scale shape: one grouped exchange on ``by``; per task a vectorized
    sort + pandas groupby shift (C kernel per task, not per group)."""
    import pandas as pd

    bycols = [by] if isinstance(by, str) else list(by)
    name = out or (
        f"{column}_lag{periods}" if periods >= 0
        else f"{column}_lead{-periods}")

    def _shift(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df[name] = pd.Series([], dtype="object")
            return df
        df = df.sort_values(bycols + [order_by], kind="mergesort")
        df[name] = df.groupby(bycols, sort=False, dropna=False)[column].shift(periods)
        return df

    from tenzir_ray.stages.exchange import grouped_apply

    return grouped_apply(ds, bycols, _shift, num_buckets=buckets,
                         tag="wshift")


def window_rank(ds, by, order_by: str, method: str = "rank",
                out: str = "rank", descending: bool = False,
                buckets: int | None = None):
    """Per-group rank: SQL's ``rank() / dense_rank() / row_number()
    OVER (PARTITION BY by ORDER BY order_by)``. ``method`` ∈ rank |
    dense | row_number. Ties share a rank for rank/dense (with the SQL
    gap/no-gap distinction); row_number breaks ties by arrival order —
    as in SQL, only deterministic when ``order_by`` is unique per
    group. Same grouped-exchange shape as :func:`window_shift`."""
    import pandas as pd

    methods = {"rank": "min", "dense": "dense", "row_number": "first"}
    if method not in methods:
        raise ValueError(
            f"method must be one of {sorted(methods)}, got {method!r}")
    bycols = [by] if isinstance(by, str) else list(by)

    def _rank(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df[out] = pd.Series([], dtype="int64")
            return df
        # na_option="bottom": null order keys sort NULLS LAST (DuckDB's
        # default null ordering) and tie among themselves, instead of
        # producing NaN ranks that crash the int cast
        r = df.groupby(bycols, sort=False, dropna=False)[order_by].rank(
            method=methods[method], ascending=not descending,
            na_option="bottom")
        df[out] = r.astype("int64")
        return df

    from tenzir_ray.stages.exchange import grouped_apply

    return grouped_apply(ds, bycols, _rank, num_buckets=buckets,
                         tag="wrank")


_CUM_FNS = {"sum": "cumsum", "min": "cummin", "max": "cummax",
            "count": "cumcount"}


def window_cum(ds, by, order_by: str, column: str, fn: str = "sum",
               out: str | None = None, buckets: int | None = None):
    """Per-group ordered running aggregate: SQL's ``sum/min/max/count(column)
    OVER (PARTITION BY by ORDER BY order_by ROWS UNBOUNDED PRECEDING)``.
    ``fn`` ∈ sum | min | max | count (count ignores nulls in ``column``
    like SQL's count(col)). Same determinism contract and scale shape
    as :func:`window_shift` (one grouped exchange, C-kernel cumulative
    per task)."""
    import pandas as pd

    if fn not in _CUM_FNS:
        raise ValueError(f"fn must be one of {sorted(_CUM_FNS)}, got {fn!r}")
    bycols = [by] if isinstance(by, str) else list(by)
    name = out or f"{column}_cum{fn}"

    def _cum(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df[name] = pd.Series([], dtype="float64")
            return df
        df = df.sort_values(bycols + [order_by], kind="mergesort")
        keys = [df[c] for c in bycols]
        # SQL frame semantics over nulls: a null value contributes
        # nothing but the row still observes the running aggregate
        # (pandas' cumsum/cummin would emit NaN at the null row); the
        # result is NULL only while the frame has seen no non-null value
        cnt = (df[column].notna()
               .groupby(keys, sort=False, dropna=False).cumsum())
        if fn == "count":
            df[name] = cnt.astype("int64")
        else:
            fill = {"sum": 0, "min": float("inf"),
                    "max": float("-inf")}[fn]
            filled = df[column].fillna(fill)
            agg = getattr(
                filled.groupby(keys, sort=False, dropna=False),
                _CUM_FNS[fn])()
            df[name] = agg.where(cnt > 0)
        return df

    from tenzir_ray.stages.exchange import grouped_apply

    return grouped_apply(ds, bycols, _cum, num_buckets=buckets,
                         tag="wcum")


ship_by_value(sys.modules[__name__])
