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


def window_ntile(ds, by, order_by: str, n: int, out: str = "ntile",
                 buckets: int | None = None):
    """Per-group ``ntile(n)``: SQL's ``ntile(n) OVER (PARTITION BY by
    ORDER BY order_by)`` — rows split into ``n`` buckets whose sizes
    differ by at most one, earlier buckets larger (the SQL tile rule:
    the first ``count %% n`` tiles get ``ceil(count/n)`` rows).

    Determinism contract (same as SQL): ties in ``order_by`` are broken
    by arrival order, so only unique order keys are reproducible across
    shuffles. Scale shape: one grouped exchange on ``by``; per task a
    vectorized sort + cumcount/size arithmetic (no per-group Python)."""
    if n < 1:
        raise ValueError(f"ntile: n must be >= 1, got {n}")
    bycols = [by] if isinstance(by, str) else list(by)

    def _ntile(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df[out] = pd.Series([], dtype="int64")
            return df
        df = df.sort_values(bycols + [order_by], kind="mergesort")
        g = df.groupby(bycols, sort=False, dropna=False)[order_by]
        pos = g.cumcount().to_numpy()
        cnt = g.transform("size").to_numpy()
        q, r = cnt // n, cnt % n
        big = r * (q + 1)  # rows in the (q+1)-sized leading tiles
        in_big = pos < big
        tile = np.where(
            in_big,
            pos // np.maximum(q + 1, 1),
            # guard q == 0 (more tiles than rows: every row its own tile)
            r + (pos - big) // np.maximum(q, 1),
        )
        df[out] = (tile + 1).astype(np.int64)
        return df

    from tenzir_ray.stages.exchange import grouped_apply

    return grouped_apply(ds, bycols, _ntile, num_buckets=buckets,
                         tag="wntile")


def window_percent(ds, by, order_by: str, method: str = "percent_rank",
                   out: str | None = None, descending: bool = False,
                   buckets: int | None = None):
    """Per-group relative rank: SQL's ``percent_rank()`` =
    ``(rank - 1) / (count - 1)`` (0.0 for single-row groups) or
    ``cume_dist()`` = ``peers_at_or_before / count``. Null order keys
    sort NULLS LAST (DuckDB's ASC default) and tie among themselves.
    Same grouped-exchange shape as :func:`window_rank`."""
    if method not in ("percent_rank", "cume_dist"):
        raise ValueError(
            f"method must be percent_rank or cume_dist, got {method!r}")
    name = out or method
    bycols = [by] if isinstance(by, str) else list(by)

    def _pct(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df[name] = pd.Series([], dtype="float64")
            return df
        g = df.groupby(bycols, sort=False, dropna=False)[order_by]
        cnt = g.transform("size").to_numpy(dtype=np.float64)
        if method == "percent_rank":
            r = g.rank(method="min", ascending=not descending,
                       na_option="bottom").to_numpy(dtype=np.float64)
            denom = np.maximum(cnt - 1.0, 1.0)
            df[name] = (r - 1.0) / denom
        else:  # cume_dist: max-rank of the peer group / count
            r = g.rank(method="max", ascending=not descending,
                       na_option="bottom").to_numpy(dtype=np.float64)
            df[name] = r / cnt
        return df

    from tenzir_ray.stages.exchange import grouped_apply

    return grouped_apply(ds, bycols, _pct, num_buckets=buckets,
                         tag="wpct")


def window_value(ds, by, order_by: str, column: str, which: str = "first",
                 nth: int = 1, out: str | None = None,
                 buckets: int | None = None):
    """Per-group positional value over the WHOLE partition: SQL's
    ``first_value / last_value / nth_value(column, n) OVER (PARTITION BY
    by ORDER BY order_by ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
    FOLLOWING)``. The frame is pinned to the full partition on purpose —
    SQL's default RANGE..CURRENT ROW frame makes ``last_value`` a
    per-peer-group surprise; pin the frame in oracle SQL the same way.
    Nulls in ``column`` count as values (SQL default, no IGNORE NULLS).
    ``nth`` is 1-based; rows of groups shorter than ``nth`` get null.
    Same determinism contract and scale shape as :func:`window_shift`."""
    if which not in ("first", "last", "nth"):
        raise ValueError(f"which must be first|last|nth, got {which!r}")
    if nth < 1:
        raise ValueError(f"nth is 1-based, got {nth}")
    name = out or (f"{column}_{which}" if which != "nth"
                   else f"{column}_nth{nth}")
    bycols = [by] if isinstance(by, str) else list(by)

    def _val(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df[name] = pd.Series([], dtype="object")
            return df
        df = df.sort_values(bycols + [order_by], kind="mergesort")
        g = df.groupby(bycols, sort=False, dropna=False)
        if which == "first":
            df[name] = g[column].transform("first")
        elif which == "last":
            df[name] = g[column].transform("last")
        else:
            # broadcast the nth row's value across its group via a
            # group-id indexed scatter/gather (no per-group Python)
            pos = g[order_by].cumcount().to_numpy()
            gid = g.ngroup().to_numpy()
            picked = np.full(int(gid.max()) + 1, None, dtype=object)
            rows = np.flatnonzero(pos == nth - 1)
            picked[gid[rows]] = df[column].to_numpy()[rows]
            df[name] = picked[gid]
        return df

    from tenzir_ray.stages.exchange import grouped_apply

    return grouped_apply(ds, bycols, _val, num_buckets=buckets,
                         tag="wval")


_RESAMPLE_AGGS = ("mean", "sum", "min", "max", "count")
_RESAMPLE_FILLS = ("null", "zero", "ffill", "interpolate")


def resample(ds, ts_column: str, every: str, by, value_col: str,
             agg: str = "mean", fill: str = "ffill",
             out: str | None = None, buckets: int | None = None):
    """Per-key time-series resampling with gap fill: bucket events to a
    fixed ``every`` grid (epoch-aligned floor — the same convention as
    ``summarize.time_bucket`` / DuckDB's ``time_bucket``), aggregate
    ``value_col`` per (key, bucket), then DENSIFY each key's grid from
    its first to its last bucket and fill the gaps:

    - ``fill="null"``  — leave missing buckets NULL
    - ``fill="zero"``  — 0 (natural for count/sum)
    - ``fill="ffill"`` — carry the last seen aggregate forward
    - ``fill="interpolate"`` — linear between the neighboring known
      buckets (no extrapolation: leading/trailing gaps stay NULL)

    Output: key columns + ``ts_column`` (the bucket timestamp) + ``out``
    (default ``{value_col}_{agg}``), one row per key × grid step.

    Scale shape: one grouped exchange on the key; per task everything is
    numpy/pandas C kernels — bucketing, groupby-agg, grid construction
    (repeat/arange), merge, and the fills (groupby-ffill / vectorized
    prev-next interpolation with per-key resets). A key's dense grid
    must fit its reduce task — keys with year-long spans at 1 s steps
    want a coarser ``every``."""
    if agg not in _RESAMPLE_AGGS:
        raise ValueError(f"agg must be one of {_RESAMPLE_AGGS}, got {agg!r}")
    if fill not in _RESAMPLE_FILLS:
        raise ValueError(
            f"fill must be one of {_RESAMPLE_FILLS}, got {fill!r}")
    width = _to_ns(every)
    bycols = [by] if isinstance(by, str) else list(by)
    name = out or f"{value_col}_{agg}"

    def _resample(df: pd.DataFrame) -> pd.DataFrame:
        cols = bycols + [ts_column, name]
        if not len(df):
            return pd.DataFrame({c: pd.Series(dtype="object")
                                 for c in cols})
        ns = df[ts_column].to_numpy().astype("datetime64[ns]").astype(
            np.int64)
        df = df.assign(_bk=(ns // width) * width)
        aggd = (df.groupby(bycols + ["_bk"], sort=True, dropna=False)
                [value_col].agg(agg).reset_index())
        # dense grid per key: mn..mx inclusive, step = width
        spans = (aggd.groupby(bycols, sort=True, dropna=False)["_bk"]
                 .agg(["min", "max"]).reset_index())
        counts = ((spans["max"].to_numpy() - spans["min"].to_numpy())
                  // width + 1).astype(np.int64)
        gkeys = spans[bycols].loc[spans.index.repeat(counts)] \
            .reset_index(drop=True)
        # offset within each key's grid (0,1,2,... per key)
        cum = np.concatenate(([0], np.cumsum(counts)))
        pos = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
            cum[:-1], counts)
        grid_bk = np.repeat(spans["min"].to_numpy(), counts) + pos * width
        grid = gkeys.assign(_bk=grid_bk)
        merged = grid.merge(aggd, on=bycols + ["_bk"], how="left")
        vals = merged[value_col].to_numpy(dtype=np.float64,
                                          na_value=np.nan)
        valid = ~np.isnan(vals)
        if fill == "zero":
            vals = np.nan_to_num(vals, nan=0.0)
        elif fill == "ffill":
            n = len(vals)
            idx = np.arange(n)
            pv = np.maximum.accumulate(np.where(valid, idx, -1))
            gstart = np.repeat(cum[:-1], counts)
            ok = pv >= gstart  # don't carry across key boundaries
            vals = np.where(ok, vals[np.maximum(pv, 0)], np.nan)
        elif fill == "interpolate":
            n = len(vals)
            idx = np.arange(n)
            gstart = np.repeat(cum[:-1], counts)
            gend = np.repeat(cum[1:] - 1, counts)
            pv = np.maximum.accumulate(np.where(valid, idx, -1))
            nv = np.minimum.accumulate(
                np.where(valid, idx, n)[::-1])[::-1]
            fillable = (~valid & (pv >= gstart) & (nv <= gend))
            if fillable.any():
                p, nx = pv[fillable], nv[fillable]
                w = (idx[fillable] - p) / (nx - p)
                vals = vals.copy()
                vals[fillable] = vals[p] + (vals[nx] - vals[p]) * w
        out_df = grid[bycols].copy()
        out_df[ts_column] = grid["_bk"].to_numpy().astype(
            "datetime64[ns]")
        out_df[name] = vals
        return out_df

    from tenzir_ray.stages.exchange import grouped_apply

    return grouped_apply(ds, bycols, _resample, num_buckets=buckets,
                         tag="resample")


_FRAME_FNS = ("sum", "mean", "avg", "min", "max", "count")


def window_frame(ds, by, order_by: str, column: str, fn: str = "sum",
                 preceding: int = 0, following: int = 0,
                 out: str | None = None, buckets: int | None = None):
    """Per-group moving-frame aggregate: SQL's ``fn(column) OVER
    (PARTITION BY by ORDER BY order_by ROWS BETWEEN p PRECEDING AND f
    FOLLOWING)``. ``fn`` ∈ sum | mean | min | max | count (count skips
    nulls like SQL's count(col)); frames clip at partition edges.

    Fully vectorized decomposition: the frame splits into a trailing
    part (rows i-p..i — one C rolling pass) and a leading part (rows
    i..i+f — one rolling pass over the group REVERSED); sum/count
    combine additively minus the double-counted current row, min/max
    combine idempotently. No per-group Python, no per-row loops — the
    same grouped-exchange shape as :func:`window_shift`."""
    if fn not in _FRAME_FNS:
        raise ValueError(f"fn must be one of {_FRAME_FNS}, got {fn!r}")
    if preceding < 0 or following < 0:
        raise ValueError("preceding/following must be >= 0")
    name = out or f"{column}_{fn}_p{preceding}f{following}"
    bycols = [by] if isinstance(by, str) else list(by)

    def _frame(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df[name] = pd.Series([], dtype="float64")
            return df
        df = df.sort_values(bycols + [order_by],
                            kind="mergesort").reset_index(drop=True)
        gb = df.groupby(bycols, sort=False, dropna=False)[column]

        def _roll(series_gb, window, agg):
            # grouped rolling returns a (group_keys..., row_pos)
            # MultiIndex; drop the key levels and realign by position
            r = series_gb.rolling(window=window, min_periods=1).agg(agg)
            if r.index.nlevels > 1:
                r = r.droplevel(list(range(r.index.nlevels - 1)))
            return r.sort_index().to_numpy(dtype=np.float64)

        x = df[column].to_numpy(dtype=np.float64, na_value=np.nan)
        xvalid = (~np.isnan(x)).astype(np.float64)
        need_counts = fn in ("sum", "mean", "avg", "count")

        # trailing part: rows (i-p .. i)
        a_sum = _roll(gb, preceding + 1, "sum") if need_counts else None
        a_cnt = _roll(gb, preceding + 1, "count") if need_counts else None
        a_min = _roll(gb, preceding + 1, "min") if fn == "min" else None
        a_max = _roll(gb, preceding + 1, "max") if fn == "max" else None

        if following > 0:
            # leading part: reverse each group, trailing window covers
            # (i .. i+f) of the original order, then un-reverse
            rev = df.iloc[::-1]
            gbr = rev.groupby(bycols, sort=False, dropna=False)[column]

            def _rroll(agg):
                return _roll(gbr, following + 1, agg)

            b_sum = _rroll("sum") if need_counts else None
            b_cnt = _rroll("count") if need_counts else None
            b_min = _rroll("min") if fn == "min" else None
            b_max = _rroll("max") if fn == "max" else None
        else:
            b_sum = b_cnt = b_min = b_max = None

        if fn in ("sum", "mean", "avg", "count"):
            # a rolling sum over an all-null part is NaN — zero it and
            # let the combined COUNT decide overall nullness
            s = a_sum if b_sum is None else (
                np.nan_to_num(a_sum, nan=0.0)
                + np.nan_to_num(b_sum, nan=0.0)
                - np.nan_to_num(x, nan=0.0))
            c = a_cnt if b_cnt is None else (a_cnt + b_cnt - xvalid)
            if fn == "count":
                df[name] = c.astype(np.int64)
            elif fn == "sum":
                df[name] = np.where(c > 0, s, np.nan)
            else:
                df[name] = np.where(c > 0, s / np.maximum(c, 1), np.nan)
        elif fn == "min":
            m = a_min if b_min is None else np.fmin(a_min, b_min)
            df[name] = m
        else:
            m = a_max if b_max is None else np.fmax(a_max, b_max)
            df[name] = m
        return df

    from tenzir_ray.stages.exchange import grouped_apply

    return grouped_apply(ds, bycols, _frame, num_buckets=buckets,
                         tag="wframe")


def _merge_insertion(g, k, q, side: str):
    """Per-group insertion indices of sorted queries into sorted data.

    ``(g, k)`` is the data — group ids and keys, lexicographically
    sorted. ``q`` are one query key per data row (same group, also
    sorted within each group because they are a monotone shift of
    ``k``). Returns, for each query i, the number of data rows in ANY
    group that sort before it under (group, key) order — which, because
    groups are contiguous, IS the global frame-bound index. One
    O(n log n) lexsort over the merged 2n elements; no per-group Python
    (the vectorized replacement for a per-group ``np.searchsorted``
    loop)."""
    m = len(k)
    vals = np.concatenate([k, q])
    gg = np.concatenate([g, g])
    # tie-break flag: side='left' sorts a query BEFORE equal data keys
    # (first index with key >= q), side='right' AFTER (past the last
    # key <= q) — exactly np.searchsorted's side semantics.
    if side == "left":
        flag = np.concatenate([np.ones(m, np.int8), np.zeros(m, np.int8)])
    else:
        flag = np.concatenate([np.zeros(m, np.int8), np.ones(m, np.int8)])
    order = np.lexsort((flag, vals, gg))
    isdata = order < m
    cnt = np.cumsum(isdata)  # data elements at-or-before each slot
    res = np.empty(m, np.int64)
    qslots = ~isdata
    res[order[qslots] - m] = cnt[qslots]
    return res


def window_range(ds, by, order_by: str, column: str, fn: str = "sum",
                 preceding="0s", following="0s",
                 out: str | None = None, buckets: int | None = None):
    """Per-group RANGE-frame aggregate: SQL's ``fn(column) OVER
    (PARTITION BY by ORDER BY order_by RANGE BETWEEN p PRECEDING AND f
    FOLLOWING)`` — the frame is every row whose ORDER KEY lies in
    ``[key - p, key + f]`` (inclusive, so boundary PEERS are in),
    unlike :func:`window_frame`'s row-counted frames. ``order_by`` must
    be a timestamp (offsets are duration strings: ``"1h"``) or numeric
    (offsets are numbers). ``fn`` ∈ sum | mean | min | max | count.

    NULL order keys follow SQL: they are peers of each other, so a
    null-key row's frame is exactly the group's null-key block.

    Fully vectorized: frame bounds come from ONE merged lexsort per
    task (:func:`_merge_insertion` — no per-group searchsorted loop);
    sum/mean/count read prefix sums at ``[lo, hi)``; min/max use a
    sparse table (n·log₂(max frame) floats, NaN-skipping ``np.fmin``)
    so variable-width windows stay O(1) per row. Runs over the packed
    grouped exchange (whole groups per task, parallelism 8×CPU).

    Reference analog: the reference has only wall-clock windowing
    (summarize resolution/timeout); this serves SQL-window parity for
    time-series feature pipelines."""
    if fn not in ("sum", "mean", "avg", "min", "max", "count"):
        raise ValueError(f"window_range: unsupported fn {fn!r}")
    name = out or f"{column}_{fn}_range"
    bycols = [by] if isinstance(by, str) else list(by)

    def _off(v):
        if isinstance(v, str):
            return _to_ns(v), True
        if v < 0:
            raise ValueError("window_range: offsets must be >= 0")
        return v, False

    prec, prec_time = _off(preceding)
    fol, fol_time = _off(following)

    def _range(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df[name] = pd.Series(
                [], dtype="int64" if fn == "count" else "float64")
            return df
        df = df.sort_values(bycols + [order_by], kind="mergesort",
                            na_position="last").reset_index(drop=True)
        n = len(df)
        gid = df.groupby(bycols, sort=False, dropna=False).ngroup().to_numpy()
        ok = df[order_by]
        is_time = pd.api.types.is_datetime64_any_dtype(ok)
        if is_time != (prec_time and fol_time):
            raise TypeError(
                "window_range: duration offsets need a timestamp "
                "order_by (and numeric offsets a numeric one)")
        null_key = ok.isna().to_numpy()
        if is_time:
            keys = ok.to_numpy(dtype="datetime64[ns]").view("i8")
            p_off, f_off = np.int64(prec), np.int64(fol)
        elif pd.api.types.is_integer_dtype(ok) and not null_key.any() \
                and float(prec).is_integer() and float(fol).is_integer():
            keys = ok.to_numpy(dtype=np.int64)
            p_off, f_off = np.int64(prec), np.int64(fol)
        else:
            keys = ok.to_numpy(dtype=np.float64, na_value=np.nan)
            p_off, f_off = np.float64(prec), np.float64(fol)

        starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        ends = np.append(starts[1:], n)
        valid = ~null_key
        lo = np.empty(n, np.int64)
        hi = np.empty(n, np.int64)
        if null_key.any():
            # na_position='last' puts null keys at each group's tail:
            # their frame is that tail block (null peers)
            nvalid = np.add.reduceat(valid.astype(np.int64), starts)
            vend = starts + nvalid
            lo[null_key] = vend[gid[null_key]]
            hi[null_key] = ends[gid[null_key]]
        if valid.any():
            v = np.flatnonzero(valid)
            g, k = gid[v], keys[v]
            lo[v] = _merge_insertion(g, k, k - p_off, "left")
            hi[v] = _merge_insertion(g, k, k + f_off, "right")
            if null_key.any():
                # insertion indices count VALID rows only; shift past
                # the null tails of all preceding groups
                nulls_before = np.cumsum(
                    np.r_[0, (ends - starts)
                          - np.add.reduceat(valid.astype(np.int64),
                                            starts)])[:-1]
                lo[v] += nulls_before[g]
                hi[v] += nulls_before[g]

        x = df[column].to_numpy(dtype=np.float64, na_value=np.nan)
        if fn in ("sum", "mean", "avg", "count"):
            xv = ~np.isnan(x)
            csum = np.concatenate([[0.0], np.cumsum(np.where(xv, x, 0.0))])
            ccnt = np.concatenate([[0], np.cumsum(xv.astype(np.int64))])
            s = csum[hi] - csum[lo]
            c = ccnt[hi] - ccnt[lo]
            if fn == "count":
                df[name] = c
            elif fn == "sum":
                df[name] = np.where(c > 0, s, np.nan)
            else:
                df[name] = np.where(c > 0, s / np.maximum(c, 1), np.nan)
            return df
        # min/max: sparse table, fmin/fmax skip NaN so an all-null frame
        # (possible: the frame always has >=1 ROW, but its VALUES may all
        # be null) yields NaN -> SQL NULL
        w = hi - lo
        maxw = int(w.max()) if n else 1
        K = max(0, maxw.bit_length() - 1)
        comb = np.fmin if fn == "min" else np.fmax
        ST = np.full((K + 1, n), np.nan)
        ST[0] = x
        for kk in range(1, K + 1):
            half = 1 << (kk - 1)
            span = n - (1 << kk) + 1
            if span <= 0:
                break
            ST[kk, :span] = comb(ST[kk - 1, :span], ST[kk - 1, half:half + span])
        kq = (np.frexp(w.astype(np.float64))[1] - 1).astype(np.int64)
        kq = np.maximum(kq, 0)
        off = np.left_shift(np.int64(1), kq)
        df[name] = comb(ST[kq, lo], ST[kq, np.maximum(hi - off, 0)])
        return df

    from tenzir_ray.stages.exchange import grouped_apply

    return grouped_apply(ds, bycols, _range, num_buckets=buckets,
                         tag="wrange")


ship_by_value(sys.modules[__name__])
