"""Event-analytics operators: histogram, funnel, retention cohorts.

The product-analytics verbs (Amplitude/Snowplow-style) a pipeline over
an event stream runs after ingest. The reference has no direct analog
(closest: ``summarize`` with ``resolution`` buckets, summarize.cpp);
these compose the engine's scale primitives so each is one exchange or
a pure combiner pass:

- :func:`histogram` — fixed-width numeric binning. Stateless bin
  assignment per batch + the combiner-decomposable summarize: no
  exchange at all beyond the tiny final merge.
- :func:`funnel` — ordered step progression per entity ("did A, then B
  after it, then C after that"), optionally within a time budget from
  step 1. One grouped exchange; per task each step is one vectorized
  masked-min pass — no per-row Python, k passes for k steps.
- :func:`retention` — cohort-by-first-activity retention counts. Two
  combiner summarizes + one broadcast-friendly hash join (first
  activity is a tiny per-entity table).
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from tenzir_ray._ship import ship_by_value


def histogram(ds, column: str, bins: int = 10,
              lo: float | None = None, hi: float | None = None):
    """Fixed-width histogram of a numeric column: returns one row per
    OCCUPIED bin — ``(bin, bin_start, n)`` with ``bin =
    floor((x - lo) / w)`` clamped to ``[0, bins-1]`` (SQL
    ``width_bucket``-style edge handling: values at/beyond ``hi`` land
    in the last bin), nulls and NaNs dropped. ``lo``/``hi`` default to
    the column min/max, which costs one extra aggregate pass — pass
    them explicitly on large data to keep it single-pass. An all-null/
    empty column yields zero rows; a constant column puts everything in
    bin 0."""
    if bins < 1:
        raise ValueError("histogram: bins must be >= 1")
    if lo is None or hi is None:
        import ray.data

        stats = ds.aggregate(ray.data.aggregate.Min(column),
                             ray.data.aggregate.Max(column))
        mn, mx = stats[f"min({column})"], stats[f"max({column})"]
        if (lo is None and mn is None) or (hi is None and mx is None):
            # all-null or empty column: no occupied bins
            return ray.data.from_arrow(pa.table({
                "bin": pa.array([], pa.int64()),
                "bin_start": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64())}))
        lo = float(mn) if lo is None else lo
        hi = float(mx) if hi is None else hi
    if hi == lo:
        hi = lo + 1.0  # constant column: one well-defined bin
    if not hi > lo:
        raise ValueError(f"histogram: need hi > lo, got [{lo}, {hi}]")
    w = (hi - lo) / bins

    def _bin(t: pa.Table) -> pa.Table:
        x = pc.cast(t.column(column), pa.float64())
        # NaN is is_valid=True, but Arrow's min/max_element_wise skip
        # NaN during clamping and would silently count it in bin 0 —
        # drop it alongside nulls instead
        valid = pc.and_kleene(pc.is_valid(x), pc.invert(pc.is_nan(x)))
        b = pc.floor(pc.divide(pc.subtract(x, lo), w))
        b = pc.min_element_wise(pc.max_element_wise(b, 0.0),
                                float(bins - 1))
        return pa.table({"bin": pc.cast(b, pa.int64()).filter(valid)})

    from tenzir_ray.stages.summarize import summarize

    out = summarize(ds.map_batches(_bin, batch_format="pyarrow"),
                    by="bin", n="count(*)")

    def _edges(t: pa.Table) -> pa.Table:
        start = pc.add(pc.multiply(pc.cast(t.column("bin"), pa.float64()),
                                   w), lo)
        return pa.table({"bin": t.column("bin"), "bin_start": start,
                         "n": t.column("n")})

    return out.map_batches(_edges, batch_format="pyarrow")


def funnel(ds, by, order_by: str, steps: list[str],
           within: str | None = None, buckets: int | None = None):
    """Ordered funnel per entity: for conversion steps given as
    expression-language predicates, compute the FIRST time each step
    completes given the previous step already had (strictly earlier
    order key), i.e. ``t1 = min(ts | step1)``, ``t2 = min(ts | step2 ∧
    ts > t1)``, … Returns one row per entity: the key columns,
    ``step_1..step_k`` completion order-keys (NULL = never reached) and
    ``steps_completed``. ``within="1h"`` additionally requires every
    later step to land within that budget of ``t1`` (the classic
    conversion-window rule).

    One grouped exchange on the entity key; per task each step is one
    vectorized masked-min over the (already sorted) rows — no per-row
    Python, k passes for k steps."""
    from tenzir_ray.expr import compile_filter
    from tenzir_ray.stages.exchange import grouped_apply

    if not steps:
        raise ValueError("funnel: need at least one step predicate")
    kcols = [by] if isinstance(by, str) else list(by)
    compiled = [compile_filter(s) for s in steps]
    win_ns = None
    if within is not None:
        from tenzir_ray.stages.window import _to_ns

        win_ns = _to_ns(within)

    def _funnel(df: pd.DataFrame) -> pd.DataFrame:
        names = [f"step_{i + 1}" for i in range(len(steps))]
        if not len(df):
            # pin the empty-input schema to the non-empty one: step
            # columns are datetime64[ns] for timestamp order keys,
            # float64 otherwise
            step_dt = ("datetime64[ns]"
                       if pd.api.types.is_datetime64_any_dtype(df[order_by])
                       else "float64")
            out = df[kcols].iloc[:0].copy()
            for nm in names:
                out[nm] = pd.Series([], dtype=step_dt)
            out["steps_completed"] = pd.Series([], dtype="int64")
            return out
        df = df.sort_values(kcols + [order_by],
                            kind="mergesort").reset_index(drop=True)
        n = len(df)
        gid = df.groupby(kcols, sort=False, dropna=False).ngroup().to_numpy()
        starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        G = len(starts)
        tbl = pa.Table.from_pandas(df, preserve_index=False)
        ok = df[order_by]
        is_time = pd.api.types.is_datetime64_any_dtype(ok)
        keys = (ok.to_numpy(dtype="datetime64[ns]").view("i8")
                if is_time else ok.to_numpy(dtype=np.float64))
        masks = [np.asarray(c.mask(tbl)) for c in compiled]

        INF = np.iinfo(np.int64).max if is_time else np.inf
        prev = np.full(G, -np.inf if not is_time else np.iinfo(np.int64).min)
        # t0 sentinel: step 1 has no predecessor constraint
        first = None
        times = []
        for mi, m in enumerate(masks):
            # candidate rows: step matches AND key strictly after the
            # entity's previous-step time (and inside the window budget)
            cand = m & ~pd.isna(ok).to_numpy()
            if mi > 0:
                cand &= keys > prev[gid]
                if win_ns is not None:
                    # budget from step 1; INF-safe (no int64 overflow on
                    # never-reached entities — they are gated off anyway)
                    budget = np.where(first == INF, INF, first + win_ns)
                    cand &= keys <= budget[gid]
            masked = np.where(cand, keys, INF)
            tmin = np.minimum.reduceat(masked, starts)
            hit = tmin != INF
            t = np.where(hit, tmin, INF)
            times.append((t, hit))
            prev = np.where(hit, t, INF)  # unreached: later steps gated off
            if mi == 0:
                first = np.where(hit, t, INF)

        out = df[kcols].iloc[starts].reset_index(drop=True)
        completed = np.zeros(G, dtype=np.int64)
        chain_alive = np.ones(G, dtype=bool)
        for nm, (t, hit) in zip(names, times):
            chain_alive &= hit
            completed += chain_alive.astype(np.int64)
            reached = chain_alive
            if is_time:
                col = pd.Series(np.where(reached, t, 0)
                                .astype("datetime64[ns]"))
                out[nm] = col.where(pd.Series(reached), pd.NaT)
            else:
                out[nm] = np.where(reached, t, np.nan)
        out["steps_completed"] = completed
        return out

    return grouped_apply(ds, kcols, _funnel, num_buckets=buckets,
                         tag="funnel")


def retention(ds, by: str, ts_col: str, period: str = "1d",
              max_periods: int | None = None):
    """Cohort retention: bucket each entity's FIRST activity into a
    cohort period, then count DISTINCT entities active ``k`` periods
    later — the ``(cohort, period_n, n)`` retention matrix (``period_n
    = 0`` is the cohort size itself).

    Scale shape: first-activity is one combiner ``min`` aggregate (tiny
    output: one row per entity), joined back over the packed exchange;
    the matrix is one ``count_distinct`` aggregate. No driver pass."""
    from tenzir_ray.stages.join import hash_join
    from tenzir_ray.stages.summarize import summarize
    from tenzir_ray.stages.window import _to_ns

    step_ns = _to_ns(period)

    def _bucket(t: pa.Table) -> pa.Table:
        # integer epoch division — float64 would lose ns precision at
        # 1e18 and mis-bucket edge timestamps
        ts = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        b = pc.divide(ts, step_ns // 1000)
        return pa.table({by: t.column(by), "_p": b})

    acts = ds.map_batches(_bucket, batch_format="pyarrow")
    first = summarize(acts, by=by, _cohort="min(_p)")
    joined = hash_join(acts, first, on=by)

    def _rel(t: pa.Table) -> pa.Table:
        rel = pc.subtract(t.column("_p"), t.column("_cohort"))
        return pa.table({by: t.column(by), "cohort": t.column("_cohort"),
                         "period_n": rel})

    rel = joined.map_batches(_rel, batch_format="pyarrow")
    if max_periods is not None:
        from tenzir_ray.stages.transforms import where

        rel = where(rel, f"period_n <= {int(max_periods)}")
    return summarize(rel, by=["cohort", "period_n"],
                     n=f"count_distinct({by})")


class _NullKey:
    """Sentinel for a null group key: NaN != NaN, so a NaN-keyed stats
    row could never be found by ``Series.map`` and null-group rows got
    null output even when the stats pass produced their row (SQL GROUP
    BY treats nulls as one group). Hashable singleton, never equal to
    real data."""

    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst


_NULLKEY = _NullKey()


def _norm_key(v):
    import pandas as pd

    try:
        return _NULLKEY if pd.isna(v) else v
    except (TypeError, ValueError):  # arrays/lists: not a null scalar
        return v


def _map_keys(st: dict, multi: bool) -> dict:
    """Stats dict with null group keys normalized to the sentinel."""
    if multi:
        return {tuple(_norm_key(x) for x in g): r for g, r in st.items()}
    return {_norm_key(g): r for g, r in st.items()}


def _batch_keys(df, keys):
    """Per-row group key Series with nulls normalized to the sentinel
    (matching :func:`_map_keys`) — still one vectorized map per batch."""
    import pandas as pd

    if len(keys) == 1:
        gk = df[keys[0]]
        if gk.isna().any():
            gk = gk.astype(object).where(gk.notna(), _NULLKEY)
        return gk
    return pd.Series(
        [tuple(_norm_key(x) for x in t)
         for t in zip(*[df[k] for k in keys])],
        index=df.index, dtype=object)


def _stats_lookup(ds, column: str, by, aggs: dict) -> "tuple":
    """(group stats as a broadcast-able dict | scalar row, group cols).
    The stats side is one shuffle-free partial-aggregate pass; its
    output is group-cardinality-sized (assumed small — the usual
    feature-scaling regime; a billion-group standardize should use a
    join instead)."""
    from tenzir_ray.stages.summarize import summarize as _sum

    res = _sum(ds, by=by, **aggs)
    if by is None:
        row = res.to_pylist()[0] if isinstance(res, pa.Table) \
            else res.iloc[0].to_dict()
        return row, None
    import pandas as pd

    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    keys = [by] if isinstance(by, str) else list(by)
    df = df.set_index(keys[0] if len(keys) == 1 else keys)
    return df.to_dict("index"), keys


def standardize(ds, column: str, by: "str | None" = None,
                out: "str | None" = None, ddof: int = 1,
                batch_size: int = 16384):
    """Z-score feature standardization: ``(x − mean) / stddev`` per
    group (``by``) or globally — the ML-prep normalization pass. Two
    passes: a shuffle-free partial-aggregate for the per-group moments,
    broadcast via ``ray.put``, then one vectorized map. Zero/undefined
    stddev (single row, constant column) → null."""
    import ray

    if ddof not in (0, 1):
        raise ValueError("ddof must be 0 or 1")
    # the engine's stddev spellings are ALL population (summarize.py
    # `_finalize_partials`); the sample correction sqrt(n/(n-1)) is
    # applied here from the same pass's count
    stats, keys = _stats_lookup(ds, column, by,
                                {"_mu": f"mean({column})",
                                 "_sd": f"stddev_pop({column})",
                                 "_n": f"count({column})"})
    out = out or f"{column}_z"
    ref = ray.put(stats)
    _ddof = ddof

    def _sd_of(rec) -> float:
        import numpy as np

        sd, n = rec.get("_sd"), rec.get("_n", 0)
        if sd in (None, 0) or n <= _ddof:
            return np.nan
        return sd * np.sqrt(n / (n - _ddof)) if _ddof else sd

    def _z(df):
        import numpy as np
        import pandas as pd

        st = ray.get(ref)
        x = df[column].to_numpy(np.float64)
        if keys is None:
            mu = st["_mu"] if st["_mu"] is not None else np.nan
            df[out] = (x - mu) / _sd_of(st)
        else:
            # per-GROUP maps built once (sd correction included), then
            # one vectorized Series.map per batch — no per-row Python;
            # null group keys ride the _NULLKEY sentinel on both sides
            st = _map_keys(st, multi=len(keys) > 1)
            mu_map = {g: (r["_mu"] if r["_mu"] is not None else np.nan)
                      for g, r in st.items()}
            sd_map = {g: _sd_of(r) for g, r in st.items()}
            gk = _batch_keys(df, keys)
            mus = gk.map(mu_map).to_numpy(np.float64)
            sds = gk.map(sd_map).to_numpy(np.float64)
            df[out] = (x - mus) / sds
        return df

    return ds.map_batches(_z, batch_format="pandas", batch_size=batch_size)


def minmax_scale(ds, column: str, by: "str | None" = None,
                 out: "str | None" = None, batch_size: int = 16384):
    """Min-max feature scaling to [0, 1] per group or globally
    (``(x − min) / (max − min)``; degenerate max==min → null). Same
    two-pass broadcast shape as :func:`standardize`."""
    import ray

    stats, keys = _stats_lookup(ds, column, by,
                                {"_lo": f"min({column})",
                                 "_hi": f"max({column})"})
    out = out or f"{column}_scaled"
    ref = ray.put(stats)

    def _s(df):
        import numpy as np
        import pandas as pd

        st = ray.get(ref)
        x = df[column].to_numpy(np.float64)
        if keys is None:
            lo = st["_lo"] if st["_lo"] is not None else np.nan
            hi = st["_hi"] if st["_hi"] is not None else np.nan
            rng = hi - lo
            df[out] = (x - lo) / rng if rng else np.nan
        else:
            st = _map_keys(st, multi=len(keys) > 1)
            lo_map = {g: (r["_lo"] if r["_lo"] is not None else np.nan)
                      for g, r in st.items()}
            hi_map = {g: (r["_hi"] if r["_hi"] is not None else np.nan)
                      for g, r in st.items()}
            gk = _batch_keys(df, keys)
            los = gk.map(lo_map).to_numpy(np.float64)
            rng = gk.map(hi_map).to_numpy(np.float64) - los
            rng[rng == 0] = np.nan
            df[out] = (x - los) / rng
        return df

    return ds.map_batches(_s, batch_format="pandas", batch_size=batch_size)


ship_by_value(sys.modules[__name__])
