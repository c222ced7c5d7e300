"""Stream-shaped stateful operators.

Ray Data is a batch engine with unordered blocks; the reference's
stream operators (deduplicate with copy limits / distance / timeout,
adjacent-`unique`) assume a totally ordered event stream. We provide
them as actor stages with EXPLICIT ordering contracts:

- ordered mode (``concurrency=1`` + ``preserve_order``): exact reference
  semantics over the stream order;
- sharded mode (pool > 1): per-key-shard ordering only — each key's
  events are processed by one actor in arrival order per shard, the
  cross-shard interleaving is arbitrary (the distributed relaxation;
  ordering caveat follows the reference's explicit event_order tracking,
  libtenzir/include/tenzir/pipeline.hpp:151).

Reference: builtins/operators/deduplicate.cpp:102-185 (per-key emit at
most `limit` copies; forget a key after `distance` intervening events or
`timeout` idle), builtins/operators/unique.cpp (adjacent duplicates).
"""

from __future__ import annotations

import sys
import time
from collections import OrderedDict

import numpy as np
import pandas as pd
import pyarrow as pa

from tenzir_ray._ship import ship_by_value


class StreamingDeduplicate:
    """Per-key copy-limited dedup with distance/timeout forgetting.

    State per actor: key → (copies_emitted, last_seen_event_no,
    last_seen_wallclock). Keys expire after ``distance`` intervening
    events or ``timeout`` seconds idle (reference deduplicate.cpp flags
    --limit/--distance/--timeout).
    """

    def __init__(self, by: list[str], limit: int = 1,
                 distance: int | None = None, timeout_s: float | None = None):
        self.by = by
        self.limit = limit
        self.distance = distance
        self.timeout_s = timeout_s
        self.state: OrderedDict[tuple, list] = OrderedDict()
        self.event_no = 0

    def _expire(self) -> None:
        now = time.monotonic()
        drop = [
            k
            for k, (_, ev, ts) in self.state.items()
            if (self.distance is not None and self.event_no - ev > self.distance)
            or (self.timeout_s is not None and now - ts > self.timeout_s)
        ]
        for k in drop:
            del self.state[k]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        keep = np.zeros(len(batch), dtype=bool)
        keys = list(zip(*(batch[c] for c in self.by))) if len(batch) else []
        now = time.monotonic()
        for i, key in enumerate(keys):
            self.event_no += 1
            ent = self.state.get(key)
            if ent is None:
                self.state[key] = [1, self.event_no, now]
                keep[i] = True
            else:
                if (
                    (self.distance is not None and self.event_no - ent[1] > self.distance)
                    or (self.timeout_s is not None and now - ent[2] > self.timeout_s)
                ):
                    ent[0] = 0  # forgotten → key is fresh again
                ent[1], ent[2] = self.event_no, now
                if ent[0] < self.limit:
                    ent[0] += 1
                    keep[i] = True
        if self.distance is not None or self.timeout_s is not None:
            self._expire()
        return batch.loc[keep]


def streaming_deduplicate(ds, by: list[str], limit: int = 1,
                          distance: int | None = None,
                          timeout_s: float | None = None,
                          concurrency: int = 1, batch_size: int = 8192,
                          ordered: bool = False):
    """Apply streaming dedup. concurrency=1 → exact stream semantics
    (single actor sees every event); >1 relaxes to per-actor state.

    ``ordered=True`` executes eagerly under a scoped ``preserve_order``
    so the single actor consumes blocks in dataset order (sort upstream
    for a deterministic stream) — the same discipline as
    :func:`adjacent_unique`."""
    def _build(d):
        return d.map_batches(
            StreamingDeduplicate,
            fn_constructor_args=(by, limit, distance, timeout_s),
            batch_format="pandas",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    if not ordered:
        return _build(ds)
    from ray.data import DataContext

    opts = DataContext.get_current().execution_options
    prev = opts.preserve_order
    opts.preserve_order = True
    try:
        return _build(ds).materialize()
    finally:
        opts.preserve_order = prev


class AdjacentUnique:
    """Suppress adjacent duplicate rows across batch boundaries
    (reference unique.cpp — stream semantics; concurrency must be 1)."""

    def __init__(self, by: list[str] | None = None):
        self.by = by
        self.last_key: tuple | None = None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch
        cols = self.by or list(batch.columns)
        # vectorized adjacent-dup mask: row equals previous row on cols
        as_str = batch[cols].astype(str)
        eq_prev = (as_str == as_str.shift(1)).all(axis=1)
        keep = ~eq_prev.to_numpy()
        first_key = tuple(batch.iloc[0][cols].astype(str))
        if self.last_key is not None and first_key == self.last_key:
            keep[0] = False
        self.last_key = tuple(batch.iloc[-1][cols].astype(str))
        return batch.loc[keep]


def adjacent_unique(ds, by: list[str] | None = None, batch_size: int = 8192):
    """Adjacent-duplicate suppression (single ordered actor).

    Stream-order semantics need ordered execution, so this op executes
    EAGERLY under a scoped ``preserve_order`` (set → materialize →
    restore) — a global flag left set would silently reorder every
    subsequent Dataset in the session. The op is inherently serial
    (one actor sees the whole stream), so eagerness costs nothing extra.
    """
    from ray.data import DataContext

    opts = DataContext.get_current().execution_options
    prev = opts.preserve_order
    opts.preserve_order = True
    try:
        return ds.map_batches(
            AdjacentUnique,
            fn_constructor_args=(by,),
            batch_format="pandas",
            batch_size=batch_size,
            concurrency=1,
        ).materialize()
    finally:
        opts.preserve_order = prev


class StreamingSummarize:
    """Streaming grouped aggregation with created/update-timeout bucket
    flush (reference summarize.cpp:548-580,823-830: buckets emit when
    older than the created timeout or idle past the update timeout;
    everything else emits at end of input).

    Stream-shaped: feed batches in order via :meth:`feed` (returns any
    flushed buckets), then :meth:`flush` at end of input. Aggregates are
    the combiner family (sum/count/min/max/mean/any/all) — each batch is
    pre-reduced with ONE vectorized pandas groupby, then merged into the
    per-key state dict (Python work ∝ distinct keys per batch, not
    rows). ``clock`` is injectable for tests.
    """

    _MERGE = {
        "sum": lambda a, b: a + b,
        "count": lambda a, b: a + b,
        "min": min,
        "max": max,
        "any": lambda a, b: bool(a or b),
        "all": lambda a, b: bool(a and b),
    }

    def __init__(self, by: str | list[str], aggs: dict[str, str],
                 created_timeout_s: float | None = None,
                 update_timeout_s: float | None = None,
                 clock=None):
        import re as _re

        self.keys = [by] if isinstance(by, str) else list(by)
        self.created_timeout_s = created_timeout_s
        self.update_timeout_s = update_timeout_s
        self.clock = clock or time.monotonic
        self.parsed: list[tuple[str, str, str]] = []  # (alias, fn, col)
        spec_re = _re.compile(r"^\s*(\w+)\s*\(\s*([\w.*]*)\s*\)\s*$")
        for alias, spec in aggs.items():
            m = spec_re.match(spec)
            if not m:
                raise ValueError(f"bad aggregate spec {spec!r}")
            fn, col = m.group(1).lower(), m.group(2)
            if fn in ("mean", "avg"):
                fn = "mean"
            elif fn == "count":
                pass
            elif fn not in self._MERGE:
                raise ValueError(
                    f"{fn} not supported by StreamingSummarize "
                    "(combiner family only)"
                )
            self.parsed.append((alias, fn, col))
        # key tuple -> {"vals": {alias or alias partials: value},
        #               "created": t, "updated": t}
        self.state: dict[tuple, dict] = {}

    def _partial_frame(self, df: pd.DataFrame) -> pd.DataFrame:
        named = {}
        for alias, fn, col in self.parsed:
            if fn == "count":
                named[f"{alias}"] = pd.NamedAgg(
                    column=self.keys[0] if col in ("", "*", ".") else col,
                    aggfunc="size" if col in ("", "*", ".") else "count",
                )
            elif fn == "mean":
                named[f"{alias}__s"] = pd.NamedAgg(column=col, aggfunc="sum")
                named[f"{alias}__c"] = pd.NamedAgg(column=col, aggfunc="count")
            elif fn == "any":
                named[alias] = pd.NamedAgg(column=col, aggfunc="max")
            elif fn == "all":
                named[alias] = pd.NamedAgg(column=col, aggfunc="min")
            else:
                named[alias] = pd.NamedAgg(column=col, aggfunc=fn)
        return df.groupby(
            self.keys, as_index=False, sort=False, dropna=False
        ).agg(**named)

    @staticmethod
    def _norm_key(key: tuple) -> tuple:
        # NaN != NaN, so NaN-keyed state entries would never merge across
        # batches — normalize every null flavor to None for the dict key
        return tuple(None if pd.isna(v) else v for v in key)

    def feed(self, batch: pd.DataFrame) -> pd.DataFrame:
        now = self.clock()
        if len(batch):
            partials = self._partial_frame(batch)
            val_cols = [c for c in partials.columns if c not in self.keys]
            keys_arr = [
                self._norm_key(k)
                for k in zip(*(partials[k] for k in self.keys))
            ]
            for i, key in enumerate(keys_arr):
                row = {c: partials[c].iloc[i] for c in val_cols}
                ent = self.state.get(key)
                if ent is None:
                    self.state[key] = {"vals": row, "created": now, "updated": now}
                else:
                    vals = ent["vals"]
                    for alias, fn, _col in self.parsed:
                        if fn == "count":
                            vals[alias] += row[alias]
                        elif fn == "mean":
                            vals[f"{alias}__s"] += row[f"{alias}__s"]
                            vals[f"{alias}__c"] += row[f"{alias}__c"]
                        else:
                            vals[alias] = self._MERGE[fn](vals[alias], row[alias])
                    ent["updated"] = now
        return self._expire(now)

    def _emit(self, keys: list[tuple]) -> pd.DataFrame:
        rows = []
        for key in keys:
            ent = self.state.pop(key)
            row = dict(zip(self.keys, key))
            for alias, fn, _col in self.parsed:
                if fn == "mean":
                    c = ent["vals"][f"{alias}__c"]
                    row[alias] = ent["vals"][f"{alias}__s"] / c if c else None
                else:
                    row[alias] = ent["vals"][alias]
            rows.append(row)
        cols = self.keys + [a for a, _f, _c in self.parsed]
        return pd.DataFrame(rows, columns=cols)

    def _expire(self, now: float) -> pd.DataFrame:
        due = [
            k
            for k, ent in self.state.items()
            if (
                self.created_timeout_s is not None
                and now - ent["created"] >= self.created_timeout_s
            )
            or (
                self.update_timeout_s is not None
                and now - ent["updated"] >= self.update_timeout_s
            )
        ]
        return self._emit(due)

    def flush(self) -> pd.DataFrame:
        """End-of-input: emit every remaining bucket."""
        return self._emit(list(self.state))


def streaming_summarize(ds, by: str | list[str],
                        created_timeout_s: float | None = None,
                        update_timeout_s: float | None = None,
                        batch_size: int = 8192, clock=None, **aggs: str):
    """Ordered driver-side consumer for :class:`StreamingSummarize`
    (stream semantics are inherently serial, like the reference's
    one-actor summarize; for parallel batch aggregation use
    ``summarize``). The batch-equivalent result — feed everything, then
    flush — equals a plain groupby, which is the oracle gate."""
    agg = StreamingSummarize(by, aggs, created_timeout_s, update_timeout_s, clock)
    outs = []
    for df in ds.iter_batches(batch_size=batch_size, batch_format="pandas"):
        out = agg.feed(df)
        if len(out):
            outs.append(out)
    outs.append(agg.flush())
    return pa.Table.from_pandas(
        pd.concat(outs, ignore_index=True), preserve_index=False
    )


_NO_WM = np.iinfo(np.int64).min


class EventTimeWatermark:
    """Event-time watermark over an ordered stream (late-event drop/tag).

    Beyond the reference: its stream operators know only wall-clock
    timeouts (summarize.cpp:548-580, deduplicate.cpp timeouts); this adds
    event-time semantics. The watermark ahead of row *i* is
    ``max(ts of rows 0..i-1) - allowed_lateness``; a row is LATE when its
    ``ts`` is strictly behind that watermark at arrival. ``mode="drop"``
    removes late rows, ``mode="tag"`` appends a boolean ``late`` column.
    Null timestamps are late whenever a watermark exists and never
    advance it.

    Vectorized: one shifted running max per batch plus a single carried
    scalar — no per-row Python. Stream semantics are inherently serial
    (single actor, ordered blocks), like the rest of this module.
    """

    def __init__(self, ts_column: str, lateness_s: float, mode: str = "drop"):
        if mode not in ("drop", "tag"):
            raise ValueError(f"mode must be drop|tag, got {mode!r}")
        self.ts = ts_column
        self.lateness_ns = int(lateness_s * 1e9)
        self.mode = mode
        self.max_ns = _NO_WM  # max event ts seen so far (int64 ns)

    def _late_mask(self, df: pd.DataFrame, ends_ns: np.ndarray | None = None,
                   inclusive: bool = False):
        """Boolean late mask for a batch; advances the carried max.

        ``ends_ns`` overrides the per-row comparison point (used by the
        windowed variant: a row is late when its WINDOW END has already
        been passed by the watermark, not its own ts). ``inclusive``
        makes equality late — the windowed variant needs it so the mask
        agrees exactly with its ``end <= wm`` emission rule.
        """
        isnat = pd.isna(df[self.ts]).to_numpy()
        # parquet timestamps surface as datetime64[us] in pandas>=2 —
        # force ns so the int64 view matches lateness_ns units
        ts = (
            pd.to_datetime(df[self.ts])
            .astype("datetime64[ns]")
            .astype("int64")
            .to_numpy()
            .copy()
        )
        ts[isnat] = _NO_WM
        run = np.maximum.accumulate(np.maximum(ts, self.max_ns))
        prior = np.empty_like(run)
        prior[0] = self.max_ns
        prior[1:] = run[:-1]
        has_wm = prior != _NO_WM
        cmp = ts if ends_ns is None else ends_ns
        # prior - lateness underflows where has_wm is False; the mask
        # discards those lanes, so the wrap is harmless
        wm = prior - self.lateness_ns
        late = has_wm & ((cmp <= wm) if inclusive else (cmp < wm))
        late[isnat] = has_wm[isnat]
        self.max_ns = int(run[-1])
        return late

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            if self.mode == "tag":  # stable schema for empty blocks
                df = df.copy()
                df["late"] = pd.Series([], dtype=bool)
            return df
        late = self._late_mask(df)
        if self.mode == "tag":
            out = df.copy()
            out["late"] = late
            return out
        return df[~late]


def watermark(ds, ts_column: str, lateness_s: float, mode: str = "drop",
              batch_size: int = 8192, ordered: bool = True):
    """Ordered single-actor watermark stage (see
    :class:`EventTimeWatermark`). Sort upstream for a deterministic
    stream; the SQL twin is a shifted running ``max(ts)`` window.

    SERIAL BY CONTRACT: one global watermark means one actor with
    ``preserve_order`` — this is a parity op matching the reference's
    one-thread-per-operator streams, NOT a 100 TB batch path. At scale
    use :func:`watermark_by` (per-key watermarks sharded across the
    grouped exchange — embarrassingly parallel) or the batch window
    family (``stages/window.py``), which express the same lateness
    semantics without a serial stage."""
    def _build(d):
        return d.map_batches(
            EventTimeWatermark,
            fn_constructor_args=(ts_column, lateness_s, mode),
            batch_format="pandas",
            batch_size=batch_size,
            concurrency=1,
        )

    if not ordered:
        return _build(ds)
    from ray.data import DataContext

    opts = DataContext.get_current().execution_options
    prev = opts.preserve_order
    opts.preserve_order = True
    try:
        return _build(ds).materialize()
    finally:
        opts.preserve_order = prev


class WatermarkSummarize:
    """Tumbling event-time windows finalized by the watermark.

    A window ``[start, start+size)`` becomes FINAL once the watermark
    (``max prior ts - lateness``) reaches its end: it is emitted and any
    row for it arriving later is dropped as late (counted in
    ``late_dropped``). Remaining open windows emit at :meth:`flush`.
    Because finalized windows can never receive rows again, the combined
    output equals a plain groupby over the non-late rows — which is the
    SQL oracle form (shifted running-max window + filter + GROUP BY).

    Aggregates are the combiner family of :class:`StreamingSummarize`
    (whose partial/merge machinery this reuses); per-batch work is one
    vectorized pandas groupby ∝ distinct (window, key) pairs.
    """

    def __init__(self, ts_column: str, size_s: float,
                 aggs: dict[str, str], by: str | list[str] | None = None,
                 lateness_s: float = 0.0):
        self.wm = EventTimeWatermark(ts_column, lateness_s)
        self.size_ns = int(size_s * 1e9)
        keys = ([by] if isinstance(by, str) else list(by or []))
        self.inner = StreamingSummarize(["window_start", *keys], aggs)
        self.emitted: set[tuple] = set()
        self.late_dropped = 0

    def feed(self, df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        isnat = pd.isna(df[self.wm.ts]).to_numpy()
        ts = (
            pd.to_datetime(df[self.wm.ts])
            .astype("datetime64[ns]")
            .astype("int64")
            .to_numpy()
        )
        starts = (ts // self.size_ns) * self.size_ns
        ends = starts + self.size_ns
        late = self.wm._late_mask(df, ends_ns=ends, inclusive=True)
        late = late | isnat  # no event time → no window
        self.late_dropped += int(late.sum())
        kept = df[~late].copy()
        kept["window_start"] = pd.to_datetime(starts[~late])
        self.inner.feed(kept)
        # emit windows the new watermark has passed
        wm_ns = self.wm.max_ns - self.wm.lateness_ns
        due = [
            k for k in self.inner.state
            if k[0] is not None and k[0].value + self.size_ns <= wm_ns
        ]
        self.emitted.update(due)
        return self.inner._emit(due)

    def flush(self) -> pd.DataFrame:
        return self.inner._emit(list(self.inner.state))


def watermark_by(ds, ts_column: str, lateness_s: float,
                 by: "str | list[str]", order_by: str,
                 mode: str = "drop", **kw):
    """PER-KEY event-time watermark, sharded across the grouped
    exchange — the scale path the serial :func:`watermark` docstring
    points at. Each key maintains its own watermark (running
    ``max(prior ts) − lateness`` in ``order_by`` arrival order); keys
    process in parallel across exchange tasks, so no serial stage and
    no global order requirement. ``order_by`` names the arrival-order
    column (an lsn / ingest sequence) — in a batch dataset it IS the
    stream order, made explicit so the op is partitioning-independent.

    ``mode="drop"`` removes late rows; ``mode="tag"`` adds a bool
    ``late`` column. Per-task work is one vectorized sort + grouped
    cummax — no per-row Python."""
    import numpy as np
    import pandas as pd

    from tenzir_ray.stages.exchange import grouped_apply

    if mode not in ("drop", "tag"):
        raise ValueError(f"watermark_by: unknown mode {mode!r}")
    keys = [by] if isinstance(by, str) else list(by)
    lateness_ns = int(lateness_s * 1e9)

    def _wm(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = df.copy()
            if mode == "tag":
                out["late"] = pd.Series([], dtype=bool)
            return out
        df = df.sort_values([*keys, order_by], kind="mergesort",
                            ignore_index=True)
        isnat = pd.isna(df[ts_column]).to_numpy()
        ts = (pd.to_datetime(df[ts_column]).astype("datetime64[ns]")
              .astype("int64").to_numpy().copy())
        # NaT rows never ADVANCE a watermark (sentinel = no-watermark,
        # same contract as EventTimeWatermark._late_mask); everything
        # stays int64 — a float shift would cost ~256 ns of precision
        # at 2026-epoch magnitudes and break the strict-< boundary
        ts[isnat] = _NO_WM
        gid = (df.groupby(keys, dropna=False, sort=False).ngroup()
               .to_numpy())
        # per-key running max of PRIOR ts: cython grouped cummax, then
        # an int64 shift-by-one with the sentinel at each group start
        cm = pd.Series(ts).groupby(gid).cummax().to_numpy()
        prior = np.empty_like(cm)
        prior[0] = _NO_WM
        prior[1:] = cm[:-1]
        prior[np.r_[True, gid[1:] != gid[:-1]]] = _NO_WM
        has_wm = prior != _NO_WM
        # prior - lateness underflows where has_wm is False; the mask
        # discards those lanes, so the wrap is harmless
        late = has_wm & (ts < prior - lateness_ns)
        late[isnat] = has_wm[isnat]
        if mode == "tag":
            df["late"] = late
            return df
        return df[~late]

    return grouped_apply(ds, keys, _wm, **kw)


def watermark_summarize(ds, ts_column: str, size_s: float,
                        by: str | list[str] | None = None,
                        lateness_s: float = 0.0,
                        batch_size: int = 8192, **aggs: str):
    """Ordered driver-side consumer for :class:`WatermarkSummarize`
    (serial stream semantics, like :func:`streaming_summarize` — a
    parity op; for the 100 TB path shard per key with
    :func:`watermark_by` + the batch window family in
    ``stages/window.py``)."""
    agg = WatermarkSummarize(ts_column, size_s, aggs, by, lateness_s)
    outs = []
    # arrival order defines which rows are late — iterate in dataset order
    from ray.data import DataContext

    opts = DataContext.get_current().execution_options
    prev = opts.preserve_order
    opts.preserve_order = True
    try:
        for df in ds.iter_batches(batch_size=batch_size, batch_format="pandas"):
            out = agg.feed(df)
            if len(out):
                outs.append(out)
    finally:
        opts.preserve_order = prev
    outs.append(agg.flush())
    # keep dtypes (empty frames degrade datetime64 keys to object)
    non_empty = [o for o in outs if len(o)] or outs[-1:]
    return pa.Table.from_pandas(
        pd.concat(non_empty, ignore_index=True), preserve_index=False
    )


class Measure:
    """Replace data with per-batch count/byte metrics (reference
    measure.cpp:163)."""

    def __init__(self):
        self.t0 = time.monotonic()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "events": pa.array([batch.num_rows], pa.int64()),
                "bytes": pa.array([batch.nbytes], pa.int64()),
                "elapsed_s": pa.array([time.monotonic() - self.t0], pa.float64()),
            }
        )


def measure(ds, batch_size: int = 65536):
    return ds.map_batches(Measure, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=1)


ship_by_value(sys.modules[__name__])
