"""Dataset splitting + decontamination — training-data corpus ops that
run between cleaning/dedup and tokenization (engine extensions; the
reference's closest constructs are deterministic routing by expression
and the bloom-filter context).

- :func:`hash_split` — deterministic, reshuffle-free train/val/test
  assignment by key hash. The integer-key path uses the Knuth
  multiplicative hash ``(key * 2654435761) mod 2^32`` so an external
  system (or the DuckDB oracle) reproduces the exact assignment with
  plain arithmetic; string keys hash via md5's first 8 hex digits
  (also reproducible in SQL). Assignment is a pure per-row function —
  no shuffle, no state, stable across runs and cluster sizes.

- :func:`decontaminate` — drop documents that contain any benchmark /
  blocklist phrase (exact substring semantics, the reproducible core
  of eval-set decontamination). Patterns broadcast once via
  ``ray.put``; each batch runs vectorized ``match_substring`` per
  pattern, OR-folded. For huge blocklists swap the pattern scan for
  the n-gram bloom filter context (state/context.py) — same stage
  shape, documented trade: bloom gives false-positive drops, substring
  scan is exact but O(patterns) kernels per batch.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from tenzir_ray._ship import ship_by_value

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(4294967296)


def _key_fractions(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-row uniform [0,1) fraction from the key column, reproducible
    in SQL (Knuth mod-2^32 for integers, md5 hex prefix for strings)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        keys = pc.fill_null(col.cast(pa.int64()), 0).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        h = (keys * _KNUTH) % _MOD32
        return h.astype(np.float64) / float(_MOD32)
    # string keys: first 8 hex digits of md5 (SQL: substr(md5(k),1,8))
    import hashlib

    s = pd.Series(col.to_pandas(), dtype="object").fillna("")
    h = np.fromiter(
        (int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) for v in s),
        dtype=np.uint64, count=len(s),
    )
    return h.astype(np.float64) / float(_MOD32)


def hash_split(ds, key: str, fractions: dict[str, float] | None = None,
               out: str = "split"):
    """Assign every row a deterministic split label by key hash.

    ``fractions`` maps label → fraction (must sum to ~1); assignment is
    by cumulative ranges over the key's uniform hash fraction, so the
    same key ALWAYS lands in the same split — across runs, cluster
    sizes, and engines (the SQL oracle reproduces it exactly)."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    labels = list(fractions)
    edges = np.cumsum([fractions[k] for k in labels])[:-1]

    def _assign(batch: pa.Table) -> pa.Table:
        f = _key_fractions(batch.column(key))
        idx = np.searchsorted(edges, f, side="right")
        lab = pa.array(np.asarray(labels, dtype=object)[idx], pa.string())
        if out in batch.column_names:
            return batch.set_column(
                batch.schema.get_field_index(out), out, lab)
        return batch.append_column(out, lab)

    return ds.map_batches(_assign, batch_format="pyarrow")


class _Decontaminator:
    """Actor stage: patterns fetched once per actor from the object
    store; per batch one vectorized substring kernel per pattern."""

    def __init__(self, patterns_ref, column: str, invert: bool):
        import ray

        self.patterns = list(ray.get(patterns_ref))
        self.column = column
        self.invert = invert

    __name__ = "_Decontaminator"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return batch
        col = batch.column(self.column)
        hit = np.zeros(batch.num_rows, dtype=bool)
        for p in self.patterns:
            m = pc.match_substring(col, p)
            hit |= pc.fill_null(m, False).to_numpy(zero_copy_only=False)
        keep = hit if self.invert else ~hit
        return batch.filter(pa.array(keep))


def decontaminate(ds, patterns, column: str = "text",
                  invert: bool = False, concurrency=(1, 8),
                  batch_size: int = 4096):
    """Remove rows whose ``column`` contains ANY blocklist phrase
    (``invert=True`` keeps only contaminated rows — the audit view).

    ``patterns`` is a list of literal strings or a Dataset/table with a
    single string column (the benchmark phrases). The list is broadcast
    once via ``ray.put``; contamination is exact substring match."""
    import ray

    if hasattr(patterns, "to_pandas") or hasattr(patterns, "iter_batches"):
        tbl = (patterns.to_pandas() if hasattr(patterns, "to_pandas")
               and not hasattr(patterns, "iter_batches") else None)
        if tbl is None:
            import pandas as _pd

            parts = [b for b in patterns.iter_batches(
                batch_format="pandas", batch_size=8192)]
            tbl = (_pd.concat(parts, ignore_index=True)
                   if parts else _pd.DataFrame())
        if tbl.shape[1] != 1:
            raise ValueError("decontaminate: pattern table needs exactly "
                             "one string column")
        patterns = tbl.iloc[:, 0].dropna().tolist()
    patterns = [str(p) for p in patterns]
    pref = ray.put(patterns)
    return ds.map_batches(
        _Decontaminator,
        fn_constructor_args=(pref, column, invert),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def stratified_sample(ds, by, n: int, key: str,
                      buckets: int | None = None):
    """Deterministic uniform sample of ``n`` rows per group: rank each
    group's rows by the key's hash fraction (ties broken by the key)
    and keep the first ``n``. The rank is a pure function of the key,
    so the sample is stable across runs, cluster sizes, and engines —
    the SQL oracle reproduces it row-for-row (``row_number() OVER
    (PARTITION BY g ORDER BY (key * 2654435761) % 2^32, key)``).

    This is the reshuffle-stable alternative to reservoir sampling for
    stratified corpus downsampling (per-language / per-source caps):
    reservoir output depends on encounter order, which a distributed
    engine does not guarantee; hash-rank output does not.

    Scale shape: one grouped exchange on ``by`` (fine buckets, byte-
    coalesced tasks); per task a vectorized sort + groupby head. Output
    is the input columns, ≤ n rows per group."""
    bycols = [by] if isinstance(by, str) else list(by)

    def _frac(batch: pa.Table) -> pa.Table:
        f = _key_fractions(batch.column(key))
        return batch.append_column("_f", pa.array(f, pa.float64()))

    with_f = ds.map_batches(_frac, batch_format="pyarrow")

    def _take(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.drop(columns=["_f"], errors="ignore")
        df = df.sort_values(["_f", key], kind="mergesort")
        return (df.groupby(bycols, sort=False, dropna=False)
          .head(n).drop(columns=["_f"]))

    from tenzir_ray.stages.exchange import grouped_apply

    return grouped_apply(with_f, bycols, _take, num_buckets=buckets,
                         tag="strat")


def _group_counts(ds, by: str) -> pd.Series:
    """Global per-group row counts via per-batch value_counts partials
    summed on the driver — O(#groups) driver state. Null keys count as
    their own group (dropna=False end to end)."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[by].value_counts(dropna=False)
        return pd.DataFrame({by: vc.index, "_c": vc.to_numpy()})

    parts = ds.map_batches(_partial, batch_format="pandas").to_pandas()
    if not len(parts):
        return pd.Series(dtype=np.int64)
    return parts.groupby(by, sort=True, dropna=False)["_c"].sum()


def _append_fractions(ds, key: str):
    """Adds the deterministic per-row hash fraction column ``_f``."""

    def _frac(batch: pa.Table) -> pa.Table:
        f = _key_fractions(batch.column(key))
        return batch.append_column("_f", pa.array(f, pa.float64()))

    return ds.map_batches(_frac, batch_format="pyarrow")


def _group_lookup(col: pd.Series, table: dict, default=0) -> np.ndarray:
    """Vectorized dict lookup that ALSO resolves the null group:
    ``Series.map(dict)`` never matches a NaN key, so the null group's
    entry (stored under NaN by the counts index) is applied via the
    isna mask instead of silently falling to ``default``."""
    out = col.map(table).to_numpy(dtype=np.float64, na_value=np.nan)
    nan_entry = default
    for k, v in table.items():
        if isinstance(k, float) and np.isnan(k):
            nan_entry = v
            break
    isna = col.isna().to_numpy()
    out[isna] = nan_entry
    out = np.nan_to_num(out, nan=default)
    return out.astype(np.int64)


def temperature_sample(ds, by: str, key: str, total: int,
                       alpha: float = 0.5, buckets: int | None = None):
    """Temperature-based domain re-mixing (the GPT-3 / multilingual-LM
    sampling rule): keep about ``total`` rows overall, with group ``g``
    contributing ``n_g = min(c_g, floor(total * c_g**alpha / sum_h
    c_h**alpha))`` rows. ``alpha < 1`` flattens the domain distribution
    (up-weights rare sources, caps dominant ones); ``alpha = 1``
    preserves it; ``alpha = 0`` is uniform-per-group.

    Selection within a group is the same deterministic hash-rank as
    :func:`stratified_sample`, so the output is a pure function of the
    data — stable across runs, cluster sizes, partitionings, and
    engines; the SQL oracle reproduces it row-for-row.

    Scale shape: the input is materialized once (two logical passes are
    inherent — global group counts gate the per-row filter — and the
    rank-head's grouped exchange is a barrier anyway; Ray spills blocks
    as needed). The count pass is per-batch ``value_counts`` partials
    summed on the driver — O(#groups) driver state, never corpus-sized.
    The select pass is one grouped exchange + a vectorized cumcount
    filter per task.

    Caveat (documented, negligible in practice): ``n_g`` involves a
    float sum over per-group ``pow(c, alpha)`` terms whose summation
    order differs between engines; a mismatch needs the true ratio to
    sit within ~1 ulp of an integer."""
    if total < 0:
        raise ValueError("temperature_sample: total must be >= 0")
    ds = ds.materialize()

    counts = _group_counts(ds, by)
    if not len(counts):
        return ds
    w = np.power(counts.to_numpy(dtype=np.float64), float(alpha))
    s = float(w.sum())
    n_for = {
        g: min(int(c), int(np.floor(total * wi / s)))
        for g, c, wi in zip(counts.index, counts.to_numpy(), w)
    }

    with_f = _append_fractions(ds, key)

    def _take(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.drop(columns=["_f"], errors="ignore")
        df = df.sort_values(["_f", key], kind="mergesort")
        rn = df.groupby(by, sort=False, dropna=False).cumcount().to_numpy()
        lim = _group_lookup(df[by], n_for)
        return df[rn < lim].drop(columns=["_f"])

    from tenzir_ray.stages.exchange import grouped_apply

    return grouped_apply(with_f, [by], _take, num_buckets=buckets,
                         tag="tsamp")


def weighted_sample(ds, key: str, weight: str, n: int):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row draws ``u`` from the key's hash fraction
    and scores ``u ** (1/w)``; the n LARGEST scores win. Inclusion
    probability is proportional to weight, yet the outcome is a pure
    function of the data — same selection on any partitioning, cluster
    size, or engine (the SQL oracle reproduces it with ``pow``).

    Rows with null/non-positive weight never qualify (their score is 0).
    Scale shape: one stateless scoring pass with a per-batch top-n
    partial; the driver merges <= n * num_batches candidate rows —
    ``n`` is a driver-bounded result size by contract, like any top-k.

    Caveat (same class as temperature_sample's): two rows whose float
    scores agree to the last ulp could rank differently across engines;
    ties on the exact score break by key."""
    import ray

    if n < 0:
        raise ValueError("weighted_sample: n must be >= 0")

    def _score(batch: pa.Table) -> pa.Table:
        u = _key_fractions(batch.column(key))
        w = np.asarray(batch.column(weight).to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            s = np.where(np.isfinite(w) & (w > 0), u ** (1.0 / w), 0.0)
        batch = batch.append_column("_s", pa.array(s, pa.float64()))
        if batch.num_rows <= n:
            return batch
        # per-batch partial top-n (argpartition, then exact order later)
        keep = np.argpartition(s, len(s) - n)[len(s) - n:]
        return batch.take(np.sort(keep))

    parts = ds.map_batches(_score, batch_format="pyarrow")
    tbls = [t for t in ray.get(parts.to_arrow_refs())
            if t.num_rows and "_s" in t.column_names]
    if not tbls:
        return ds.limit(0)
    import ray.data

    cand = pa.concat_tables(tbls)
    df = cand.to_pandas().sort_values(
        ["_s", key], ascending=[False, True], kind="mergesort"
    ).head(n)
    return ray.data.from_arrow(
        pa.Table.from_pandas(df.drop(columns=["_s"]), preserve_index=False)
    )


def unimax_allocation(counts: dict, total: int,
                      max_epochs: int = 1) -> dict:
    """UniMax budget waterfall (Chung et al. 2023, arXiv:2304.09151,
    Algorithm 1): process groups in ascending capacity order
    (capacity = c_g * max_epochs); each takes
    ``min(capacity, floor(remaining_budget / remaining_groups))``.
    Low-resource groups saturate at their epoch cap, the freed budget
    flows to larger groups — the 'uniform up to N epochs' mixture.
    Deterministic: ties break on the group value itself, matching the
    SQL oracle's ``ORDER BY capacity, group`` (a null group sorts after
    equal-capacity groups, DuckDB's NULLS-LAST default)."""

    def _order(kv):
        g = kv[0]
        is_null = isinstance(g, float) and np.isnan(g)
        return (kv[1] * max_epochs, is_null, "" if is_null else g)

    items = sorted(counts.items(), key=_order)
    out: dict = {}
    budget = int(total)
    for i, (g, c) in enumerate(items):
        remaining_groups = len(items) - i
        share = budget // remaining_groups
        take = min(int(c) * int(max_epochs), share)
        out[g] = take
        budget -= take
    return out


def unimax_sample(ds, by: str, key: str, total: int, max_epochs: int = 1,
                  epoch_col: str = "epoch", buckets: int | None = None):
    """UniMax domain mixing WITH repetition: keep about ``total`` rows,
    allocated by :func:`unimax_allocation`; a group whose allocation
    exceeds its row count emits full extra epochs (every row repeated,
    ``epoch_col`` = 0,1,...) plus a deterministic hash-rank head for the
    remainder epoch — so low-resource domains are up-sampled up to
    ``max_epochs`` times while dominant domains are capped, the
    complement of :func:`temperature_sample`'s down-only mixing.

    Scale shape is temperature_sample's: one O(#groups) count pass
    (per-batch value_counts partials), then one grouped exchange whose
    per-task work is a vectorized rank + ``np.repeat`` — no driver data
    pass, no per-row Python."""
    if total < 0:
        raise ValueError("unimax_sample: total must be >= 0")
    if max_epochs < 1:
        raise ValueError("unimax_sample: max_epochs must be >= 1")
    ds = ds.materialize()

    counts = _group_counts(ds, by)
    if not len(counts):
        # typed empty output: same schema as every non-empty result
        # (input columns + the epoch column)
        import ray.data

        from tenzir_ray.stages.join import _dataset_arrow_schema

        sch = _dataset_arrow_schema(ds).append(
            pa.field(epoch_col, pa.int64()))
        return ray.data.from_arrow(pa.Table.from_batches([], schema=sch))
    n_for = unimax_allocation(dict(counts.items()), total, max_epochs)
    c_for = dict(counts.items())

    with_f = _append_fractions(ds, key)

    def _take(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.drop(columns=["_f"], errors="ignore").assign(
                **{epoch_col: pd.Series([], dtype=np.int64)})
        df = df.sort_values(["_f", key], kind="mergesort")
        rn = df.groupby(by, sort=False, dropna=False).cumcount().to_numpy()
        take = _group_lookup(df[by], n_for)
        size = _group_lookup(df[by], c_for, default=1)
        full = take // size
        rem = take % size
        reps = full + (rn < rem)
        df = df.drop(columns=["_f"])
        idx = np.repeat(np.arange(len(df)), reps)
        ends = np.cumsum(reps)
        epoch = np.arange(int(ends[-1]) if len(ends) else 0) - np.repeat(
            ends - reps, reps
        )
        out = df.iloc[idx].copy()
        out[epoch_col] = epoch.astype(np.int64)
        return out

    from tenzir_ray.stages.exchange import grouped_apply

    return grouped_apply(with_f, [by], _take, num_buckets=buckets,
                         tag="unimax")


def deterministic_shuffle(ds, key: str, epoch: int = 0,
                          rank: "str | None" = None,
                          batch_size: int = 16384):
    """Reproducible epoch-wise global shuffle for training-data
    pipelines: rows order by ``md5(key || ':' || epoch)`` — a new
    uniform permutation per epoch, identical across runs, cluster
    sizes and partitionings (unlike ``random_shuffle``, whose layout
    depends on block structure). SQL-reproducible:
    ``ORDER BY md5_number_lower(key || ':' || epoch)``.

    Shape: one vectorized hash column per batch + ONE distributed sort
    (the shuffle IS an all-to-all by definition). ``rank`` optionally
    materializes the 0-based global position (adds the sort-based
    enumerate pass)."""
    import pandas as pd

    from tenzir_ray.stages import transforms as _T

    suffix = f":{int(epoch)}"
    import hashlib

    def _h(df: pd.DataFrame) -> pd.DataFrame:
        # hashlib directly, NOT dsir._md5_lower: every key:epoch string
        # is unique, so the memoized path would only pollute the
        # process-global token memo without a single hit
        ks = df[key].astype(object)
        df["_shuffle_h"] = np.fromiter(
            (int.from_bytes(
                hashlib.md5((str(v) + suffix).encode()).digest()[8:],
                "little")
             for v in ks),
            dtype=np.uint64, count=len(df))
        return df

    hashed = ds.map_batches(_h, batch_format="pandas",
                            batch_size=batch_size)
    if rank is None:
        return _T.drop(hashed.sort("_shuffle_h"), ["_shuffle_h"])
    out = _T.enumerate_global(hashed, "_shuffle_h", out=rank)
    return _T.drop(out, ["_shuffle_h"])


ship_by_value(sys.modules[__name__])
