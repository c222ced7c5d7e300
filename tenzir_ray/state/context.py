"""Enrichment contexts — the reference's lookup/enrich subsystem
(libtenzir/include/tenzir/plugin.hpp:660-760 context framework;
builtins/contexts/lookup_table.cpp:39 robin-map lookup table;
builtins/contexts/bloom_filter.cpp + libtenzir/src/dcso_bloom_filter.cpp;
operator behavior per web/docs/operators/enrich.md).

Ray mapping: a context is a small immutable snapshot broadcast via
``ray.put`` once; ``enrich`` captures the ref and every actor fetches it
once in ``__init__`` (never re-shipped per batch). Mutable updates create
a NEW snapshot (contexts are versioned values, not shared mutable
actors — update() returns a fresh context, the functional analog of the
reference's context-update events).
"""

from __future__ import annotations

import math
import sys

import numpy as np
import pandas as pd
import pyarrow as pa

from tenzir_ray._ship import ship_by_value


class LookupTable:
    """key → record lookup table (lookup_table.cpp analog)."""

    def __init__(self, table: pa.Table, key: str):
        self.key = key
        self.table = table
        self.value_cols = [c for c in table.column_names if c != key]

    @classmethod
    def from_dataset(cls, ds, key: str) -> "LookupTable":
        """Materialize a SMALL dimension dataset into a context."""
        return cls(_materialize(ds, what="lookup-table"), key)

    def update(self, more: pa.Table) -> "LookupTable":
        """Functional update: later rows win per key."""
        merged = pa.concat_tables([self.table, more], promote_options="permissive")
        df = merged.to_pandas().drop_duplicates(subset=[self.key], keep="last")
        return LookupTable(pa.Table.from_pandas(df, preserve_index=False), self.key)


class _Enricher:
    """Actor-pool enrich stage: hash-join each batch against the broadcast
    lookup table (pandas merge — a C hash join per batch)."""

    def __init__(self, ctx_ref, field: str, prefix: str, replace: bool):
        import ray

        ctx: LookupTable = ray.get(ctx_ref)  # once per actor
        df = ctx.table.to_pandas().drop_duplicates(subset=[ctx.key], keep="last")
        # pre-rename ONCE per actor — renaming per batch copied the whole
        # dimension frame on every call (the per-batch state-setup trap
        # this actor's __init__ exists to avoid)
        self.right = df.rename(
            columns={c: (prefix + c) for c in df.columns if c != ctx.key}
        ).rename(columns={ctx.key: field})
        self.field = field
        self.replace = replace

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 and self.field not in batch.columns:
            # zero-row block that lost its schema (empty-Dataset
            # to_pandas gotcha) — emit the context's column shape so
            # downstream concat still sees the enrich columns
            return self.right.iloc[0:0]
        return batch.merge(
            self.right, on=self.field, how="inner" if self.replace else "left"
        )


def enrich(ds, context: LookupTable, field: str, prefix: str = "",
           filter_unmatched: bool = False, concurrency=(1, 4),
           batch_size: int = 8192):
    """Append context values per event (enrich.md: --field/--replace/--filter).

    ``filter_unmatched=True`` keeps only events with a context hit (the
    `--filter` flag)."""
    import ray

    ctx_ref = ray.put(context)
    return ds.map_batches(
        _Enricher,
        fn_constructor_args=(ctx_ref, field, prefix, filter_unmatched),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class BloomFilter:
    """Simple Bloom filter context (bloom_filter.cpp analog): double
    hashing h1 + i*h2 over m bits (Kirsch-Mitzenmacher, public)."""

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        m = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.m = m
        self.k = max(1, int(round(m / max(1, capacity) * math.log(2))))
        self.bits = np.zeros((m + 63) // 64, dtype=np.uint64)

    def _hashes(self, values) -> tuple[np.ndarray, np.ndarray]:
        arr = np.asarray([str(v) for v in values], dtype=object)
        h1 = pd.util.hash_array(arr).astype(np.uint64)
        h2 = pd.util.hash_array(np.char.add(arr.astype(str), "#2").astype(object)).astype(np.uint64)
        return h1, h2 | np.uint64(1)

    def add(self, values) -> None:
        h1, h2 = self._hashes(values)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
            # unbuffered |= — plain fancy-index |= silently drops writes
            # when two values hash into the same 64-bit word
            np.bitwise_or.at(
                self.bits, idx >> np.uint64(6), np.uint64(1) << (idx & np.uint64(63))
            )

    def contains(self, values) -> np.ndarray:
        h1, h2 = self._hashes(values)
        out = np.ones(len(h1), dtype=bool)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
            out &= (self.bits[idx >> np.uint64(6)] >> (idx & np.uint64(63))) & np.uint64(1) > 0
        return out


class _BloomFilterStage:
    def __init__(self, bloom_ref, field: str, keep_members: bool):
        import ray

        self.bloom: BloomFilter = ray.get(bloom_ref)
        self.field = field
        self.keep = keep_members

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        member = self.bloom.contains(batch.column(self.field).to_pylist())
        mask = member if self.keep else ~member
        return batch.filter(pa.array(mask))


def bloom_filter_semi_join(ds, bloom: BloomFilter, field: str,
                           anti: bool = False, concurrency=(1, 4)):
    """Semi/anti join against a broadcast Bloom filter of the key set
    (false positives possible on the semi side — standard sketch caveat)."""
    import ray

    ref = ray.put(bloom)
    return ds.map_batches(
        _BloomFilterStage,
        fn_constructor_args=(ref, field, not anti),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class SubnetTable:
    """CIDR → record lookup with longest-prefix match (the reference
    lookup-table's subnet-tree support for CIDR keys,
    builtins/contexts/lookup_table.cpp:39-60).

    Vectorized: IPv4s become uint32; for each prefix length present
    (longest first), mask the batch and probe a dict of that length's
    networks — at most 32 dict probes per batch, each over the whole
    column at C speed via numpy int ops.
    """

    def __init__(self, table: pa.Table, key: str):
        self.key = key
        self.table = table
        self.value_cols = [c for c in table.column_names if c != key]
        # nets_by_len: prefix_len -> {netbase_uint32: row_index}
        self.nets_by_len: dict[int, dict[int, int]] = {}
        for i, cidr in enumerate(table.column(key).to_pylist()):
            net, _, length = str(cidr).partition("/")
            plen = int(length) if length else 32
            base = self._ip_u32(net) & self._mask(plen)
            self.nets_by_len.setdefault(plen, {})[base] = i

    @staticmethod
    def _ip_u32(ip: str) -> int:
        a, b, c, d = (int(x) for x in ip.split("."))
        return (a << 24) | (b << 16) | (c << 8) | d

    @staticmethod
    def _mask(plen: int) -> int:
        return 0 if plen == 0 else (0xFFFFFFFF << (32 - plen)) & 0xFFFFFFFF

    def match_rows(self, ips: list) -> np.ndarray:
        """Longest-prefix row index per ip (-1 = no match).

        Malformed IPs (non-numeric parts, octets > 255, wrong part count —
        common in security log data) are treated as no-match, never an
        error. All probes are vectorized: octet parse via one split-expand,
        then at most 32 ``Series.map`` dict probes (one per prefix length
        present), each over the still-unmatched rows at C speed."""
        s = pd.Series(ips, dtype="object")
        out = np.full(len(s), -1, dtype=np.int64)
        valid = s.str.fullmatch(r"\d{1,3}(\.\d{1,3}){3}", na=False)
        if not valid.any():
            return out
        parts = s[valid].str.split(".", expand=True).astype(np.int64)
        octets_ok = (parts <= 255).all(axis=1).to_numpy()
        rows_idx = np.flatnonzero(valid.to_numpy())[octets_ok]
        p = parts.to_numpy()[octets_ok]
        if not len(p):
            return out
        u32 = (
            (p[:, 0] << 24) | (p[:, 1] << 16) | (p[:, 2] << 8) | p[:, 3]
        ).astype(np.uint64)
        res = np.full(len(u32), -1, dtype=np.int64)
        for plen in sorted(self.nets_by_len, reverse=True):  # longest first
            pend = res == -1
            if not pend.any():
                break
            masked = (u32[pend] & np.uint64(self._mask(plen))).astype(np.int64)
            hit = (
                pd.Series(masked)
                .map(self.nets_by_len[plen])
                .fillna(-1)
                .to_numpy(dtype=np.int64)
            )
            res[np.flatnonzero(pend)] = hit
        out[rows_idx] = res
        return out


class GeoTable:
    """GeoIP-style context (reference builtins/contexts/geoip.cpp reads
    MaxMind MMDB; no mmdb library or data ships in this environment, so
    the context is expressed over the equivalent PUBLIC csv form:
    ip-range rows ``(net_cidr, ...attrs)`` — exactly what MaxMind's GeoLite
    CSV exports contain). Lookup = longest-prefix CIDR match, vectorized
    via :class:`SubnetTable`; ``from_ranges`` also accepts explicit
    ``(start_ip, end_ip)`` ranges and converts them to covering CIDRs."""

    def __init__(self, table: pa.Table, key: str = "network"):
        self._subnets = SubnetTable(table, key)
        self.table = table
        self.key = key
        self.value_cols = self._subnets.value_cols

    @classmethod
    def from_ranges(cls, rows: list[dict], start: str = "start_ip",
                    end: str = "end_ip") -> "GeoTable":
        """Build from (start_ip, end_ip, attrs…) range rows by splitting
        each range into minimal covering CIDR blocks."""
        import ipaddress

        out_rows = []
        for r in rows:
            a = ipaddress.IPv4Address(r[start])
            b = ipaddress.IPv4Address(r[end])
            for net in ipaddress.summarize_address_range(a, b):
                row = {k: v for k, v in r.items() if k not in (start, end)}
                row["network"] = str(net)
                out_rows.append(row)
        return cls(pa.Table.from_pylist(out_rows), "network")

    def match_rows(self, ips: list) -> np.ndarray:
        return self._subnets.match_rows(ips)


def enrich_geo(ds, context: GeoTable, field: str, prefix: str = "geo_",
               filter_unmatched: bool = False, concurrency=(1, 4),
               batch_size: int = 8192):
    """Append geo attributes per event by longest-prefix IP match."""
    return enrich_subnet(ds, context._subnets, field, prefix=prefix,
                         filter_unmatched=filter_unmatched,
                         concurrency=concurrency, batch_size=batch_size)


class _SubnetEnricher:
    def __init__(self, ctx_ref, field: str, prefix: str, filter_unmatched: bool):
        import ray

        self.ctx: SubnetTable = ray.get(ctx_ref)
        self.field = field
        self.prefix = prefix
        self.filter_unmatched = filter_unmatched
        self.vals = self.ctx.table.to_pandas()  # once per actor

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 and self.field not in batch.columns:
            # schema-lost zero-row block (see _Enricher)
            out = self.vals.iloc[0:0].rename(
                columns={c: self.prefix + c for c in self.ctx.value_cols})
            out[self.field] = pd.Series(dtype=object)
            return out
        rows = self.ctx.match_rows(batch[self.field].tolist())
        matched = rows >= 0
        safe = np.where(matched, rows, 0)
        for c in self.ctx.value_cols:
            col = self.vals[c].to_numpy()
            taken = col[safe].astype(object)
            taken[~matched] = None
            batch[self.prefix + c] = taken
        if self.filter_unmatched:
            batch = batch.loc[matched]
        return batch


def enrich_subnet(ds, context: SubnetTable, field: str, prefix: str = "",
                  filter_unmatched: bool = False, concurrency=(1, 4),
                  batch_size: int = 8192):
    """Enrich events by longest-prefix CIDR match on an IP column."""
    import ray

    ctx_ref = ray.put(context)
    return ds.map_batches(
        _SubnetEnricher,
        fn_constructor_args=(ctx_ref, field, prefix, filter_unmatched),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def lookup_retro(lake, context, field: str,
                 columns: list[str] | None = None,
                 pushdown_limit: int = 65536, concurrency=(1, 4)):
    """Retro-lookup: apply a context snapshot against STORAGE (the
    reference ``lookup`` operator, web/docs/operators/lookup.md — a
    context update retroactively scans historical data, with the
    context's key set compiled into a catalog/scan filter).

    Here the storage is a :class:`~tenzir_ray.cdc.lake.LakeTable`:

    - :class:`LookupTable` context → the key set becomes an ``isin``
      expression pushed into ``lake.read`` (parquet row-group pruning;
      merge-on-read partitions filter right after their LWW merge), and
      surviving rows are enriched with the context's value columns.
      Contexts larger than ``pushdown_limit`` keys skip the expression
      (a multi-MB isin list slows the scanner down more than it prunes)
      and filter via the enrich join instead.
    - :class:`BloomFilter` context → membership mask inside
      ``map_batches`` (no exact pushdown exists for a sketch).
    - :class:`SubnetTable` context → subnet longest-prefix enrich with
      unmatched rows dropped.

    Returns the matching rows as a streaming Dataset — snapshot
    semantics: the context is captured (``ray.put``) at call time."""
    if isinstance(context, LookupTable):
        flt = None
        n_keys = context.table.num_rows
        if 0 < n_keys <= pushdown_limit:
            import pyarrow.dataset as pads

            keys = context.table.column(context.key)
            flt = pads.field(field).isin(
                keys.combine_chunks()
                if isinstance(keys, pa.ChunkedArray) else keys
            )
        ds = lake.read(columns=columns, filter=flt)
        return enrich(ds, context, field, filter_unmatched=True,
                      concurrency=concurrency)
    if isinstance(context, BloomFilter):
        return bloom_filter_semi_join(lake.read(columns=columns), context,
                                      field, concurrency=concurrency)
    if isinstance(context, SubnetTable):
        return enrich_subnet(lake.read(columns=columns), context, field,
                             filter_unmatched=True, concurrency=concurrency)
    raise TypeError(f"unsupported context type {type(context).__name__}")


# ---------------------------------------------------------------------------
# named contexts — the reference's `context` plugin surface
# ---------------------------------------------------------------------------

#: name → context instance (the reference's context plugin state:
#: `context create <name> <type>` / `context update` / `context delete`
#: + `enrich <name>`, plugins/context). Driver-scope registry, like
#: pipelines.NAMED_PIPELINES.
CONTEXTS: dict[str, object] = {}

_KINDS = ("lookup-table", "bloom-filter", "subnet-table", "geo-table")


def _materialize(ds, what: str = "context") -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    if not tables:
        raise ValueError(
            f"{what}: input dataset is empty (zero blocks) — a context "
            "needs at least one schema-carrying batch"
        )
    return pa.concat_tables(tables, promote_options="permissive")


def create_context(name: str, kind: str, table=None, ds=None,
                   key: str | None = None, capacity: int = 100_000,
                   fp_rate: float = 0.01):
    """``context create <name> <type>``: build and register a named
    context. Table-backed kinds take ``table`` (pa.Table) or ``ds`` (a
    SMALL dimension Dataset, materialized here) plus ``key``; a
    bloom-filter takes ``capacity``/``fp_rate`` and optionally seeds
    from ``table[key]``."""
    kind = kind.replace("_", "-")
    if kind not in _KINDS:
        raise ValueError(f"unknown context type {kind!r} (have {_KINDS})")
    if table is None and ds is not None:
        table = _materialize(ds)
    if kind == "bloom-filter":
        ctx = BloomFilter(capacity, fp_rate)
        if table is not None:
            if key is None:
                raise ValueError("bloom-filter seeding needs key=")
            ctx.add(table.column(key).to_pylist())
    else:
        if table is None or key is None and kind != "geo-table":
            raise ValueError(f"{kind} needs table/ds and key=")
        if kind == "lookup-table":
            ctx = LookupTable(table, key)
        elif kind == "subnet-table":
            ctx = SubnetTable(table, key)
        else:
            ctx = GeoTable(table, key or "network")
    CONTEXTS[name] = ctx
    return ctx


def update_context(name: str, table=None, ds=None, key: str | None = None):
    """``context update <name>``: merge new rows into the named context
    (lookup-table: last-writer-wins per key; bloom: add members;
    subnet/geo: rebuild over the union — their probe dicts are
    construction-time state)."""
    ctx = CONTEXTS[name]
    if table is None and ds is not None:
        table = _materialize(ds)
    if table is None:
        raise ValueError("context update needs table= or ds=")
    if isinstance(ctx, LookupTable):
        CONTEXTS[name] = ctx.update(table)
    elif isinstance(ctx, BloomFilter):
        if key is None:
            raise ValueError("bloom-filter update needs key=")
        ctx.add(table.column(key).to_pylist())
    elif isinstance(ctx, GeoTable):
        merged = pa.concat_tables([ctx.table, table],
                                  promote_options="permissive")
        CONTEXTS[name] = GeoTable(merged, ctx.key)
    elif isinstance(ctx, SubnetTable):
        merged = pa.concat_tables([ctx.table, table],
                                  promote_options="permissive")
        CONTEXTS[name] = SubnetTable(merged, ctx.key)
    else:
        raise TypeError(f"unsupported context type {type(ctx).__name__}")
    return CONTEXTS[name]


def delete_context(name: str) -> None:
    CONTEXTS.pop(name, None)


def get_context(name: str):
    if name not in CONTEXTS:
        raise KeyError(f"unknown context {name!r} "
                       f"(have {sorted(CONTEXTS)})")
    return CONTEXTS[name]


def list_contexts() -> dict[str, str]:
    kindname = {LookupTable: "lookup-table", BloomFilter: "bloom-filter",
                SubnetTable: "subnet-table", GeoTable: "geo-table"}
    return {n: kindname.get(type(c), type(c).__name__)
            for n, c in sorted(CONTEXTS.items())}


def enrich_named(ds, context, field: str, prefix: str = "",
                 filter_unmatched: bool = False, anti: bool = False,
                 concurrency=(1, 4)):
    """``enrich <context> --field f``: dispatch on the context's kind —
    lookup-table broadcast join, subnet/geo longest-prefix enrich,
    bloom semi/anti filter. ``context`` is a registered name or an
    instance."""
    if isinstance(context, str):
        context = get_context(context)
    if isinstance(context, LookupTable):
        return enrich(ds, context, field, prefix=prefix,
                      filter_unmatched=filter_unmatched,
                      concurrency=concurrency)
    if isinstance(context, BloomFilter):
        return bloom_filter_semi_join(ds, context, field, anti=anti,
                                      concurrency=concurrency)
    if isinstance(context, GeoTable):
        return enrich_geo(ds, context, field,
                          prefix=prefix or "geo_",
                          filter_unmatched=filter_unmatched,
                          concurrency=concurrency)
    if isinstance(context, SubnetTable):
        return enrich_subnet(ds, context, field, prefix=prefix,
                             filter_unmatched=filter_unmatched,
                             concurrency=concurrency)
    raise TypeError(f"unsupported context type {type(context).__name__}")


ship_by_value(sys.modules[__name__])
