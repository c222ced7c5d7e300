"""Partitioned Parquet lake table with exactly-once CDC merge-apply.

The heart of the engine (BASELINE.json north_star): change batches flow
through ``ray.data.Dataset.map_batches`` over zero-copy Arrow into a
hash-partitioned merge-apply, LSN-ordered last-writer-wins per key
``(conv_id, turn_idx)``, with schema evolution (additive columns + type
widening via :class:`SchemaRegistry`) and an idempotent two-phase commit
manifest so replays after failure converge to the identical final table.

Physical layout (reference analog: one store file per partition +
catalog, libtenzir/src/active_partition.cpp:103-187)::

    root/
      _manifest.json          # two-phase commit + lineage (manifest.py)
      _registry.json          # schema registry state
      part=<k>/epoch-<id>-<uuid>.parquet     # base file (live iff in manifest)
      part=<k>/delta-<id>-<uuid>.parquet     # delta file: LWW-reduced changes
                                             #   incl. delete tombstones (_op);
                                             #   readers merge, optimize() compacts

Dataflow per epoch (one bounded chunk of the binlog)::

    read changes (Dataset, arrival order ≠ lsn order)
      → map_batches(_FragmentWriter)       # conform to registry schema,
        #   add _part = crc32(conv_id) % P, PARTIAL LWW reduce within the
        #   batch (combiner — first line of skew defense), then write the
        #   batch split into per-partition Arrow-IPC fragments: a
        #   filesystem-mediated exchange (page cache locally, shared
        #   storage on a cluster) that keeps both sides embarrassingly
        #   parallel — measured faster than Ray's sort/push shuffles here,
        #   and retry-safe because duplicate fragments collapse under LWW
      [→ map_batches(_SaltReducer)         # optional salted sub-partition
        #   pre-reduce, one task per (part, salt) (north rule). With
        #   num_salts="auto" the gate is PER PARTITION: only partitions
        #   whose recorded volume crossed the threshold last epoch take
        #   the salted layout; cold partitions in the SAME epoch keep the
        #   packed-IPC fast path (no tiny-file overhead where the
        #   pre-reduce can't pay for itself)]
      → map_batches(_PartitionReducer)     # one task per touched
        #   partition: read its fragments, merge with the partition's live
        #   base rows, final LWW by lsn, drop deletes, sort
        #   (conv_id, turn_idx), write the new partition file, emit a
        #   1-row lineage record
      → driver collects the tiny lineage records → atomic manifest commit

Scale notes: P (num_partitions) is chosen so one partition's live rows
fit a worker's heap (e.g. 64Ki partitions at 100 TB); an epoch is a
bounded micro-batch of the log sized to the cluster's object store. Only
partitions actually touched by the epoch are read back, and a small
epoch against a large base appends DELTA files instead of rewriting
(merge-on-read) — epoch cost tracks change volume, not base size;
``optimize()`` compacts deltas back into single base files (the
reference's partition rebuild, builtins/commands/rebuild.cpp:26).
"""

from __future__ import annotations

import hashlib
import json as _json
import os
import time
import uuid
import zlib
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from tenzir_ray.cdc.manifest import (
    MANIFEST_NAME,
    REGISTRY_NAME,
    ConcurrentModificationError,
    Manifest,
)
from tenzir_ray.cdc.registry import SchemaRegistry
from tenzir_ray.stages.exchange import pack_by_partition

META_COLS = ("lsn", "op")
KEY_COLS = ("conv_id", "turn_idx")
LSN_COL = "_lsn"  # lsn column name as stored in lake files
OP_COL = "_op"    # op column as stored in DELTA files (delete tombstones)
CHANGE_TYPE_COL = "_change_type"  # preimage-feed classification column

#: auto-salt gate: a partition whose POST-COMBINE change volume exceeded
#: this many rows last epoch gets salted sub-partitioning this epoch.
#: Measured on this box (BENCH/BASELINE.md): the per-batch LWW combiner
#: absorbs Zipf-hot conversations and the extra salt exchange is pure
#: overhead until a single partition's reduce input no longer fits one
#: worker's heap — so the default threshold is set at that regime, not
#: at "skew exists". Override with $TENZIR_RAY_SALT_THRESHOLD.
SALT_THRESHOLD_ENV = "TENZIR_RAY_SALT_THRESHOLD"
DEFAULT_SALT_THRESHOLD = 16_000_000
AUTO_NUM_SALTS = 8


def _factorize(col) -> tuple[np.ndarray, list[str]]:
    """Dictionary-encode a string column in Arrow (C, no Python objects):
    returns (codes int array, unique values)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    d = arr.dictionary_encode()
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    return d.indices.to_numpy(zero_copy_only=False).astype(np.int64), d.dictionary.to_pylist()


def stable_part_of_uniques(uniq: list[str], num_partitions: int) -> np.ndarray:
    """Deterministic hash partition per unique conv_id: crc32(u) % P.
    crc32 runs only once per unique value (conversations repeat across
    turns), never per row."""
    h = np.fromiter(
        (zlib.crc32(str(u).encode()) for u in uniq), dtype=np.int64, count=len(uniq)
    )
    return (h % num_partitions).astype(np.int32)


def stable_part(conv: np.ndarray, num_partitions: int) -> np.ndarray:
    """Row-wise partition assignment (numpy-object fallback path)."""
    uniq, inv = np.unique(np.asarray(conv, dtype=object), return_inverse=True)
    return stable_part_of_uniques(list(uniq), num_partitions)[inv]


def _lww_mask(lsn: np.ndarray, conv: np.ndarray, turn: np.ndarray) -> np.ndarray:
    """Boolean mask selecting, per (conv, turn) key, the single row with the
    greatest lsn (ties → first occurrence; lsns are unique in a log).

    Vectorized on integer codes (strings are factorized once) — object
    comparisons never touch the hot path."""
    n = len(lsn)
    if n == 0:
        return np.zeros(0, dtype=bool)
    codes = conv if np.issubdtype(conv.dtype, np.integer) else np.unique(conv, return_inverse=True)[1]
    turn = np.asarray(turn, dtype=np.int64)
    # lexsort: primary conv code, then turn, then lsn desc
    order = np.lexsort((-lsn, turn, codes))
    sc, st = codes[order], turn[order]
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = (sc[1:] != sc[:-1]) | (st[1:] != st[:-1])
    mask = np.zeros(n, dtype=bool)
    mask[order[first]] = True
    return mask


class _NormalizeCombine:
    """map_batches stage: conform payload to the registry schema, attach
    ``_part`` (and optional ``_salt``), partial-LWW-reduce the batch."""

    def __init__(self, registry_json: str, num_partitions: int, num_salts: int = 0,
                 salt_parts: "frozenset[int] | None" = None):
        self.registry = SchemaRegistry.from_json(registry_json)
        self.num_partitions = num_partitions
        self.num_salts = num_salts
        # None = salt every partition (explicit num_salts>1); a set = salt
        # ONLY these partitions (per-partition auto gate) — cold partitions
        # keep the packed-IPC fast path
        self.salt_parts = salt_parts

    def __call__(self, batch: pa.Table) -> pa.Table:
        lsn = batch.column("lsn").to_numpy(zero_copy_only=False)
        codes, uniq = _factorize(batch.column("conv_id"))
        turn = batch.column("turn_idx").to_numpy(zero_copy_only=False)
        mask = _lww_mask(lsn, codes, turn)
        payload = self.registry.conform(batch.select(
            [c for c in batch.column_names if c not in META_COLS]
        ))
        if mask.all():  # no intra-batch dupes → skip the copy entirely
            idx = np.arange(len(lsn))
            out = payload
            op_col = batch.column("op").cast(pa.string())
        else:
            idx = np.flatnonzero(mask)
            out = payload.take(idx)
            op_col = batch.column("op").take(idx).cast(pa.string())
        out = out.append_column("lsn", pa.array(lsn[idx], pa.int64()))
        out = out.append_column("op", op_col)
        part_of_uniq = stable_part_of_uniques(uniq, self.num_partitions)
        out = out.append_column("_part", pa.array(part_of_uniq[codes[idx]]))
        if self.num_salts > 1:
            out = out.append_column(
                "_salt", pa.array((lsn[idx] % self.num_salts).astype(np.int32))
            )
        return out


def _lww_reduce_table(tbl: pa.Table) -> pa.Table:
    """Keep only the max-lsn row per (conv, turn) key. Pure Arrow."""
    codes, _ = _factorize(tbl.column("conv_id"))
    mask = _lww_mask(
        tbl.column("lsn").to_numpy(zero_copy_only=False),
        codes,
        tbl.column("turn_idx").to_numpy(zero_copy_only=False),
    )
    if mask.all():
        return tbl
    return tbl.filter(pa.array(mask))


def _sorted_by_key(tbl: pa.Table) -> pa.Table:
    """Stable (conv_id, turn_idx) order via integer dictionary ranks — the
    dictionary (unique convs) is tiny relative to rows, so no string sort."""
    if tbl.num_rows == 0:
        return tbl
    codes, uniq = _factorize(tbl.column("conv_id"))
    uniq_order = np.argsort(np.asarray(uniq, dtype=object))
    rank_of = np.empty(len(uniq), dtype=np.int64)
    rank_of[uniq_order] = np.arange(len(uniq))
    turn = tbl.column("turn_idx").to_numpy(zero_copy_only=False)
    return tbl.take(pa.array(np.lexsort((turn, rank_of[codes]))))


def _load_stored(root: str, rel: str, registry: SchemaRegistry,
                 filters=None) -> pa.Table:
    """Load a lake file (base or delta) → conformed payload + lsn + op.
    Base files carry implicit op=insert; delta files persist OP_COL.
    ``filters`` (pyarrow.parquet DNF) push into the scan — only safe for
    predicates that commute with the LWW merge, i.e. equality on the
    group-key prefix (conv_id): filtering keeps whole (conv, turn)
    groups, so merge-then-filter ≡ filter-then-merge."""
    stored = pq.read_table(os.path.join(root, rel), filters=filters)
    lsn_col = stored.column(LSN_COL).cast(pa.int64())
    if OP_COL in stored.column_names:
        op_col = stored.column(OP_COL).cast(pa.string())
    else:
        op_col = pa.array(np.repeat("insert", stored.num_rows), pa.string())
    payload = registry.conform(
        stored.select(
            [c for c in stored.column_names if c not in (LSN_COL, OP_COL)]
        )
    )
    payload = payload.append_column("lsn", lsn_col)
    return payload.append_column("op", op_col)


def _merge_live(tables: list[pa.Table]) -> pa.Table:
    """Merge-on-read: concat (payload+lsn+op) tables, LWW by lsn per key,
    drop deletes, stable key order. Output keeps lsn+op dropped."""
    merged = pa.concat_tables(
        [t.select(tables[0].column_names) for t in tables],
        promote_options="permissive",
    )
    mask = _lww_mask(
        merged.column("lsn").to_numpy(zero_copy_only=False),
        _factorize(merged.column("conv_id"))[0],
        merged.column("turn_idx").to_numpy(zero_copy_only=False),
    )
    alive = mask & pc.not_equal(merged.column("op"), "delete").to_numpy(
        zero_copy_only=False
    )
    return _sorted_by_key(merged.filter(pa.array(alive)))


def _write_fragment(tbl: pa.Table, dest: str) -> None:
    """Atomic Arrow-IPC fragment write (lz4; transient exchange files)."""
    import pyarrow.feather as feather

    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".tmp"
    feather.write_feather(tbl, tmp, compression="lz4")
    os.replace(tmp, dest)


def _read_fragments(paths: list[str]) -> pa.Table | None:
    import pyarrow.feather as feather

    tables = [feather.read_table(p) for p in paths]
    if not tables:
        return None
    return pa.concat_tables(tables, promote_options="permissive")


class _FragmentWriter(_NormalizeCombine):
    """Stage 1 (map-side exchange): normalize + combine the batch, split it
    by ``_part``, and write the whole batch as ONE packed Arrow-IPC file
    with one record batch per partition present.

    This replaces Ray's sort-based shuffle with a filesystem-mediated
    exchange (page cache locally, shared storage on a cluster) — both
    stages stay embarrassingly parallel and measured 2-3x faster than
    either Ray shuffle backend for this partition-keyed pattern. Packing
    avoids blocks×partitions tiny-file creates (64k files → 3-5s of pure
    filesystem overhead per 16M-event epoch); the emitted stats rows
    (part, rows, file, batch_idx) ARE the exchange index — the driver
    hands each reducer exactly the (file, batch) pairs for its partition,
    so orphan files from retried tasks are never even opened.

    Salted mode (num_salts>1) writes the one-file-per-(part,salt) layout —
    the salt pre-reduce stage globs per salt. With ``salt_parts`` set,
    ONLY those (hot) partitions take the salted layout; every cold
    partition still rides the packed-IPC fast path in the same batch, so
    the tiny-file overhead is paid exactly where the pre-reduce pays for
    itself.
    """

    def __init__(self, staging: str, registry_json: str, num_partitions: int,
                 num_salts: int = 0,
                 salt_parts: "frozenset[int] | None" = None):
        super().__init__(registry_json, num_partitions, num_salts, salt_parts)
        self.staging = staging

    def _write_salted(self, k: int, frag: pa.Table) -> None:
        salts = frag.column("_salt").to_numpy(zero_copy_only=False)
        sorder = np.argsort(salts, kind="stable")
        ssal = salts[sorder]
        sb = np.r_[np.flatnonzero(np.r_[True, ssal[1:] != ssal[:-1]]), len(ssal)]
        sfrag = frag.take(pa.array(sorder))
        for j in range(len(sb) - 1):
            s = int(ssal[sb[j]])
            piece = sfrag.slice(sb[j], sb[j + 1] - sb[j]).drop_columns(["_salt"])
            _write_fragment(
                piece,
                os.path.join(
                    self.staging, f"part={k}",
                    f"s{s:03d}-{uuid.uuid4().hex[:12]}.arrow",
                ),
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = super().__call__(batch)
        part = out.column("_part").to_numpy(zero_copy_only=False)
        order = np.argsort(part, kind="stable")
        spart = part[order]
        bounds = np.flatnonzero(np.r_[True, spart[1:] != spart[:-1]])
        bounds = np.r_[bounds, len(spart)]
        sorted_tbl = out.take(pa.array(order)) if len(order) else out
        stats_part, stats_rows, stats_file, stats_bidx = [], [], [], []

        packed: list[tuple[int, int, int]] = []  # (part, lo, hi) cold slices
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            k = int(spart[lo])
            if self.num_salts > 1 and (
                self.salt_parts is None or k in self.salt_parts
            ):
                self._write_salted(
                    k, sorted_tbl.slice(lo, hi - lo).drop_columns(["_part"])
                )
                stats_part.append(k)
                stats_rows.append(hi - lo)
                stats_file.append("")
                stats_bidx.append(-1)
            else:
                packed.append((k, lo, hi))

        if packed:
            rel = f"packed-{uuid.uuid4().hex[:12]}.arrow"
            path = os.path.join(self.staging, rel)
            os.makedirs(self.staging, exist_ok=True)
            tmp = path + ".tmp"
            drop = ["_part"] + (["_salt"] if "_salt" in sorted_tbl.column_names else [])
            body = sorted_tbl.drop_columns(drop).combine_chunks()
            # uncompressed on purpose: fragments are transient and live on
            # tmpfs/page-cache (shared storage on a cluster) — lz4 costs
            # encode+decode CPU on both exchange sides for no lasting win
            opts = pa.ipc.IpcWriteOptions()
            with pa.OSFile(tmp, "wb") as sink:
                with pa.ipc.new_file(sink, body.schema, options=opts) as w:
                    for bidx, (k, lo, hi) in enumerate(packed):
                        # one record batch per partition slice, in order —
                        # batch index bidx is the reducer's lookup key
                        w.write_table(body.slice(lo, hi - lo), max_chunksize=hi - lo)
                        stats_part.append(k)
                        stats_rows.append(hi - lo)
                        stats_file.append(rel)
                        stats_bidx.append(bidx)
            os.replace(tmp, path)

        return pa.table(
            {
                "part": pa.array(stats_part, pa.int32()),
                "rows": pa.array(stats_rows, pa.int64()),
                "file": pa.array(stats_file, pa.string()),
                "batch_idx": pa.array(stats_bidx, pa.int32()),
            }
        )


class _SaltReducer:
    """Salted sub-partition pre-reduce (north rule): one task per
    (partition, salt) merges that salt's fragments with a partial LWW
    reduce and writes a single reduced fragment for the final reducer."""

    __name__ = "salt_reduce"

    def __init__(self, staging: str, reduced_dir: str):
        self.staging = staging
        self.reduced_dir = reduced_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        import glob as globmod

        done = []
        for row in batch.to_pylist():
            k, s = int(row["part"]), int(row["salt"])
            paths = sorted(
                globmod.glob(os.path.join(self.staging, f"part={k}", f"s{s:03d}-*.arrow"))
            )
            tbl = _read_fragments(paths)
            if tbl is not None and tbl.num_rows:
                reduced = _lww_reduce_table(tbl)
                _write_fragment(
                    reduced,
                    os.path.join(
                        self.reduced_dir, f"part={k}",
                        f"frag-s{s:03d}-{uuid.uuid4().hex[:12]}.arrow",
                    ),
                )
            done.append({"part": k, "salt": s})
        return pa.Table.from_pylist(done)


def _pack_block_cdc(block: pa.Table, registry_json: str,
                    num_partitions: int) -> list:
    """Object-store stage 1: normalize + combine one block, slice it by
    ``_part``; returns ``[stats, tbl_p0, tbl_p1, ...]`` (None for
    partitions absent from the block). Run with
    ``num_returns=P+1`` so each partition slice becomes its OWN object —
    reducers fetch exactly their partition, nothing else."""
    out = _NormalizeCombine(registry_json, num_partitions, 0)(block)
    part = out.column("_part").to_numpy(zero_copy_only=False)
    return pack_by_partition(out, part, num_partitions, drop=["_part"])


#: per-file key bloom: bits are sized at ~10 per distinct conv (≈1% false
#: positives) and capped so one file's filter stays small in the manifest
#: JSON; override the cap with $TENZIR_RAY_BLOOM_MAX_BYTES (0 disables).
BLOOM_MAX_BYTES_ENV = "TENZIR_RAY_BLOOM_MAX_BYTES"
DEFAULT_BLOOM_MAX_BYTES = 8192


def _bloom_build(uniq: list) -> dict | None:
    """Bloom filter over a file's distinct key values (Kirsch-Mitzenmacher
    double hashing: h_i = h1 + i·h2). Built once per written file from the
    dictionary of uniques — hashing cost is per distinct conv, not per
    row — and carried in the manifest's file_stats so equality reads can
    skip whole files (the point-lookup analog of the zone maps; reference
    synopsis: sketch part of partition_synopsis.hpp)."""
    n = len(uniq)
    if n == 0:
        return None
    import base64

    max_bits = int(os.environ.get(BLOOM_MAX_BYTES_ENV,
                                  DEFAULT_BLOOM_MAX_BYTES)) * 8
    if max_bits <= 0:
        return None
    m = int(min(max(256, n * 10), max_bits))
    k = max(1, min(8, round(0.693 * m / n)))
    h1 = np.fromiter((zlib.crc32(str(u).encode()) for u in uniq),
                     np.uint64, n)
    h2 = np.fromiter((zlib.crc32(b"\x9e\x37" + str(u).encode()) for u in uniq),
                     np.uint64, n) | np.uint64(1)
    bits = np.zeros(m, dtype=bool)
    for i in range(k):
        bits[((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)] = True
    return {"m": m, "k": k,
            "b64": base64.b64encode(np.packbits(bits).tobytes()).decode()}


def _bloom_maybe_contains(bl: dict, value) -> bool:
    """Definitely-absent test (False = provably not in the file). Tests
    bytes in place — no full unpack per call (packbits is MSB-first)."""
    import base64

    buf = base64.b64decode(bl["b64"])
    v = str(value).encode()
    h1 = zlib.crc32(v)
    h2 = zlib.crc32(b"\x9e\x37" + v) | 1
    m = bl["m"]
    for i in range(bl["k"]):
        pos = (h1 + i * h2) % m
        if not (buf[pos >> 3] >> (7 - (pos & 7))) & 1:
            return False
    return True


def _token_bloom(col, cap: int = 65536) -> "dict | None":
    """Bloom over a string column's distinct whitespace TOKENS — the
    full-text point-search analog of the key bloom: ``search(term)``
    can skip a whole partition when every file's token bloom rejects
    the term. ``cap`` bounds the distinct-token set fed to the sizing
    formula (beyond it the filter saturates gracefully — pruning power
    degrades, correctness doesn't: a bloom only ever proves ABSENCE)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    try:
        toks = pc.split_pattern_regex(arr, pattern=r"\s+")
        flat = toks.flatten()
        uniq = pc.unique(flat)
    except Exception:
        return None
    vals = [u for u in uniq.to_pylist()[:cap] if u]
    return _bloom_build(vals)


def _zone_stats(tbl: pa.Table, token_cols: "tuple | list" = ()) -> dict:
    """Per-file zone map: ``{col: [min, max]}`` over the payload's
    numeric/boolean columns and string keys (truncated to 64 chars) —
    the reference's partition-synopsis min-max sketch
    (libtenzir/include/tenzir/partition_synopsis.hpp) carried in the
    manifest so readers can skip whole files without opening them.
    Nulls are ignored (a comparison predicate never matches null);
    all-null/empty columns are omitted (no pruning claim)."""
    out: dict = {}
    for name in tbl.column_names:
        if name in (OP_COL, CHANGE_TYPE_COL):
            continue
        col = tbl.column(name)
        t = col.type
        is_ts = pa.types.is_timestamp(t)
        if not (pa.types.is_integer(t) or pa.types.is_floating(t)
                or pa.types.is_boolean(t) or pa.types.is_string(t)
                or pa.types.is_large_string(t) or is_ts):
            continue
        try:
            mm = pc.min_max(col)
        except Exception:
            continue
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
        if mn is None or mx is None:
            continue
        if is_ts:
            # ISO 'T'-separated strings in the JSON manifest; _zone_skip
            # parses them (and ISO literals) back for a typed compare
            out[name] = [mn.isoformat(), mx.isoformat()]
            continue
        if isinstance(mn, str):
            # truncating the MAX upward keeps the bound conservative
            # ("abc…" prefix + 0x10FFFF sentinel covers every extension)
            if len(mn) > 64:
                mn = mn[:64]
            if len(mx) > 64:
                mx = mx[:64] + "\U0010ffff"
        out[name] = [mn, mx]
    # key bloom: conv_id ranges of sibling files almost always overlap
    # (zone maps can't prune equality on a hashed-in key), so point
    # lookups get a membership sketch instead
    if KEY_COLS[0] in tbl.column_names and tbl.num_rows:
        col = tbl.column(KEY_COLS[0])
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            uniq = [u for u in pc.unique(
                col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                else col).to_pylist() if u is not None]
            bl = _bloom_build(uniq)
            if bl is not None:
                out[f"_bloom:{KEY_COLS[0]}"] = bl
    for tc in token_cols:
        if tc in tbl.column_names and tbl.num_rows:
            col = tbl.column(tc)
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                bl = _token_bloom(col)
                if bl is not None:
                    out[f"_bloom:tok:{tc}"] = bl
    return out


_ISO_DATE_RE = None


def _zone_norm(v, mn, mx):
    """Normalize an ISO-date-shaped literal + bounds trio to datetimes
    so timestamp pruning compares typed values, not mixed-separator
    strings ('2025-01-02 07:00' vs '2025-01-02T07:00' are the same
    instant but lexically unordered)."""
    global _ISO_DATE_RE
    if not (isinstance(v, str) and isinstance(mn, str)):
        return v, mn, mx
    if _ISO_DATE_RE is None:
        import re

        _ISO_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}([ T]|$)")
    if _ISO_DATE_RE.match(v) and _ISO_DATE_RE.match(mn):
        from datetime import datetime

        try:
            return (datetime.fromisoformat(v),
                    datetime.fromisoformat(mn),
                    datetime.fromisoformat(mx))
        except ValueError:
            return v, mn, mx
    return v, mn, mx


def _zone_skip(stats: "dict | None", conjuncts: list) -> bool:
    """True iff the file provably contains no matching row for the
    AND-ed ``(col, op, value)`` conjuncts. Missing stats → keep."""
    if not stats:
        return False
    for col, op, v in conjuncts:
        if op == "==" and isinstance(v, str):
            bl = stats.get(f"_bloom:{col}")
            if bl is not None and not _bloom_maybe_contains(bl, v):
                return True
        mm = stats.get(col)
        if not mm:
            continue
        mn, mx = mm
        v, mn, mx = _zone_norm(v, mn, mx)
        try:
            if op == "==" and (v < mn or v > mx):
                return True
            if op == "<" and not (mn < v):
                return True
            if op == "<=" and not (mn <= v):
                return True
            if op == ">" and not (mx > v):
                return True
            if op == ">=" and not (mx >= v):
                return True
            if op == "!=" and mn == mx == v:
                return True
        except TypeError:
            continue  # incomparable literal/stat types: keep the file
    return False


def _rank_quantize(col, bits: int) -> np.ndarray:
    """Per-row rank of a column, scaled to ``[0, 2^bits)`` — rank (not
    min-max) quantization spreads codes uniformly regardless of value
    distribution, so Z-order chunking stays balanced under skew. Strings
    rank via their dictionary's sort order (no per-row string compares);
    nulls/NaNs sort last (deterministic)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        d = arr.dictionary_encode()
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dict_order = pc.sort_indices(d.dictionary).to_numpy(
            zero_copy_only=False).astype(np.int64)
        inv = np.empty(len(dict_order), dtype=np.int64)
        inv[dict_order] = np.arange(len(dict_order))
        idx = np.where(idx < 0, len(dict_order), idx)  # nulls last
        val_rank = np.append(inv, len(dict_order))[idx]
        order = np.argsort(val_rank, kind="stable")
    else:
        v = arr.to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")  # NaN (nulls) sort last
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    return (rank.astype(np.uint64) * np.uint64((1 << bits) - 1)
            // np.uint64(max(n - 1, 1)))


def _zorder_argsort(tbl: pa.Table, cols: list[str]) -> np.ndarray:
    """Row order by Morton code: interleave the bits of each clustered
    column's rank-quantized value (bit budget split evenly, ≤64 total).
    Chunking a Morton-sorted table bounds EVERY dimension's min-max
    spread per chunk, which is what makes the per-chunk zone maps prune
    on any clustered column (the Z-order curve's locality property)."""
    present = [c for c in cols if c in tbl.column_names]
    n = tbl.num_rows
    if not present or n == 0:
        return np.arange(n)
    # ≤16 bits/column keeps the rank·scale product inside uint64 and 16
    # bits already separates 65k chunk boundaries per dimension
    bits = max(1, min(16, 64 // len(present)))
    codes = [_rank_quantize(tbl.column(c), bits) for c in present]
    z = np.zeros(n, dtype=np.uint64)
    nc = len(codes)
    for b in range(bits):
        for j, code in enumerate(codes):
            z |= ((code >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * nc + j)
    return np.argsort(z, kind="stable")


class _PartitionReducer:
    """Stage 2: one task per touched partition — read the partition's
    exchange fragments, merge with its live base rows, final LWW by lsn,
    drop deletes, write the new partition file, return a 1-row lineage
    record. Runs as map_batches over tiny {part} rows (batch_size=1), so
    every partition reduces in parallel with no shuffle machinery."""

    __name__ = "partition_reduce"

    def __init__(self, root: str, staging: str, registry_json: str, epoch_id: str,
                 base_files: dict[int, list[str]], payload_cols: list[str],
                 modes: dict[int, str] | None = None,
                 frag_index: dict[int, list] | None = None,
                 salted_dir: str | None = None,
                 change_feed: bool = False,
                 token_cols: "tuple | list" = ()):
        self.token_cols = tuple(token_cols)
        self.change_feed = change_feed
        self.root = root
        self.staging = staging
        self.registry = SchemaRegistry.from_json(registry_json)
        self.epoch_id = epoch_id
        self.base_files = base_files  # part -> list of live file relpaths
        self.payload_cols = payload_cols
        self.modes = modes or {}     # part -> "full" | "delta"
        # packed-exchange index: part -> [(packed_file_rel, batch_idx)];
        # built from the SUCCESSFUL stage-1 attempts' stats, so orphan
        # files from retried tasks are never even opened
        self.frag_index = frag_index
        # where salted partitions' pre-reduced fragments live (mixed mode:
        # a partition absent from frag_index was salted → glob here)
        self.salted_dir = salted_dir

    def _read_packed(self, part: int) -> pa.Table | None:
        entries = self.frag_index.get(part, [])
        by_file: dict[str, list[int]] = {}
        for rel, bidx in entries:
            by_file.setdefault(rel, []).append(bidx)
        batches = []
        for rel, idxs in by_file.items():
            # memory-map: batches reference page-cache bytes zero-copy
            # instead of read()-copying each tiny slice
            with pa.memory_map(os.path.join(self.staging, rel), "rb") as f:
                reader = pa.ipc.open_file(f)
                for i in idxs:
                    batches.append(reader.get_batch(i))
        if not batches:
            return None
        return pa.Table.from_batches(batches)

    def _load_raw(self, part: int) -> pa.Table:
        import glob as globmod

        if self.frag_index is not None and part in self.frag_index:
            raw = self._read_packed(part)
        else:
            d = self.salted_dir or self.staging
            paths = sorted(
                globmod.glob(os.path.join(d, f"part={part}", "*.arrow"))
            )
            raw = _read_fragments(paths)
        assert raw is not None, f"no fragments for partition {part}"
        return raw

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_rows = []
        for row in batch.to_pylist():
            part = int(row["part"])
            out_rows.append(self._reduce_one(part, self._load_raw(part)))
        return pa.Table.from_pylist(out_rows)

    def _preimage_feed(self, net: pa.Table,
                       base_tables: list[pa.Table]) -> pa.Table:
        """Delta-CDF-with-preimages feed for one partition: classify each
        net change against the pre-epoch live state (already loaded for
        the merge) into ``_change_type`` ∈ insert / update_preimage /
        update_postimage / delete. Preimage rows carry the REPLACED row's
        payload and lsn; a delete of a key that never lived emits nothing
        (Delta semantics — differs from the plain postimage feed, which
        keeps every tombstone). One pandas hash-join on the keys per
        partition (bucket-then-vectorize; partition already fits a worker
        heap by the reduce's own bound)."""
        base_live = None
        if base_tables:
            merged_base = pa.concat_tables(base_tables,
                                           promote_options="permissive")
            if merged_base.num_rows:
                base_live = _merge_live([merged_base])

        def _with_type(t: pa.Table, ct: str) -> pa.Table:
            body = t.select(self.payload_cols)
            body = body.append_column(LSN_COL, t.column("lsn"))
            body = body.append_column(OP_COL, t.column("op"))
            return body.append_column(
                CHANGE_TYPE_COL, pa.array([ct] * t.num_rows, pa.string()))

        is_del = pc.equal(net.column("op"), "delete").to_numpy(
            zero_copy_only=False)
        if base_live is None or base_live.num_rows == 0:
            return _with_type(net.filter(pa.array(~is_del)), "insert")

        nk = pd.DataFrame({
            "conv": net.column("conv_id").to_pandas(),
            "turn": net.column("turn_idx").to_numpy(zero_copy_only=False),
        })
        bk = pd.DataFrame({
            "conv": base_live.column("conv_id").to_pandas(),
            "turn": base_live.column("turn_idx").to_numpy(zero_copy_only=False),
            "bi": np.arange(base_live.num_rows),
        })
        m = nk.merge(bk, on=["conv", "turn"], how="left")
        bi = m["bi"].to_numpy()
        has_base = ~np.isnan(bi)

        pieces = []
        ins = ~has_base & ~is_del
        if ins.any():
            pieces.append(_with_type(net.filter(pa.array(ins)), "insert"))
        upd = has_base & ~is_del
        if upd.any():
            pre_idx = bi[upd].astype(np.int64)
            pieces.append(_with_type(base_live.take(pa.array(pre_idx)),
                                     "update_preimage"))
            pieces.append(_with_type(net.filter(pa.array(upd)),
                                     "update_postimage"))
        dele = has_base & is_del
        if dele.any():
            del_idx = bi[dele].astype(np.int64)
            pieces.append(_with_type(base_live.take(pa.array(del_idx)),
                                     "delete"))
        if not pieces:
            return _with_type(net.slice(0, 0), "insert").slice(0, 0)
        feed = pa.concat_tables(pieces, promote_options="permissive")
        return _sorted_by_key(feed)

    def _reduce_one(self, part: int, raw: pa.Table) -> dict:
        changes = self.registry.conform(
            raw.select([c for c in raw.column_names if c not in META_COLS])
        )
        changes = changes.append_column("lsn", raw.column("lsn").cast(pa.int64()))
        changes = changes.append_column("op", raw.column("op").cast(pa.string()))
        change_lsn = changes.column("lsn").to_numpy(zero_copy_only=False)
        mode = self.modes.get(part, "full")

        if mode == "append":
            # append-only path (the reference's import semantics,
            # importer.cpp append-only partitions): INSERTs of new keys
            # land as a fresh file, base untouched, fast read path kept —
            # so per-epoch files accumulate with disjoint zone maps and
            # time-range reads prune whole epochs. Key disjointness vs
            # the base is the CALLER's contract (exactly as the
            # reference's import, which never dedups); non-insert ops
            # are rejected loudly.
            bad = pc.any(pc.not_equal(changes.column("op"), "insert"))
            if bool(bad.as_py()):
                raise ValueError(
                    "append_only epoch contains update/delete ops — "
                    "use the default upsert path for those")
            final = _sorted_by_key(_lww_reduce_table(changes))
            out = final.select(self.payload_cols).append_column(
                LSN_COL, final.column("lsn"))
            rel = (f"part={part}/append-{self.epoch_id}-"
                   f"{uuid.uuid4().hex[:8]}.parquet")
            lsn_high = int(change_lsn.max()) if len(change_lsn) else -1
        elif mode == "delta":
            # merge-on-read path: never touch the base — LWW-reduce only the
            # epoch's changes and write them (incl. delete tombstones) as a
            # DELTA file; readers merge base+deltas, optimize() compacts
            final = _lww_reduce_table(changes)
            final = _sorted_by_key(final)
            out = final.select(self.payload_cols)
            out = out.append_column(LSN_COL, final.column("lsn"))
            out = out.append_column(OP_COL, final.column("op"))
            rel = f"part={part}/delta-{self.epoch_id}-{uuid.uuid4().hex[:8]}.parquet"
            lsn_high = int(change_lsn.max()) if len(change_lsn) else -1
        else:
            base_tables = [
                _load_stored(self.root, rel_stored, self.registry).select(
                    changes.column_names
                )
                for rel_stored in self.base_files.get(part, ())
            ]
            merged = pa.concat_tables([changes, *base_tables],
                                      promote_options="permissive")
            mask = _lww_mask(
                merged.column("lsn").to_numpy(zero_copy_only=False),
                _factorize(merged.column("conv_id"))[0],
                merged.column("turn_idx").to_numpy(zero_copy_only=False),
            )
            # keep the per-key LWW WINNERS including delete tombstones: a
            # tombstone must survive the rewrite so a late-arriving earlier
            # segment (out-of-order backfill) cannot resurrect the key.
            # Tombstones die at compaction (optimize()), which the operator
            # runs once the log is known applied in order up to a watermark.
            final = _sorted_by_key(merged.filter(pa.array(mask)))
            out = final.select(self.payload_cols).append_column(
                LSN_COL, final.column("lsn")
            )
            # the _op column only exists when tombstones are present — the
            # all-insert common case stays a pure payload+_lsn file
            has_tomb = bool(
                pc.any(pc.equal(final.column("op"), "delete")).as_py()
            )
            if has_tomb:
                out = out.append_column(OP_COL, final.column("op"))
            rel = f"part={part}/epoch-{self.epoch_id}-{uuid.uuid4().hex[:8]}.parquet"
            mlsn = merged.column("lsn").to_numpy(zero_copy_only=False)
            lsn_high = int(mlsn.max()) if len(mlsn) else -1

        path = os.path.join(self.root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(out, tmp, compression="zstd", compression_level=1)
        os.replace(tmp, path)  # write-then-rename (posix_filesystem.cpp:29)

        # change-data-feed (Delta-Lake _change_data analog): persist the
        # epoch's NET applied changes — intra-epoch LWW winners including
        # delete tombstones — in a dedicated _cdf/ file that survives
        # compaction. In delta mode this equals the delta file; a separate
        # copy keeps the feed readable after optimize() collects the delta.
        # change_feed="preimages" additionally emits the replaced rows
        # (update_preimage / delete content) — possible exactly here, where
        # the base was read anyway for the merge.
        cdf_rel = None
        if self.change_feed:
            if mode == "delta":
                cdf_tbl = out
            else:
                net = _sorted_by_key(_lww_reduce_table(changes))
                if self.change_feed == "preimages":
                    cdf_tbl = self._preimage_feed(net, base_tables)
                else:
                    cdf_tbl = net.select(self.payload_cols)
                    cdf_tbl = cdf_tbl.append_column(LSN_COL, net.column("lsn"))
                    cdf_tbl = cdf_tbl.append_column(OP_COL, net.column("op"))
            cdf_rel = (
                f"_cdf/part={part}/cdf-{self.epoch_id}-{uuid.uuid4().hex[:8]}"
                ".parquet"
            )
            cdf_path = os.path.join(self.root, cdf_rel)
            os.makedirs(os.path.dirname(cdf_path), exist_ok=True)
            pq.write_table(cdf_tbl, cdf_path + ".tmp", compression="zstd",
                           compression_level=1)
            os.replace(cdf_path + ".tmp", cdf_path)

        # deterministic content checksum: sha256 over the sorted output's
        # Arrow IPC bytes (single C pass, no pandas round-trip)
        import hashlib

        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, out.schema) as w:
            w.write_table(out)
        checksum = int.from_bytes(
            hashlib.sha256(sink.getvalue()).digest()[:8], "big"
        ) & ((1 << 63) - 1)
        n_tomb = int(
            pc.sum(
                pc.cast(pc.equal(final.column("op"), "delete"), pa.int64())
            ).as_py()
            or 0
        )
        return {
            "part": part,
            "rows": out.num_rows - (n_tomb if mode != "delta" else 0),
            "tombstones": n_tomb,
            "mode": mode,
            # JSON string: heterogeneous min/max types don't survive the
            # Arrow struct inference of the lineage result block
            "stats": _json.dumps(_zone_stats(out, self.token_cols)),
            # applied-LSN watermark (resume checkpoint)
            "lsn_high": lsn_high,
            # this epoch's change-lsn range (lineage)
            "lsn_lo": int(change_lsn.min()) if len(change_lsn) else -1,
            "lsn_hi": int(change_lsn.max()) if len(change_lsn) else -1,
            "checksum": checksum,
            "file": rel,
            "cdf_file": cdf_rel,
        }


class _PartitionLoader:
    """Merge-on-read loader: one task per partition, merges base + delta
    files (LWW, tombstones dropped) and emits payload rows."""

    __name__ = "partition_load"

    def __init__(self, root: str, files_by_part: dict, registry_json: str,
                 columns: list[str] | None):
        self.root = root
        self.files_by_part = {int(k): v for k, v in files_by_part.items()}
        self.registry = SchemaRegistry.from_json(registry_json)
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for row in batch.to_pylist():
            rels = self.files_by_part[int(row["part"])]
            merged = _merge_live(
                [_load_stored(self.root, rel, self.registry) for rel in rels]
            )
            tbl = merged.drop_columns(["lsn", "op"])
            if self.columns:
                tbl = tbl.select(self.columns)
            outs.append(tbl)
        return pa.concat_tables(outs, promote_options="permissive")


class LakeTable:
    """A partitioned Parquet lake table with exactly-once CDC apply."""

    def __init__(self, root: str, num_partitions: int = 16,
                 token_bloom_cols: "tuple | list" = ()):
        #: string columns to carry per-file token BLOOMS for (written at
        #: every apply/optimize by this instance; files written without
        #: them are simply never pruned by search() — correctness is
        #: unaffected, pruning is best-effort)
        self._token_bloom_cols = tuple(token_bloom_cols)
        self.root = root
        os.makedirs(root, exist_ok=True)
        m = Manifest.load(root)
        if m is None:
            m = Manifest(root=root, num_partitions=num_partitions)
        self.manifest = m
        self.num_partitions = m.num_partitions
        reg_path = os.path.join(root, REGISTRY_NAME)
        if os.path.exists(reg_path):
            with open(reg_path) as f:
                self.registry = SchemaRegistry.from_json(f.read())
        else:
            self.registry = SchemaRegistry()
        self._sync_registry()

    def refresh(self) -> None:
        """Resync this instance with the published state — pick up commits
        made by OTHER writers (processes/instances) since construction.
        ``apply_changes``/``optimize`` refresh automatically; reads are
        snapshot-consistent against the state last seen (call this to see
        newer commits)."""
        self.manifest.reload()
        self._sync_registry()

    def _sync_registry(self) -> None:
        """Fold the manifest's commit-log registry (the multi-writer
        authority) into this instance's registry — evolve is a lattice
        join, so folding in any order converges."""
        if self.manifest.registry_json:
            other = SchemaRegistry.from_json(self.manifest.registry_json)
            if self.registry.schema is None:
                self.registry = other
            else:
                self.registry.evolve(other.schema)

    # ------------------------------------------------------------------
    def apply_changes(
        self,
        changes: "ray.data.Dataset | pa.Table",
        epoch_id: str,
        num_salts: "int | str" = 0,
        batch_size: int = 262144,
        delta_ratio: float = 0.2,
        epoch_meta: dict[str, Any] | None = None,
        transport: str | None = None,
        change_feed: bool = False,
        append_only: bool = False,
    ) -> dict[str, Any]:
        """Apply one epoch (a bounded chunk of the binlog) exactly once.

        ``append_only=True`` switches to the reference's import
        semantics (append-only partitions, importer.cpp): the epoch must
        be pure INSERTs of keys not already live (the caller's contract
        — never verified against the base, exactly like the reference's
        import, which has no dedup); each partition lands a fresh file
        with its own zone map instead of a rewrite, the read fast path
        is preserved across any number of append epochs, and time-range
        predicates prune whole epoch files via ``read(filter_expr=)``.

        Returns the epoch lineage record. Re-applying a committed
        ``epoch_id`` is a no-op (idempotence/resume gate). ``epoch_meta``
        is persisted in the lineage record atomically with the data —
        source-offset checkpoints go here (see cdc/broker.py).

        ``num_salts``: 0/1 = unsalted, N>1 = salted sub-partition
        pre-reduce for hot keys, ``"auto"`` = gate on the previous
        epoch's recorded per-partition change volume (salt only past
        $TENZIR_RAY_SALT_THRESHOLD rows in one partition — below that
        the per-batch LWW combiner absorbs skew more cheaply, measured
        in BENCH/BASELINE.md).

        ``transport`` selects the exchange fabric (default: the
        ``TENZIR_RAY_EXCHANGE_TRANSPORT`` env var, else "fs"):
        "fs" = packed-IPC staging files (page cache locally, shared
        storage on a cluster — fastest where fast shared POSIX storage
        exists); "object" = partition slices ride Ray's object store
        (plasma moves bytes node-to-node and spills — no shared-FS
        requirement; salted mode is fs-only).

        ``change_feed=True`` additionally persists each partition's NET
        applied changes (intra-epoch LWW winners incl. delete tombstones)
        under ``_cdf/`` so :meth:`changes` can stream the applied change
        log later (Delta-Lake change-data-feed analog). Off by default —
        it costs one extra small parquet write per touched partition.
        ``change_feed="preimages"`` also emits the REPLACED rows, tagging
        every feed row with ``_change_type`` (insert / update_preimage /
        update_postimage / delete); preimage capture needs the pre-epoch
        base, so this mode disables the delta (merge-on-read) path for
        the epoch — the same trade Delta Lake's CDF makes on MERGE.
        """
        import ray.data

        # resync with the published state: another writer (process or
        # instance) may have committed since this instance loaded — the
        # commit log makes their epochs visible here, and makes the
        # committed-epoch idempotence check hold ACROSS processes
        self.manifest.reload()
        self._sync_registry()
        if epoch_id in self.manifest.committed_epoch_ids():
            return {"epoch_id": epoch_id, "skipped": True}

        if isinstance(changes, pa.Table):
            changes = ray.data.from_arrow(changes)

        from tenzir_ray.stages.exchange import default_transport

        transport = transport or default_transport()
        if transport not in ("fs", "object"):
            raise ValueError(f"unknown exchange transport {transport!r}")
        salt_parts: "frozenset[int] | None" = None  # None = salt every part
        if num_salts == "auto":
            # Salting must be decided BEFORE stage 1 (the FragmentWriter
            # tags `_salt` at write time), but skew is only measured BY
            # stage 1 — so auto gates on the PREVIOUS epoch's recorded
            # exchange stats: CDC epochs are temporally homogeneous, a
            # conversation hot this epoch was almost surely hot last
            # epoch. First epoch (no history) runs unsalted — the
            # per-batch LWW combiner bounds the damage meanwhile.
            # The gate is PER PARTITION: only partitions whose recorded
            # volume crossed the threshold take the salted layout; cold
            # partitions keep the packed-IPC fast path in the same epoch.
            if transport == "object":
                num_salts = 0
            else:
                num_salts, salt_parts = self._auto_salt_plan()
        if transport == "object" and num_salts > 1:
            raise ValueError(
                "salted pre-reduce requires the fs transport (the salt "
                "stage globs staging files); the per-batch combiner "
                "already absorbs skew on the object path"
            )
        # empty epochs still record zeroed exchange stats so the auto
        # gate un-salts after a table goes quiet
        empty_meta = {
            **(epoch_meta or {}),
            "_exchange": {"rows": 0, "max_part_rows": 0,
                          "num_salts": int(num_salts)},
        }

        # -- schema evolution: merge the incoming payload schema ---------
        incoming = changes.schema()
        if incoming is not None and any(
                not isinstance(t, pa.DataType) for t in incoming.types):
            # pandas-block datasets report numpy/Python types; route
            # through a zero-copy arrow identity so the registry sees the
            # real Arrow schema (the exchange stages read arrow anyway)
            changes = changes.map_batches(lambda b: b, batch_format="pyarrow")
            incoming = changes.schema()
        payload_fields = [
            pa.field(n, t)
            for n, t in zip(incoming.names, incoming.types)
            if n not in META_COLS
        ]
        if payload_fields:
            self.registry.evolve(pa.schema(payload_fields))
        if self.registry.schema is None:
            # nothing to apply and no schema yet: commit an empty epoch so
            # the segment is marked applied (tail_directory resume gate)
            self.manifest.commit_epoch(epoch_id, -1, -1, {}, meta=empty_meta)
            return {"epoch_id": epoch_id, "lsn_min": -1, "lsn_max": -1,
                    "partitions_touched": 0, "rows_live": 0,
                    "num_salts": int(num_salts)}
        self._persist_registry()
        reg_json = self.registry.to_json()
        payload_cols = list(self.registry.schema.names)

        # -- stage 1: normalize + per-batch LWW combine, then write the
        #    batch's rows as per-partition Arrow-IPC fragments (the
        #    filesystem-mediated exchange; see _FragmentWriter) ------------
        import glob as globmod
        import shutil

        import ray as ray_core

        staging = os.path.join(self.root, "_staging", epoch_id)
        shutil.rmtree(staging, ignore_errors=True)  # stale crashed attempt
        import time as _time

        _t0 = _time.perf_counter()
        obj_index: dict[int, list] | None = None
        frag_index: dict[int, list] | None = None
        if transport == "object":
            # stage 1 over the object store (run_exchange_obj's shape with
            # the lake's own partition function): one pack task per block,
            # num_returns=P+1 so each partition slice is its own object
            ds1 = changes
            if batch_size is not None:
                ds1 = ds1.map_batches(
                    lambda b: b, batch_format="pyarrow", batch_size=batch_size
                )
            block_refs = ds1.to_arrow_refs()
            pack = ray_core.remote(_pack_block_cdc)
            outs = [
                pack.options(num_returns=self.num_partitions + 1).remote(
                    br, reg_json, self.num_partitions
                )
                for br in block_refs
            ]
            obj_index = {}
            frag_rows: dict[int, int] = {}
            # one batched get, not a per-task round-trip loop
            all_stats = ray_core.get([refs[0] for refs in outs])
            for refs, stats in zip(outs, all_stats):
                for k, (rows, _nb) in stats.items():
                    obj_index.setdefault(int(k), []).append(refs[1 + int(k)])
                    frag_rows[int(k)] = frag_rows.get(int(k), 0) + int(rows)
        else:
            stage1 = changes.map_batches(
                _FragmentWriter(staging, reg_json, self.num_partitions,
                                num_salts, salt_parts),
                batch_format="pyarrow",
                batch_size=batch_size,
            ).to_pandas()  # barrier: all fragments on disk before reducing
            frag_rows = (
                stage1.groupby("part")["rows"].sum().to_dict() if len(stage1) else {}
            )
            # packed-exchange index over the COLD partitions (all of them
            # when unsalted; salted partitions emit batch_idx=-1 stats rows)
            frag_index = {}
            if len(stage1):
                for part_v, file_v, bidx_v in zip(
                    stage1["part"], stage1["file"], stage1["batch_idx"]
                ):
                    if int(bidx_v) >= 0:
                        frag_index.setdefault(int(part_v), []).append(
                            (file_v, int(bidx_v)))

        # -- optional stage 1.5: salted sub-partition pre-reduce ----------
        # (only the salted partitions have part=*/ dirs in staging; cold
        # partitions live in packed-*.arrow files and skip this stage)
        reduced_dir: str | None = None
        salted_touched: set[int] = set()
        if num_salts > 1:
            import ray.data as rd

            reduced_dir = staging + "-reduced"
            shutil.rmtree(reduced_dir, ignore_errors=True)
            parts_with_salts = []
            for pdir in globmod.glob(os.path.join(staging, "part=*")):
                k = int(os.path.basename(pdir).split("=")[1])
                salts = {
                    int(os.path.basename(f).split("-")[0][1:])
                    for f in globmod.glob(os.path.join(pdir, "s*-*.arrow"))
                }
                salted_touched.add(k)
                parts_with_salts += [{"part": k, "salt": s} for s in sorted(salts)]
            if parts_with_salts:
                rd.from_items(parts_with_salts).map_batches(
                    _SaltReducer(staging, reduced_dir),
                    batch_format="pyarrow",
                    batch_size=1,
                ).count()

        # -- stage 2: one parallel task per touched partition -------------
        if obj_index is not None:
            touched = sorted(obj_index)
        else:
            touched = sorted(set(frag_index) | salted_touched)
        if not touched:
            # zero-row epoch (e.g. an empty binlog segment): commit an
            # empty lineage record so resume never re-crashes on it
            self.manifest.commit_epoch(epoch_id, -1, -1, {}, meta=empty_meta,
                                       registry_json=reg_json)
            shutil.rmtree(staging, ignore_errors=True)
            return {"epoch_id": epoch_id, "lsn_min": -1, "lsn_max": -1,
                    "partitions_touched": 0, "rows_live": 0,
                    "num_salts": int(num_salts)}
        base_files = {
            int(k): info["files"] for k, info in self.manifest.partitions.items()
        }

        # delta vs full rewrite per partition (merge-on-read, the fix for
        # merge-on-write amplification in incremental ingest): small change
        # volume against a large base → append a delta file instead of
        # rewriting; accumulated deltas force compaction at the threshold
        modes: dict[int, str] = {}
        if append_only:
            if change_feed == "preimages":
                raise ValueError(
                    "append_only is incompatible with change_feed="
                    "'preimages' (preimages require the base read; an "
                    "append-only epoch by contract replaces nothing)")
            modes = {k: "append" for k in touched}
        if change_feed == "preimages":
            delta_ratio = 0  # preimages need the base read (see docstring)
        if not append_only and delta_ratio > 0:
            for k in touched:
                info = self.manifest.partitions.get(str(k))
                if info is None:
                    continue  # no base yet → full
                base_rows = info.get("rows", 0) or 0
                pend = info.get("delta_rows", 0) or 0
                ch = frag_rows.get(k, 0)
                if base_rows > 0 and ch < delta_ratio * base_rows and (
                    pend + ch
                ) < 2 * delta_ratio * base_rows:
                    modes[k] = "delta"

        reducer = _PartitionReducer(
            self.root, staging, reg_json, epoch_id, base_files, payload_cols,
            modes=modes,
            frag_index=frag_index,
            salted_dir=reduced_dir,
            change_feed=change_feed,
            token_cols=self._token_bloom_cols,
        )
        # stage 2 runs as plain Ray tasks, not a Dataset pipeline: the
        # reduce is a FIXED fan-out of independent per-partition tasks
        # with tiny dict outputs — the one place the Dataset API adds
        # only launch overhead (~0.5-1s per epoch). Task retries on
        # worker death are preserved (ray.remote default max_retries).
        reducer_ref = ray_core.put(reducer)

        @ray_core.remote
        def _reduce_task(r, part: int) -> dict:
            # the reducer arrives auto-dereferenced from reducer_ref —
            # stored once in plasma, not re-pickled per task
            return r._reduce_one(part, r._load_raw(part))

        @ray_core.remote
        def _reduce_task_obj(r, part: int, refs: list) -> dict:
            # object transport: the partition's slices are plasma objects
            # (refs nested in a list are NOT auto-derefed — fetched here,
            # on the node the task runs on)
            tables = [t for t in ray_core.get(refs)
                      if t is not None and t.num_rows]
            raw = pa.concat_tables(tables, promote_options="permissive")
            return r._reduce_one(part, raw)

        _t1 = _time.perf_counter()
        if obj_index is not None:
            futs = [_reduce_task_obj.remote(reducer_ref, k, obj_index[k])
                    for k in touched]
        else:
            futs = [_reduce_task.remote(reducer_ref, k) for k in touched]
        lineage = pd.DataFrame(ray_core.get(futs))
        _t2 = _time.perf_counter()

        # -- two-phase commit -------------------------------------------
        def _build_part_results() -> dict:
            """Per-partition replacement records against the CURRENT base
            (re-run on OCC rebase: append/delta epochs recompute their
            cumulative counters on top of a concurrent writer's commit)."""
            out = {}
            for r in lineage.itertuples():
                k = str(int(r.part))
                prev = self.manifest.partitions.get(k, {})
                fstats = _json.loads(r.stats) if r.stats else {}
                if r.mode == "append":
                    out[k] = {
                        "files": list(prev.get("files", [])) + [r.file],
                        "rows": (prev.get("rows", 0) or 0) + int(r.rows),
                        "delta_rows": prev.get("delta_rows", 0) or 0,
                        "tombstones": prev.get("tombstones", 0) or 0,
                        "lsn_high": max(int(r.lsn_high), prev.get("lsn_high", -1)),
                        "checksum": int(r.checksum),
                        "file_stats": {**(prev.get("file_stats") or {}),
                                       r.file: fstats},
                    }
                elif r.mode == "delta":
                    out[k] = {
                        "files": list(prev.get("files", [])) + [r.file],
                        "rows": prev.get("rows", 0),
                        "delta_rows": (prev.get("delta_rows", 0) or 0) + int(r.rows),
                        "tombstones": (prev.get("tombstones", 0) or 0) + int(r.tombstones),
                        "lsn_high": max(int(r.lsn_high), prev.get("lsn_high", -1)),
                        "checksum": int(r.checksum),
                        "file_stats": {**(prev.get("file_stats") or {}),
                                       r.file: fstats},
                    }
                else:
                    out[k] = {
                        "files": [r.file],
                        "rows": int(r.rows),
                        "delta_rows": 0,
                        "tombstones": int(r.tombstones),
                        "lsn_high": int(r.lsn_high),
                        "checksum": int(r.checksum),
                        "file_stats": {r.file: fstats},
                    }
                # lineage-only fields (time travel + change feed)
                out[k]["mode"] = str(r.mode)
                out[k]["new_file"] = r.file
                if r.cdf_file is not None:
                    out[k]["cdf_file"] = r.cdf_file
            return out

        lsn_min = int(lineage["lsn_lo"].min())
        lsn_max = int(lineage["lsn_hi"].max())
        # exchange stats ride the lineage record (same atomic write):
        # the next epoch's num_salts="auto" gate reads them back
        # per-partition volumes (top 64 by rows — hot partitions are few
        # by definition; a capped record keeps lineage bounded at high P.
        # If >64 partitions are ALL past the salt threshold, the ones the
        # cap drops merely stay on the packed path — correctness holds)
        top_parts = sorted(frag_rows.items(), key=lambda kv: -kv[1])[:64]
        commit_meta = {
            **(epoch_meta or {}),
            "_exchange": {
                "rows": int(sum(frag_rows.values())),
                "max_part_rows": int(max(frag_rows.values(), default=0)),
                "part_rows": {str(k): int(v) for k, v in top_parts},
                "num_salts": int(num_salts),
            },
        }
        # OCC commit loop (multi-writer; see manifest.py): append/delta
        # epochs COMPOSE with concurrent commits under LWW-by-lsn (their
        # new files don't depend on the base), so a lost CAS just rebases
        # the cumulative counters and retries; a full rewrite computed
        # from a base another writer has since replaced must NOT win —
        # its file silently drops the interloper's changes — so it raises.
        touched_keys = {str(int(r.part)) for r in lineage.itertuples()}
        while True:
            base_version = self.manifest.version
            part_results = _build_part_results()
            if self.manifest.try_commit_epoch(
                    epoch_id, lsn_min, lsn_max, part_results,
                    meta=commit_meta, registry_json=reg_json):
                break
            # lost the race — try_commit_epoch reloaded the manifest
            self._sync_registry()
            if epoch_id in self.manifest.committed_epoch_ids():
                # another process applied this very epoch (exactly-once):
                # our uuid-named output files are orphans for gc()
                shutil.rmtree(staging, ignore_errors=True)
                if reduced_dir is not None:
                    shutil.rmtree(reduced_dir, ignore_errors=True)
                return {"epoch_id": epoch_id, "skipped": True,
                        "concurrent": True}
            overlap = self.manifest.touched_since(base_version) & touched_keys
            conflicted = sorted(
                k for k in overlap
                if modes.get(int(k)) not in ("append", "delta"))
            if conflicted:
                shutil.rmtree(staging, ignore_errors=True)
                if reduced_dir is not None:
                    shutil.rmtree(reduced_dir, ignore_errors=True)
                raise ConcurrentModificationError(
                    f"epoch {epoch_id!r}: partitions {conflicted} were "
                    "rewritten from a base a concurrent writer has since "
                    "replaced; re-run apply_changes (idempotent by epoch "
                    "id) to recompute against the new base")
        # exchange fragments are transient: GC after the commit
        shutil.rmtree(staging, ignore_errors=True)
        if reduced_dir is not None:
            shutil.rmtree(reduced_dir, ignore_errors=True)
        return {
            "epoch_id": epoch_id,
            "lsn_min": lsn_min,
            "lsn_max": lsn_max,
            "partitions_touched": len(part_results),
            "rows_live": int(lineage["rows"].sum()),
            "num_salts": int(num_salts),
            # which partitions actually took the salted layout this epoch
            # (None/absent semantics: all of them, when explicitly salted)
            "salted_parts": sorted(salted_touched) if num_salts > 1 else [],
            # per-stage wall metrics (engine diagnostics; the reference's
            # per-operator metric stream analog, pipeline.hpp:180)
            "timings": {
                "stage1_exchange_s": round(_t1 - _t0, 3),
                "stage2_reduce_s": round(_t2 - _t1, 3),
                "commit_s": round(_time.perf_counter() - _t2, 3),
            },
        }

    # ------------------------------------------------------------------
    def _auto_salt_plan(self) -> "tuple[int, frozenset[int] | None]":
        """Resolve ``num_salts="auto"`` from the most recent committed
        epoch's exchange stats (see apply_changes): returns
        ``(num_salts, salt_parts)``. Salting is per partition — only the
        partitions whose post-combine change volume crossed the
        one-worker-heap threshold last epoch take the salted layout;
        everything else keeps the packed-IPC fast path. ``salt_parts`` of
        ``None`` (legacy lineage without part_rows) salts every partition."""
        thr = int(os.environ.get(SALT_THRESHOLD_ENV, DEFAULT_SALT_THRESHOLD))
        for e in reversed(self.manifest.epochs):
            ex = (e.get("meta") or {}).get("_exchange")
            if ex is None:
                continue
            part_rows = ex.get("part_rows")
            if part_rows:
                hot = frozenset(
                    int(k) for k, v in part_rows.items() if int(v) > thr
                )
                return (AUTO_NUM_SALTS, hot) if hot else (0, None)
            # legacy record (round-2 lineage): only the max is known
            if ex.get("max_part_rows", 0) > thr:
                return AUTO_NUM_SALTS, None
            return 0, None
        return 0, None

    # ------------------------------------------------------------------
    def _has_deltas(self) -> bool:
        # append-only partitions keep the fast path at any file count:
        # their files are pure payload+lsn with (by contract) disjoint
        # keys, so concatenation IS the live state. Only pending delta
        # rows or surviving tombstones force merge-on-read.
        return any(
            (info.get("delta_rows", 0) or 0) > 0
            or (info.get("tombstones", 0) or 0) > 0
            for info in self.manifest.partitions.values()
        )

    def read(self, columns: list[str] | None = None,
             filter=None, as_of: "str | int | None" = None,
             filter_expr: str | None = None,
             parts: "list[int] | None" = None) -> "ray.data.Dataset":
        """Streaming Dataset over the live table (payload columns only).

        Compacted partitions stream straight from parquet (fast path);
        partitions carrying delta files merge-on-read, one task per
        partition (run ``optimize()`` to compact back to the fast path).

        ``filter`` (a ``pyarrow.dataset.Expression``) pushes into the
        parquet scan on the fast path (row-group pruning); on the
        merge-on-read path it applies right after each partition's merge
        (rows must survive LWW BEFORE the predicate — a deleted row must
        not resurrect into the match set).

        ``as_of`` time-travels: read the snapshot as of a committed epoch
        (id or positional index, negatives from the end) by reconstructing
        each partition's file set from lineage — every epoch record stores
        the full replacement file set it published, so the snapshot is
        exact (Delta-Lake ``versionAsOf``). Snapshots stay readable until
        ``optimize()``/``gc()`` collect superseded files and
        ``truncate_lineage()`` drops the record (VACUUM semantics);
        schemas conform to the CURRENT registry (old snapshots gain
        later-added columns as nulls).

        ``filter_expr`` (expression-language string) compiles to the
        same scan filter AND prunes whole FILES first via the manifest's
        zone maps (per-file min/max recorded at write time — the
        reference's catalog synopsis pruning, catalog.hpp:90): a file
        whose range provably excludes every simple comparison conjunct
        is never opened. Fast path only — merge-on-read partitions must
        merge before any predicate."""
        import ray.data

        if as_of is None:
            state = self.manifest.partitions
            has_deltas = self._has_deltas()
        else:
            state = self.manifest.state_as_of(as_of)
            # tombstones=None → pre-round-4 lineage record: tombstone
            # presence unknown, the merge path is always correct
            has_deltas = any(
                len(info.get("files", [])) > 1
                or info.get("tombstones") is None
                or (info.get("tombstones", 0) or 0) > 0
                for info in state.values()
            )
        if parts is not None:
            # partition-subset read (e.g. search()'s bloom pruning).
            # Subsetting whole PARTITIONS is always LWW-sound — every
            # version and tombstone of a key lives in its key's partition
            keep = {int(p) for p in parts}
            state = {k: v for k, v in state.items() if int(k) in keep}
            if as_of is None:  # mirror _has_deltas over the subset
                has_deltas = any(
                    (info.get("delta_rows", 0) or 0) > 0
                    or (info.get("tombstones", 0) or 0) > 0
                    for info in state.values()
                )

        residual = None
        flt_obj = None
        conjuncts: list = []
        if filter_expr is not None:
            from tenzir_ray.expr import compile_filter, prune_conjuncts

            flt_obj = compile_filter(filter_expr)
            if flt_obj.pushdown is not None:
                if filter is not None:
                    filter = filter & flt_obj.pushdown
                else:
                    filter = flt_obj.pushdown
            residual = flt_obj.residual
            conjuncts = prune_conjuncts(filter_expr)

        files = []
        pruned = 0
        for k in sorted(state, key=int):
            info = state[k]
            fstats = info.get("file_stats") or {}
            for rel in info["files"]:
                if (conjuncts and not has_deltas
                        and _zone_skip(fstats.get(rel), conjuncts)):
                    pruned += 1
                    continue
                files.append(os.path.join(self.root, rel))
        self._last_read_pruned = pruned  # observability + tests
        if not files:
            cols = columns or (list(self.registry.schema.names)
                               if self.registry.schema else ["conv_id"])
            return ray.data.from_arrow(pa.table({c: [] for c in cols}))
        if not has_deltas:
            # partitioning=None: part=<k>/ is physical layout, not a hive
            # column — inference would graft a spurious `part` column
            kwargs = {"filter": filter} if filter is not None else {}
            scan_cols, drop_after = columns, []
            if flt_obj is not None and columns:
                # shared residual-projection contract (expr.Filter)
                scan_cols, drop_after = flt_obj.widen_projection(columns)
            if scan_cols is None or "part" in scan_cols:
                # Ray 2.49's parquet reader raises UnboundLocalError when
                # partitioning=None is combined with an explicit column
                # list, so None is only safe projection-free; an explicit
                # list that doesn't name `part` excludes the grafted hive
                # column anyway. A payload column literally named `part`
                # would collide with the hive guess → unpruned fallback.
                kwargs["partitioning"] = None
                if scan_cols is not None:
                    drop_after = list(drop_after)  # select post-scan below
                    kwargs["_post_select"] = scan_cols
                    scan_cols = None
            post_select = kwargs.pop("_post_select", None)
            ds = ray.data.read_parquet(files, columns=scan_cols, **kwargs)
            if post_select is not None:
                ds = ds.select_columns(post_select)
            if residual is not None:
                _res = residual

                def _resid(batch: pa.Table) -> pa.Table:
                    if batch.num_rows:
                        batch = batch.filter(pa.array(_res(batch)))
                    if drop_after:
                        batch = batch.drop_columns(drop_after)
                    return batch

                ds = ds.map_batches(_resid, batch_format="pyarrow")
            if columns is None:
                ds = ds.drop_columns([LSN_COL])
            return ds
        # merge-on-read: a filter may reference columns outside the
        # projection (optimize_steps fuses where+select independently),
        # so the loader merges FULL rows when a filter is present; the
        # projection applies after the predicate
        loader = _PartitionLoader(
            self.root,
            {k: info["files"] for k, info in state.items()},
            self.registry.to_json(),
            None if (filter is not None or residual is not None) else columns,
        )
        parts = sorted(state, key=int)
        ds = ray.data.from_items([{"part": int(k)} for k in parts]).map_batches(
            loader, batch_format="pyarrow", batch_size=1
        )
        if filter is not None or residual is not None:
            import pyarrow.dataset as pads

            expr = filter
            proj = columns
            _res = residual

            def _post(batch: pa.Table) -> pa.Table:
                if batch.num_rows and expr is not None:
                    batch = pads.dataset(batch).to_table(filter=expr)
                if batch.num_rows and _res is not None:
                    batch = batch.filter(pa.array(_res(batch)))
                if proj is not None:
                    batch = batch.select(
                        [c for c in proj if c in batch.column_names])
                return batch

            ds = ds.map_batches(_post, batch_format="pyarrow")
        return ds

    def lookup(self, conv_id, columns: list[str] | None = None) -> pa.Table:
        """Point lookup: the live rows of ONE conversation, LWW-merged.

        The 100 TB read path this layout exists for — cost is
        O(one partition's surviving files), independent of table size:
        the key hash selects the single partition, per-file key BLOOMS
        (built at write time, carried in the manifest) skip files that
        provably don't contain the conversation, and the survivors are
        scanned with a pushed-down ``conv_id ==`` filter so only the
        conversation's own row groups decode. Equality on conv_id
        commutes with the LWW merge (it's the group-key prefix), so
        filter-then-merge is exact even across delta files and
        tombstones. ``self._last_lookup_pruned`` records how many files
        the blooms skipped (observability + tests)."""
        key = str(conv_id)
        part = int(stable_part_of_uniques([key], self.num_partitions)[0])
        payload_cols = (list(self.registry.schema.names)
                        if self.registry.schema else list(KEY_COLS))
        empty = pa.table({c: pa.array([], (self.registry.schema.field(c).type
                                           if self.registry.schema else pa.string()))
                          for c in payload_cols})
        info = self.manifest.partitions.get(str(part))
        pruned = 0
        tables = []
        if info is not None:
            fstats = info.get("file_stats") or {}
            probe = [(KEY_COLS[0], "==", key)]
            for rel in info["files"]:
                if _zone_skip(fstats.get(rel), probe):
                    pruned += 1
                    continue
                t = _load_stored(self.root, rel, self.registry,
                                 filters=[(KEY_COLS[0], "==", key)])
                if t.num_rows:
                    tables.append(t)
        self._last_lookup_pruned = pruned
        if not tables:
            out = empty
        else:
            out = _merge_live(tables).drop_columns(["lsn", "op"])
        if columns is not None:
            out = out.select(columns)
        return out

    def search(self, term: str, column: str = "text",
               columns: list[str] | None = None) -> "ray.data.Dataset":
        """Full-text token search over the live table with bloom-backed
        partition pruning.

        Matches rows whose ``column`` contains ``term`` as a whole
        whitespace token (DuckDB analog:
        ``list_contains(regexp_split_to_array(col, '\\s+'), term)``).

        Pruning: files written by a :class:`LakeTable` constructed with
        ``token_bloom_cols=(column,)`` carry a per-file token bloom in
        the manifest; a PARTITION is skipped when every one of its files
        provably lacks the token. Pruning is partition-granular on
        purpose — a key's every version and tombstone lives in its
        partition, so skipping whole partitions commutes with the LWW
        merge (skipping single files would not: an old matching version
        could resurrect past a pruned newer file). Files without blooms
        are conservatively scanned. ``self._last_search_pruned`` records
        skipped partitions (observability + tests)."""
        token = str(term)
        blkey = f"_bloom:tok:{column}"
        keep: list[int] = []
        pruned = 0
        for k, info in self.manifest.partitions.items():
            files = info.get("files") or []
            if not files:
                continue
            fstats = info.get("file_stats") or {}
            rejected = all(
                (fstats.get(rel) or {}).get(blkey) is not None
                and not _bloom_maybe_contains(fstats[rel][blkey], token)
                for rel in files
            )
            if rejected:
                pruned += 1
            else:
                keep.append(int(k))
        self._last_search_pruned = pruned
        scan_cols = columns
        if scan_cols is not None and column not in scan_cols:
            scan_cols = list(scan_cols) + [column]
        ds = self.read(columns=scan_cols, parts=keep)

        def _contains(t: pa.Table) -> pa.Table:
            if not t.num_rows:
                return t if columns is None else t.select(
                    [c for c in columns if c in t.column_names])
            col = t.column(column)
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            toks = pc.split_pattern_regex(arr, pattern=r"\s+")
            lens = pc.list_value_length(toks).fill_null(0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            flat_eq = pc.equal(toks.flatten(), token)
            eq = flat_eq.to_numpy(zero_copy_only=False)
            eq = np.where(pd.isna(eq), False, eq).astype(bool)
            hit = np.zeros(len(lens), bool)
            if eq.any():
                doc = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
                hit[np.unique(doc[eq])] = True
            out = t.filter(pa.array(hit))
            if columns is not None:
                out = out.select([c for c in columns if c in out.column_names])
            return out

        return ds.map_batches(_contains, batch_format="pyarrow")

    def dedup_incoming(self, ds, column: str = "text",
                       mode: str = "exact", **fuzzy_kwargs):
        """Deduplicate an INCOMING batch against the lake's existing
        corpus before :meth:`apply_changes` — the CDC half of corpus
        hygiene: a re-crawled / re-sent document whose ``column``
        content the lake already holds should not become a new row (or
        churn an existing one).

        - ``mode="exact"``: anti hash-join on the content column via
          the packed exchange (exact string equality; neither side is
          ever gathered — both stream through the same bucketed
          exchange :func:`tenzir_ray.stages.join.hash_join` uses, so
          the lake side can be arbitrarily large).
        - ``mode="fuzzy"``: MinHash-LSH near-dup filter — the lake's
          distinct band keys broadcast once, incoming streams through
          one vectorized ``np.isin`` per batch
          (:func:`tenzir_ray.stages.dedup.fuzzy_decontaminate`;
          size-gated, pass ``max_blocklist_keys``/``bands``/... through
          ``fuzzy_kwargs``). Use when the lake side fits the band-key
          budget (it is the BLOCKLIST here).

        Incoming rows with a null ``column`` are kept (null content
        matches nothing — SQL anti-join semantics). Returns the
        filtered incoming Dataset; compose as
        ``lake.apply_changes(lake.dedup_incoming(changes), ...)``."""
        base = self.read(columns=[column])
        if mode == "exact":
            from tenzir_ray.stages.join import hash_join

            return hash_join(ds, base, on=column, how="anti")
        if mode == "fuzzy":
            from tenzir_ray.stages.dedup import fuzzy_decontaminate

            return fuzzy_decontaminate(ds, base, column=column,
                                       block_column=column,
                                       **fuzzy_kwargs)
        raise ValueError(f"dedup_incoming: unknown mode {mode!r}")

    def merge(self, source, epoch_id: str, *,
              when_matched: str = "update",
              matched_condition: str | None = None,
              when_not_matched: str = "insert",
              validate_unique: bool = True,
              **apply_kwargs) -> dict:
        """Delta-style ``MERGE INTO``: reconcile an arbitrary source
        Dataset against the live table in ONE exactly-once epoch.

        ``source`` carries the table key (conv_id, turn_idx) plus any
        payload columns. Row classification is a key-only semi-join:
        the live key set streams out of a column-pruned scan and meets
        the source over the packed exchange (no driver materialization,
        no full-payload shuffle). Actions:

        - matched rows (key live in the table):
          ``when_matched`` = "update" (replace the row with the source
          row), "delete" (tombstone the key), or "ignore".
          ``matched_condition`` (expression-language string over SOURCE
          columns, e.g. ``"role == 'assistant'"``) restricts the action;
          matched rows failing it are left untouched.
        - unmatched rows: ``when_not_matched`` = "insert" or "ignore".

        All resulting change events share one lsn (``resume_lsn()``), so
        the merge wins LWW against everything already applied; source
        keys must therefore be UNIQUE — like Delta, a multi-row match is
        an error (``validate_unique=True`` enforces it with a key-only
        grouped pass; disable only if the producer guarantees it).
        Downstream (exchange → LWW reduce → manifest commit, idempotent
        replay by ``epoch_id``) is exactly :meth:`apply_changes` —
        re-merging a committed epoch id is a no-op.

        Reference analog: the reference's `import` only appends
        (importer.cpp); conditional reconciliation is part of this
        engine's lake surface (Delta MERGE, Iceberg MERGE INTO).
        """
        import ray.data

        from tenzir_ray.expr import compile_filter

        if when_matched not in ("update", "delete", "ignore"):
            raise ValueError(f"when_matched={when_matched!r}")
        if when_not_matched not in ("insert", "ignore"):
            raise ValueError(f"when_not_matched={when_not_matched!r}")
        self.manifest.reload()
        if epoch_id in self.manifest.committed_epoch_ids():
            return {"epoch_id": epoch_id, "skipped": True}
        if isinstance(source, pa.Table):
            source = ray.data.from_arrow(source)

        if validate_unique:
            from tenzir_ray.stages.exchange import grouped_apply

            def _dups(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                g = t.group_by(list(KEY_COLS)).aggregate([([], "count_all")])
                bad = g.filter(pc.greater(g.column("count_all"), 1))
                return pa.table({
                    "conv_id": bad.column("conv_id").cast(pa.string()),
                    "n": bad.column("count_all").cast(pa.int64()),
                })

            dup = grouped_apply(
                source.select_columns(list(KEY_COLS)), list(KEY_COLS),
                _dups, fn_format="pyarrow", tag="merge-dupcheck",
            ).limit(1).take_all()
            if dup:
                raise ValueError(
                    f"merge: source has duplicate keys (e.g. conv_id="
                    f"{dup[0]['conv_id']!r} x{dup[0]['n']}); a multi-row "
                    "match is ambiguous — dedupe the source first")

        live_any = any(info.get("files")
                       for info in self.manifest.partitions.values())
        if live_any:
            from tenzir_ray.stages.join import hash_join

            def _mark(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "__hit", pa.array(np.ones(t.num_rows, np.int8)))

            marked = self.read(columns=list(KEY_COLS)).map_batches(
                _mark, batch_format="pyarrow")
            joined = hash_join(source, marked, on=list(KEY_COLS), how="left")
        else:  # empty table: everything is unmatched
            def _miss(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "__hit", pa.array(np.zeros(t.num_rows, np.int8)))

            joined = source.map_batches(_miss, batch_format="pyarrow")

        base_lsn = self.resume_lsn()
        cond = matched_condition

        def _classify(t: pa.Table) -> pa.Table:
            hit = t.column("__hit").to_numpy(zero_copy_only=False)
            matched = ~pd.isna(hit) & (np.nan_to_num(
                hit.astype(np.float64), nan=0.0) > 0)
            if cond is not None:
                cmask = compile_filter(cond).mask(t)
                act_matched = matched & cmask
            else:
                act_matched = matched
            op = np.full(t.num_rows, "", dtype=object)
            if when_matched != "ignore":
                op[act_matched] = when_matched
            if when_not_matched == "insert":
                op[~matched] = "insert"
            keep = op != ""
            out = t.drop_columns(["__hit"]).filter(pa.array(keep))
            n = out.num_rows
            out = out.append_column("op", pa.array(op[keep], pa.string()))
            return out.append_column(
                "lsn", pa.array(np.full(n, base_lsn, np.int64)))

        events = joined.map_batches(_classify, batch_format="pyarrow")
        rec = self.apply_changes(events, epoch_id, **apply_kwargs)
        return rec

    def final_table(self, as_of: "str | int | None" = None) -> pa.Table:
        """Driver-side full read, sorted by (conv_id, turn_idx) — for
        verification at test scale only (materializes). ``as_of`` reads a
        lineage snapshot (see :meth:`read`)."""
        state = (self.manifest.partitions if as_of is None
                 else self.manifest.state_as_of(as_of))
        tables = []
        for k in sorted(state, key=int):
            info = state[k]
            merged = _merge_live(
                [_load_stored(self.root, rel, self.registry) for rel in info["files"]]
            )
            tables.append(merged.drop_columns(["lsn", "op"]))
        if not tables:
            # empty lake: preserve the registered schema (a 0-row epoch
            # still registers it) so callers can project/sort columns
            if self.registry.schema is not None:
                return self.registry.schema.empty_table()
            return pa.table({})
        tbl = pa.concat_tables(tables, promote_options="permissive")
        return tbl.take(
            pc.sort_indices(
                tbl, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
            )
        )

    def metrics(self) -> "ray.data.Dataset":
        """Epoch lineage as a Dataset (the reference's `metrics`/
        `diagnostics` stream analog, builtins/operators/metrics.cpp):
        one row per committed epoch with lsn range, partition count, and
        commit time."""
        import ray.data

        rows = [
            {
                "epoch_id": e["epoch_id"],
                "lsn_min": e["lsn_min"],
                "lsn_max": e["lsn_max"],
                "committed_at": e["committed_at"],
                "partitions_touched": len(e.get("partitions", {})),
                "rows": sum(p.get("rows", 0) for p in e.get("partitions", {}).values()),
            }
            for e in self.manifest.epochs
        ]
        return ray.data.from_items(rows) if rows else ray.data.from_items(
            [{"epoch_id": "", "lsn_min": -1, "lsn_max": -1,
              "committed_at": 0.0, "partitions_touched": 0, "rows": 0}]
        ).limit(0)

    def resume_lsn(self) -> int:
        """Next lsn to tail from (checkpoint/resume-from-offset)."""
        return self.manifest.lsn_high() + 1

    def changes(self, since_lsn: int = 0,
                epochs: "list[str] | None" = None,
                with_epoch_id: bool = False) -> "ray.data.Dataset":
        """Stream the applied change feed (Delta-Lake CDF analog): the NET
        changes each epoch applied — intra-epoch LWW winners per key,
        including delete tombstones — as payload + ``_lsn`` + ``_op`` rows.

        Sources, per epoch in lineage order: the ``_cdf/`` file written
        when the epoch was applied with ``change_feed=True``, else (delta
        epochs only) the delta file itself, which has identical content but
        dies at compaction. Full-rewrite epochs applied WITHOUT
        ``change_feed`` cannot reconstruct per-row attribution → error.

        ``since_lsn`` filters to changes with ``_lsn >= since_lsn`` (epochs
        entirely below are skipped at the driver — file-level pruning);
        ``epochs`` limits to the given epoch ids. ``with_epoch_id=True``
        tags rows with their epoch id (one read per epoch unioned — use
        only over bounded epoch selections).

        Preimage-mode epochs (``change_feed="preimages"``) resume at
        EPOCH granularity: their update_preimage/delete rows carry the
        REPLACED row's lsn by design, so a row-level ``_lsn`` cut would
        silently drop the only record of a delete — instead every row of
        a qualifying epoch (``lsn_max >= since_lsn``) is kept, giving
        at-least-once on the boundary epoch. Use ``epochs=`` for exact
        resume points with a preimage feed."""
        import ray.data

        wanted = None if epochs is None else set(epochs)
        per_epoch: list[tuple[str, list[str]]] = []
        for e in self.manifest.epochs:
            if wanted is not None and e["epoch_id"] not in wanted:
                continue
            if (e.get("meta") or {}).get("_compaction"):
                continue  # compaction republishes files, applies no changes
            if e.get("lsn_max", -1) < since_lsn:
                continue
            files = []
            for k, rec in e.get("partitions", {}).items():
                cdf = rec.get("cdf_file")
                if cdf is None and rec.get("mode") == "delta":
                    cdf = rec.get("new_file")
                if cdf is None:
                    raise ValueError(
                        f"epoch {e['epoch_id']!r} was applied without "
                        "change_feed=True and rewrote partitions in place; "
                        "its per-row changes are not reconstructible")
                files.append(os.path.join(self.root, cdf))
            if files:
                per_epoch.append((e["epoch_id"], files))
        if not per_epoch:
            cols = list(self.registry.schema.names) if self.registry.schema else []
            empty = {c: [] for c in cols + [LSN_COL, OP_COL]}
            if with_epoch_id:
                empty["_epoch_id"] = []
            return ray.data.from_arrow(pa.table(empty))

        def _since(t: pa.Table) -> pa.Table:
            if since_lsn <= 0 or CHANGE_TYPE_COL in t.column_names:
                # preimage feeds: epoch-granular resume only (see above)
                return t
            return t.filter(
                pc.greater_equal(t.column(LSN_COL).cast(pa.int64()), since_lsn)
            )

        # partitioning=None: the part=<k>/ layout is physical, not a hive
        # column — inference would graft a spurious `part` column
        if not with_epoch_id:
            ds = ray.data.read_parquet(
                [f for _, fl in per_epoch for f in fl], partitioning=None)
            return ds.map_batches(_since, batch_format="pyarrow")
        parts = []
        for eid, fl in per_epoch:
            d = ray.data.read_parquet(fl, partitioning=None).map_batches(
                _since, batch_format="pyarrow")
            parts.append(d.add_column(
                "_epoch_id", lambda df, _e=eid: pd.Series([_e] * len(df)),
            ))
        ds = parts[0]
        return ds.union(*parts[1:]) if len(parts) > 1 else ds

    def tail_directory(self, log_dir: str, pattern: str = "*.parquet",
                       num_salts: int = 0) -> list[dict]:
        """Tail a directory of binlog segment files (the Kafka/WAL consumer
        analog, reference plugins/kafka): each file, in sorted name order,
        is one epoch keyed by its filename — already-committed segments are
        skipped (resume-from-offset), so re-running after new segments
        arrive applies exactly the new ones."""
        import glob as globmod

        import ray.data

        results = []
        for path in sorted(globmod.glob(os.path.join(log_dir, pattern))):
            epoch_id = os.path.basename(path)
            results.append(
                self.apply_changes(
                    ray.data.read_parquet(path), epoch_id=epoch_id,
                    num_salts=num_salts,
                )
            )
        return results

    def reshard(self, dest_root: str, num_partitions: int,
                **apply_kwargs) -> "LakeTable":
        """Rebuild the table under a different partition count — the
        maintenance op a growing table eventually needs (16 partitions
        at 1 TB becomes 256 at 100 TB). Streams each SOURCE partition's
        LWW-merged live rows through the normal apply pipeline into a
        fresh table at ``dest_root``, as ONE exactly-once epoch per
        source partition — so a killed reshard RESUMES where it stopped
        (committed ``reshard-<k>`` epochs skip; the unfinished one
        re-runs deterministically).

        Every row lands with ``lsn = source partition's lsn_high``: a
        stale replay of an already-applied change (lsn ≤ high) loses LWW
        against the resharded row, while genuinely new events win, and
        ``resume_lsn()`` carries over — a broker resuming from its
        checkpoint continues cleanly against the new table. Tombstones
        are compacted away (exactly like :meth:`optimize`): a deleted
        key is simply absent, so replay protection for DELETED keys is
        the epoch/checkpoint layer's job (epoch-id idempotence +
        ``since_lsn``), not per-row LWW — the same contract the rest of
        the engine already has post-compaction. Token-bloom columns
        propagate."""
        if int(num_partitions) < 1:
            raise ValueError("num_partitions must be >= 1")
        dest = LakeTable(dest_root, num_partitions=int(num_partitions),
                         token_bloom_cols=self._token_bloom_cols)

        def _as_inserts(lsn_high: int):
            def f(t: pa.Table) -> pa.Table:
                t = t.append_column("lsn", pa.array(
                    np.full(t.num_rows, lsn_high, np.int64)))
                return t.append_column(
                    "op", pa.array(["insert"] * t.num_rows))
            return f

        for k in sorted(self.manifest.partitions, key=int):
            info = self.manifest.partitions[k]
            if not info.get("files"):
                continue
            epoch = f"reshard-{int(k):05d}"
            if epoch in dest.manifest.committed_epoch_ids():
                continue  # resume: this source partition already moved
            src = self.read(parts=[int(k)])
            lsn_high = int(info.get("lsn_high", 0) or 0)
            dest.apply_changes(
                src.map_batches(_as_inserts(lsn_high),
                                batch_format="pyarrow"),
                epoch_id=epoch, **apply_kwargs)
        return dest

    def clone(self, dest_root: str) -> "LakeTable":
        """Shallow clone (Delta-Lake ``CLONE`` analog): hardlink every
        file under the root — live partitions, historical epoch file
        sets (time travel works in the clone), delta/``_cdf`` feed
        files — plus the manifest and schema registry. Zero data bytes
        copied on the same filesystem (cross-FS falls back to copy).

        Correct because data files are IMMUTABLE (uuid-named; an apply
        replaces a partition's file SET, never rewrites a file in
        place): writes to either table create new files under its own
        root, and ``gc()``/``optimize()`` only unlink their own root's
        names — the shared inode survives until the last name dies.
        In-flight ``_staging`` is skipped (transient exchange state)."""
        import shutil

        src_real = os.path.realpath(self.root)
        dst_real = os.path.realpath(dest_root)
        if (dst_real == src_real
                or dst_real.startswith(src_real + os.sep)
                or src_real.startswith(dst_real + os.sep)):
            # a nested dest would be walked mid-clone AND its files,
            # unreferenced by the source manifest, would be gc()'d as
            # orphans — silently destroying the clone
            raise ValueError(
                f"clone target {dest_root!r} must not nest with the "
                f"source root {self.root!r}")
        if os.path.exists(os.path.join(dest_root, MANIFEST_NAME)):
            raise FileExistsError(f"clone target already a lake: {dest_root}")
        os.makedirs(dest_root, exist_ok=True)
        for dirpath, dirnames, filenames in os.walk(self.root):
            rel = os.path.relpath(dirpath, self.root)
            if rel.split(os.sep)[0] == "_staging":
                dirnames[:] = []
                continue
            for fn in filenames:
                src = os.path.join(dirpath, fn)
                dst = (os.path.join(dest_root, fn) if rel == "."
                       else os.path.join(dest_root, rel, fn))
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                try:
                    os.link(src, dst)
                except OSError:  # cross-filesystem / FS without links
                    shutil.copy2(src, dst)
        return LakeTable(dest_root)

    def restore(self, as_of: "str | int",
                epoch_id: "str | None" = None) -> dict:
        """Roll the table back to a lineage snapshot (Delta-Lake
        ``RESTORE TABLE ... TO VERSION AS OF`` analog): publish ONE new
        epoch whose state replaces every current partition's file set
        with the snapshot's as of ``as_of`` (epoch id, or positional
        index — negatives from the end). Metadata-only and O(partitions):
        no data bytes move — data files are immutable and uuid-named, so
        pointing the manifest back at the old set IS the rollback.

        History stays monotonic: the restore is itself a lineage-tracked,
        exactly-once epoch (replaying the same ``epoch_id`` skips), so a
        later ``restore`` can roll FORWARD again and time travel across
        the rollback keeps working. The schema registry is additive-only
        and stays at its current (widest) version — restored rows read
        with nulls in later-added columns, the same contract as any old
        file under evolution.

        Fails loudly (nothing published) if the snapshot references
        files already collected by ``gc()``/``optimize()`` — VACUUM
        bounds how far back a restore can reach, exactly as in Delta.

        The restore does NOT rewind the source-offset checkpoint:
        ``resume_lsn()`` still reflects the binlog high watermark (max
        over all lineage). For a rewind-and-replay flow, re-apply from
        the returned record's ``restored_lsn_high`` + 1; replayed epoch
        ids that were committed BEFORE the restore point are new epochs
        again only if given fresh ids (the idempotence registry is
        append-only by design — it records "this chunk was applied",
        which remains true)."""
        self.manifest.reload()
        self._sync_registry()
        eid = epoch_id or f"restore-{as_of}"
        if eid in self.manifest.committed_epoch_ids():
            return {"epoch_id": eid, "skipped": True}
        snap = self.manifest.state_as_of(as_of)
        missing = [
            f for info in snap.values() for f in info["files"]
            if not os.path.exists(os.path.join(self.root, f))
        ]
        if missing:
            raise FileNotFoundError(
                f"restore({as_of!r}): {len(missing)} snapshot file(s) were "
                f"collected by gc()/optimize() (first: {missing[0]!r}); "
                "this snapshot is no longer restorable")
        restored_lsn = max(
            (e["lsn_max"] for e in
             self.manifest.epochs[: self.manifest.resolve_epoch(as_of) + 1]),
            default=-1)
        part_results: dict = {}
        for k in set(self.manifest.partitions) | set(snap):
            info = snap.get(k)
            rec = (dict(info) if info
                   else {"files": [], "rows": 0, "tombstones": 0})
            rec["lsn_high"] = restored_lsn
            part_results[k] = rec
        self.manifest.commit_epoch(
            eid, -1, -1, part_results,
            meta={"restore_of": as_of, "restored_lsn_high": restored_lsn})
        return {"epoch_id": eid, "skipped": False,
                "restored_lsn_high": restored_lsn,
                "partitions_touched": len(part_results)}

    def expire(self, filter_expr: str,
               epoch_id: "str | None" = None,
               batch_size: int = 262144) -> dict:
        """Retention delete (row-TTL): scan live rows matching
        ``filter_expr`` (the engine expression language, e.g.
        ``"ts < 2024-01-01T00:00:00"``), turn each matched key into a
        DELETE change, and apply them as one normal exactly-once epoch.

        Distribution: the scan is the streaming :meth:`read` with the
        predicate pushed into the parquet scan (zone maps + row groups
        prune untouched files); only the matched KEYS (conv_id,
        turn_idx) flow into the epoch. All deletes carry the same fresh
        LSN (``resume_lsn()``) — they happen-at the expiry point, after
        every applied change; keys are unique post-LWW so no intra-epoch
        tie exists. Lineage-tracked like any epoch: time travel to
        before the expiry still sees the rows until ``gc()`` collects
        them — retention and VACUUM compose exactly as in Delta."""
        self.manifest.reload()
        eid = epoch_id or (
            "ttl-" + hashlib.sha1(filter_expr.encode()).hexdigest()[:12])
        if eid in self.manifest.committed_epoch_ids():
            return {"epoch_id": eid, "skipped": True}
        ttl_lsn = self.resume_lsn()
        matched = self.read(columns=["conv_id", "turn_idx"],
                            filter_expr=filter_expr)
        # no-match probe (early-stopped, pruned scan): an all-pass filter
        # must still commit an idempotence epoch, but an empty Dataset has
        # no schema for apply_changes to conform
        if not matched.limit(1).take(1):
            self.manifest.commit_epoch(
                eid, ttl_lsn, ttl_lsn, {},
                meta={"ttl_filter": filter_expr, "ttl_matches": 0})
            return {"epoch_id": eid, "skipped": False, "ttl_lsn": ttl_lsn,
                    "rows": 0}

        def _to_deletes(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                "lsn": pa.array(np.full(n, ttl_lsn, dtype=np.int64)),
                "op": pa.array(["delete"] * n, pa.string()),
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
            })

        deletes = matched.map_batches(_to_deletes, batch_format="pyarrow")
        rec = self.apply_changes(deletes, eid, batch_size=batch_size,
                                 epoch_meta={"ttl_filter": filter_expr})
        rec["ttl_lsn"] = ttl_lsn
        rec.setdefault("skipped", False)
        return rec

    # -- maintenance (reference: rebuild.cpp compaction + disk_monitor) --
    def gc(self, min_age_s: float = 0.0) -> dict:
        """Remove orphan data files (crashed attempts, superseded epochs)
        and leftover staging dirs. Live data is exactly the manifest's
        file set (catalog-gated reads, catalog.hpp:83).

        Multi-writer caveat: a CONCURRENT writer's freshly-written but
        not-yet-committed partition files look like orphans — pass
        ``min_age_s`` (e.g. 3600) to only collect files older than the
        longest plausible in-flight epoch, or run gc without concurrent
        writers."""
        import glob as globmod
        import shutil

        self.manifest.reload()
        now = time.time()
        live = set(self.manifest.live_files())
        # historical epochs' file sets stay collectible (time-travel
        # snapshots die at gc — VACUUM semantics, documented in read())
        removed_files = 0
        for f in globmod.glob(os.path.join(self.root, "part=*", "*.parquet")):
            if f not in live:
                if min_age_s > 0:
                    try:
                        if now - os.path.getmtime(f) < min_age_s:
                            continue
                    except FileNotFoundError:
                        continue
                os.remove(f)
                removed_files += 1
        removed_staging = 0
        for d in globmod.glob(os.path.join(self.root, "_staging", "*")):
            if min_age_s > 0:
                try:
                    if now - os.path.getmtime(d) < min_age_s:
                        continue
                except FileNotFoundError:
                    continue
            shutil.rmtree(d, ignore_errors=True)
            removed_staging += 1
        return {"files_removed": removed_files, "staging_removed": removed_staging}

    def optimize(self, compression_level: int = 10,
                 parts: list | None = None,
                 cluster_by: list[str] | None = None,
                 target_files: int = 8) -> int:
        """Compact partitions: merge base + delta files (LWW, drop
        tombstones) at a higher zstd level — the reference's partition
        rebuild (builtins/commands/rebuild.cpp:26). One Ray task per
        partition (never a driver loop); write-then-rename per file, then
        one atomic manifest swap; superseded files become orphans for
        gc(). ``parts`` limits compaction to the given partition ids
        (selective rebuild).

        ``cluster_by=[c1, c2, ...]`` Z-ORDER-clusters each partition
        (Delta-Lake ``OPTIMIZE ZORDER BY`` analog): rows sort by the
        interleaved-bit Morton code of the columns' rank-quantized values
        and split into ``target_files`` chunk files, each with its own
        zone map + key bloom — so ``read(filter_expr=)`` range predicates
        on ANY clustered column prune whole chunks, not just the leading
        sort column (a linear sort gives tight zones on one dimension;
        Morton interleave bounds every dimension's spread per chunk).
        Without ``cluster_by`` each partition compacts to ONE key-sorted
        file (unchanged fast path).

        Multi-writer: a compaction is a full rewrite of its partitions, so
        a concurrent apply to the same partitions raises
        :class:`ConcurrentModificationError` (re-run optimize); appends to
        OTHER partitions interleave freely."""
        import ray as ray_core

        self.manifest.reload()
        self._sync_registry()
        todo = {
            k: info
            for k, info in self.manifest.partitions.items()
            if parts is None or int(k) in {int(p) for p in parts}
        }
        if not todo:
            return 0
        root = self.root
        reg_json = self.registry.to_json()
        n_chunks = max(1, int(target_files)) if cluster_by else 1
        token_cols = self._token_bloom_cols

        @ray_core.remote
        def _compact(k: str, rels: list[str]) -> dict:
            reg = SchemaRegistry.from_json(reg_json)
            merged = _merge_live([_load_stored(root, rel, reg) for rel in rels])
            payload_cols = [c for c in merged.column_names if c not in ("lsn", "op")]
            out = merged.select(payload_cols).append_column(
                LSN_COL, merged.column("lsn")
            )
            if cluster_by:
                out = out.take(pa.array(_zorder_argsort(out, cluster_by)))
            files, stats = [], []
            bounds = np.linspace(0, out.num_rows, n_chunks + 1).astype(np.int64)
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                if hi <= lo:
                    continue
                chunk = out.slice(int(lo), int(hi - lo))
                new_rel = f"part={k}/compact-{uuid.uuid4().hex[:8]}.parquet"
                dst = os.path.join(root, new_rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                pq.write_table(chunk, dst + ".tmp", compression="zstd",
                               compression_level=compression_level)
                os.replace(dst + ".tmp", dst)
                files.append(new_rel)
                stats.append(_zone_stats(chunk, token_cols))
            return {"part": k, "files": files, "rows": out.num_rows,
                    "stats": _json.dumps(stats)}

        results = ray_core.get(
            [_compact.remote(k, info["files"]) for k, info in todo.items()]
        )
        # publish via a lineage record (not a bare partitions-map swap) so
        # time-travel's epoch-prefix reconstruction stays consistent with
        # the live state after compaction; changes() skips it (_compaction)
        part_results = {}
        for r in results:
            info = self.manifest.partitions[r["part"]]
            fstats = dict(zip(r["files"], _json.loads(r["stats"])))
            part_results[r["part"]] = {
                **info,
                "files": list(r["files"]),
                "rows": r["rows"],
                "delta_rows": 0,
                "tombstones": 0,
                "mode": "compact",
                "new_file": r["files"][0] if r["files"] else None,
                "file_stats": fstats,
            }
        self.manifest.commit_epoch(
            f"_optimize-{uuid.uuid4().hex[:8]}", -1, -1, part_results,
            meta={"_compaction": True},
        )
        self.gc()  # old files are now orphans
        return len(results)

    def compact_hot(self, max_files: int = 8,
                    compression_level: int = 10) -> int:
        """Selective compaction: rebuild only partitions whose live file
        count exceeds ``max_files`` (the automatic-rebuild policy,
        rebuild.cpp:26 'undersized/outdated partitions')."""
        hot = [
            int(k)
            for k, info in self.manifest.partitions.items()
            if len(info.get("files", [])) > max_files
        ]
        return self.optimize(compression_level=compression_level, parts=hot)

    def truncate_lineage(self, keep_epochs: int = 100) -> int:
        """Retention for the lineage log (disk-monitor analog,
        libtenzir/src/disk_monitor.cpp:68 — bounded history): keep the
        most recent ``keep_epochs`` records; live state is unaffected.
        Change-feed files owned by dropped epochs are deleted (the feed's
        retention IS the lineage retention); time-travel snapshots older
        than the horizon become unreachable.

        Admin operation: run WITHOUT concurrent writers (like VACUUM) — it
        rewrites the lineage prefix in the snapshot and compacts the
        commit log. A very stale concurrent writer re-claiming a compacted
        log version is detected and undone by the manifest's
        folded-history guard (manifest.py try_commit_epoch), but its
        snapshot write could still resurrect dropped lineage records."""
        self.manifest.reload()
        dropped = max(0, len(self.manifest.epochs) - keep_epochs)
        if dropped:
            prefix = self.manifest.epochs[:dropped]
            for e in prefix:
                for rec in e.get("partitions", {}).values():
                    cdf = rec.get("cdf_file")
                    if cdf and cdf.startswith("_cdf/"):
                        try:
                            os.remove(os.path.join(self.root, cdf))
                        except FileNotFoundError:
                            pass
            # fold the dropped prefix's final per-partition state into one
            # synthetic base record so time travel to any RETAINED epoch
            # stays complete — without it, a partition last touched before
            # the horizon silently vanishes from state_as_of()
            base_files: dict[str, list] = {}
            base_recs: dict[str, dict] = {}
            for e in prefix:
                recs = e.get("partitions", {})
                for k, files in e.get("files", {}).items():
                    base_files[k] = files
                    r = dict(recs.get(k, {}))
                    r.pop("cdf_file", None)  # feed file just deleted above
                    base_recs[k] = r
            base = {
                "epoch_id": f"_base-{prefix[-1]['epoch_id']}",
                "seq": max(e.get("seq", i) for i, e in enumerate(prefix)),
                "lsn_min": -1,
                "lsn_max": -1,
                "meta": {"_compaction": True, "_lineage_base": True},
                "committed_at": time.time(),
                "partitions": base_recs,
                "files": base_files,
            }
            self.manifest.epochs = [base] + self.manifest.epochs[dropped:]
            self.manifest._atomic_write()
            # the snapshot just written folds every log record ≤ version:
            # compact the commit log so it stays bounded by the lineage
            # retention (a stale writer re-claiming a compacted number is
            # caught by the manifest's folded-history guard)
            logd = self.manifest.log_dir
            if os.path.isdir(logd):
                for fn in os.listdir(logd):
                    if fn.startswith("v") and fn.endswith(".json"):
                        try:
                            v = int(fn[1:-5])
                        except ValueError:
                            continue
                        if v <= self.manifest.version:
                            try:
                                os.remove(os.path.join(logd, fn))
                            except FileNotFoundError:
                                pass
        return dropped

    def _persist_registry(self) -> None:
        """Write the registry cache file, folding in whatever is already
        on disk first (evolve is a lattice join) so concurrent writers
        adding different columns don't clobber each other's entries. The
        AUTHORITATIVE registry rides the commit log (manifest.py); this
        file is a convenience cache for fresh instances and legacy roots."""
        p = os.path.join(self.root, REGISTRY_NAME)
        try:
            with open(p) as f:
                on_disk = SchemaRegistry.from_json(f.read())
            if on_disk.schema is not None:
                self.registry.evolve(on_disk.schema)
        except FileNotFoundError:
            pass
        tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(self.registry.to_json())
        os.replace(tmp, p)


import sys as _sys
from tenzir_ray._ship import ship_by_value as _ship
_ship(_sys.modules[__name__])
